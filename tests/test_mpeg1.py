"""MPEG-1 subset codec: bitstream structure, motion-compensation
semantics, DC prediction chains, skipped-macroblock defaults, VLC
tables, and malformed-input rejection."""

import numpy as np
import pytest

from vector_database_in_rust_spark.operators.mpeg1 import (
    _B1_ADDR_INC,
    _B4_MOTION,
    _B5A_DC_LUMA,
    _dc_extend,
    _dc_size_bits,
    decode_mpeg1,
    synth_mpeg1_bytes,
)


def _expected(seed: int, f: int) -> np.ndarray:
    a = lambda t: (37 * t + 11 * seed + 29) % 256  # noqa: E731
    m = lambda t: (91 * t + 13 * seed + 57) % 256  # noqa: E731
    b = lambda k: (53 * k + 7 * seed + 101) % 256  # noqa: E731
    img = np.zeros((16, 64), dtype=np.int64)
    for c in range(16):
        if c <= 3:
            v = a(f)
        elif c <= 7:
            s = c - 3
            v = a(f - s) if f >= s else b(1)
        elif c <= 11:
            v = b(2)
        else:
            v = b(3) if f == 0 else m(f)
        img[:, c * 4 : (c + 1) * 4] = v
    return img


class TestMpeg1Codec:
    def test_roundtrip_exact_all_frames(self):
        """Decoded pixels must equal the closed-form column recurrence
        for every frame — this exercises intra DC decode, forward MC
        with a negative vector, the skip default, and DC predictor
        resets in one stream."""
        for seed in (0, 5, 88, 4095):
            frames = decode_mpeg1(synth_mpeg1_bytes(seed))
            assert len(frames) == 5
            for f, fr in enumerate(frames):
                assert (fr.astype(np.int64) == _expected(seed, f)).all(), (
                    seed,
                    f,
                )

    def test_motion_chain_visibly_drags(self):
        """The defining inter-frame property: MB1's content at frame f
        must equal MB0's intra content from EARLIER frames (dragged 4
        px per frame by the motion vector) — a decoder that ignores MC
        or mis-signs the vector cannot produce this."""
        seed = 3
        frames = decode_mpeg1(synth_mpeg1_bytes(seed))
        a = lambda t: (37 * t + 11 * seed + 29) % 256  # noqa: E731
        # frame 4, columns 4..7 hold a_3, a_2, a_1, a_0
        for s in (1, 2, 3, 4):
            col = 3 + s
            assert frames[4][0, col * 4] == a(4 - s)

    def test_skipped_macroblock_is_static(self):
        """MB2 is skipped in every P-picture: its pixels must stay at
        the I-frame value through the whole sequence."""
        seed = 11
        frames = decode_mpeg1(synth_mpeg1_bytes(seed))
        b2 = (53 * 2 + 7 * seed + 101) % 256
        for fr in frames:
            assert (fr[:, 32:48] == b2).all()

    def test_is_a_real_mpeg1_stream(self):
        """Start-code structure: sequence header 0xB3, GOP 0xB8,
        pictures 0x00, slices 0x01, sequence end 0xB7 — all present,
        byte-aligned."""
        b = synth_mpeg1_bytes(1)
        assert b.startswith(b"\x00\x00\x01\xb3")
        assert b"\x00\x00\x01\xb8" in b
        assert b.count(b"\x00\x00\x01\x00") == 5  # five picture headers
        assert b.count(b"\x00\x00\x01\x01") == 5  # one slice each
        assert b"\x00\x00\x01\xb7" in b  # sequence end
        # sequence header carries the real dimensions (12+12 bits)
        dims = int.from_bytes(b[4:7], "big")
        assert dims >> 12 == 64 and dims & 0xFFF == 16

    def test_rejects_malformed(self):
        with pytest.raises(ValueError):
            decode_mpeg1(b"not mpeg")
        good = synth_mpeg1_bytes(2)
        # B-pictures (type 3) are the documented unsupported feature
        bad = bytearray(good)
        i = good.index(b"\x00\x00\x01\x00")
        # picture type = 3 bits after the 10-bit temporal reference
        bad[i + 5] = (bad[i + 5] & 0b11000111) | (3 << 3)
        with pytest.raises(ValueError, match="unsupported"):
            decode_mpeg1(bytes(bad))
        with pytest.raises(ValueError):
            decode_mpeg1(good[:40])  # truncated mid-stream

    def test_p_before_i_rejected(self):
        """A stream whose first picture is P must raise (no reference
        frame) rather than hallucinate one."""
        good = synth_mpeg1_bytes(4)
        first = good.index(b"\x00\x00\x01\x00")
        second = good.index(b"\x00\x00\x01\x00", first + 4)
        # drop the I-picture: splice header..first-picture to second
        with pytest.raises(ValueError, match="P-picture before"):
            decode_mpeg1(good[:first] + good[second:])

    def test_dc_size_coding_roundtrip(self):
        """DC differential amplitude coding must invert exactly across
        the full +-255 range (the 11172-2 offset rule for negatives)."""
        for diff in range(-255, 256):
            size, bits = _dc_size_bits(diff)
            assert _dc_extend(size, bits) == diff, diff

    def test_vlc_tables_are_prefix_free(self):
        for table in (_B1_ADDR_INC, _B4_MOTION, _B5A_DC_LUMA):
            codes = sorted(table, key=len)
            for i, c in enumerate(codes):
                for d in codes[i + 1 :]:
                    assert not d.startswith(c), (c, d)

    def test_motion_table_sign_convention(self):
        """B.4: positive codes end in 0, negative in 1, magnitudes
        mirror; zero is '1'."""
        assert _B4_MOTION["1"] == 0
        for code, val in _B4_MOTION.items():
            if val > 0:
                assert code.endswith("0")
                assert _B4_MOTION[code[:-1] + "1"] == -val


class TestMpeg1Property:
    def test_random_layouts_match_semantic_simulation(self):
        """Hypothesis: ARBITRARY legal macroblock layouts must decode to
        exactly what the motion/skip/intra semantics dictate, computed
        by simulate_reconstruction WITHOUT touching the bitstream — a
        self-consistent codec with wrong semantics fails here."""
        import numpy as np
        from hypothesis import given, settings, strategies as st

        from vector_database_in_rust_spark.operators.mpeg1 import (
            decode_mpeg1,
            encode_mpeg1_gray,
            simulate_reconstruction,
        )

        mb_w = 5  # 80x16, vectors limited to transcribed B.4 rows

        def op_strategy(mb, first_frame):
            opts = [
                st.tuples(st.just("intra"), st.integers(0, 255)),
            ]
            if not first_frame:
                # full_pel vectors double the coded motion_code
                # (§2.4.4.2), so only even displacements exist; the
                # transcribed B.4 rows bound |code| <= 8 -> |mv| <= 16
                lo = max(-8, (-16 * mb) // 2)
                hi = min(8, (16 * (mb_w - mb - 1)) // 2)
                opts.append(
                    st.tuples(
                        st.just("mc"),
                        st.integers(lo, hi).map(lambda v: 2 * v),
                        st.just(0),
                    )
                )
                if 0 < mb < mb_w - 1:
                    opts.append(st.just(("skip",)))
            return st.one_of(opts)

        def frame_strategy(first_frame):
            return st.tuples(
                *[op_strategy(mb, first_frame) for mb in range(mb_w)]
            ).map(list)

        @settings(max_examples=40, deadline=None)
        @given(
            st.tuples(
                frame_strategy(True),
                frame_strategy(False),
                frame_strategy(False),
                frame_strategy(False),
            ).map(list)
        )
        def check(specs):
            got = decode_mpeg1(encode_mpeg1_gray(specs, 16 * mb_w, 16))
            want = simulate_reconstruction(specs, 16 * mb_w, 16)
            assert len(got) == len(want)
            for g, wf in zip(got, want):
                assert (g == wf).all()

        check()
