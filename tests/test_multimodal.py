from __future__ import annotations

from vector_database_in_rust_spark.operators import multimodal as mm
from tests.conftest import SF_SMOKE


def test_extract_features_shapes(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    media = mm.attach_binary_payload(docs)
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r["features"]) == mm.FEATURE_DIM for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows[:10] for v in r["features"])


def test_extract_features_deterministic(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    media = mm.attach_binary_payload(docs)
    a = {r["media_id"]: r["features"] for r in mm.extract_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in mm.extract_features(media).collect()}
    assert a == b


def test_n_bytes_matches_meta(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    media = mm.attach_binary_payload(docs).cache()
    feats = mm.extract_features(media)
    joined = feats.join(media, "media_id")
    bad = joined.filter(joined.n_bytes != joined.meta.n_bytes).count()
    assert bad == 0


def test_resize_output_contract(spark):
    import hashlib

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20)
    media = mm.attach_binary_payload(docs)
    out = {r["media_id"]: r for r in mm.resize_media(media, width=4, height=6).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(out) == set(texts)
    for mid, r in out.items():
        assert (r["out_w"], r["out_h"]) == (4, 6)
        assert len(r["content"]) == 24
        digest = hashlib.sha256(texts[mid].encode()).digest()
        assert bytes(r["content"]) == (digest * 1)[:24]


def test_frame_sample_exact_frames(spark):
    """Every emitted frame must be the exact byte slice of the payload
    at its index; indices step by every_n over FULL frames only."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20)
    media = mm.attach_binary_payload(docs)
    frames = mm.frame_sample(media, every_n=3).collect()
    texts = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    seen = {}
    for r in frames:
        payload = texts[r["media_id"]]
        i = r["frame_idx"]
        assert i % 3 == 0
        want = payload[i * mm.FRAME_BYTES : (i + 1) * mm.FRAME_BYTES]
        assert bytes(r["frame"]) == want and len(want) == mm.FRAME_BYTES
        seen.setdefault(r["media_id"], set()).add(i)
    for mid, payload in texts.items():
        n_frames = len(payload) // mm.FRAME_BYTES
        want_idx = set(range(0, n_frames, 3))
        assert seen.get(mid, set()) == want_idx


# ---------------------------------------------------------------------------
# REAL decoders (round 4): PGM hand parser + stdlib WAV
# ---------------------------------------------------------------------------


class TestRealDecoders:
    def test_pgm_roundtrip_golden(self):
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_pgm,
            synth_pgm_bytes,
        )

        px = decode_pgm(synth_pgm_bytes(7, w=5, h=3))
        assert px.shape == (3, 5)
        want = [[(3 * x + y * y + 7) % 256 for x in range(5)] for y in range(3)]
        assert px.tolist() == want
        assert px.dtype == np.uint8

    def test_pgm_parses_comments_and_whitespace(self):
        from vector_database_in_rust_spark.operators.multimodal import decode_pgm

        raw = b"P5 # magic\n# a comment line\n 2\t3 # dims\n255\n" + bytes(
            range(6)
        )
        px = decode_pgm(raw)
        assert px.shape == (3, 2)
        assert px.flatten().tolist() == [0, 1, 2, 3, 4, 5]

    def test_pgm_rejects_bad_magic_and_truncation(self):
        import pytest as _pytest

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_pgm,
            synth_pgm_bytes,
        )

        with _pytest.raises(ValueError, match="P5"):
            decode_pgm(b"P6\n2 2\n255\n" + bytes(12))
        with _pytest.raises(ValueError, match="truncated"):
            decode_pgm(synth_pgm_bytes(0)[:-10])

    def test_wav_roundtrip_golden(self):
        from vector_database_in_rust_spark.operators.multimodal import (
            decode_wav,
            synth_wav_bytes,
        )

        rate, s = decode_wav(synth_wav_bytes(5, n=100, rate=4000))
        assert rate == 4000
        assert len(s) == 100
        k = 5 % 127 + 1
        assert s.tolist() == [((i * k) % 2048) - 1024 for i in range(100)]

    def test_wav_is_a_real_riff_file(self):
        from vector_database_in_rust_spark.operators.multimodal import (
            synth_wav_bytes,
        )

        b = synth_wav_bytes(1)
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"

    def test_image_stats_and_resize_consistent(self, spark):
        """Spark-side decode stats must equal numpy recomputation on the
        same payloads; the 1x1 'resize' equals the global mean."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            attach_pgm_payload,
            decode_pgm,
            image_decode_stats,
            image_resize_real,
            synth_pgm_bytes,
        )

        from pyspark.sql import functions as F

        docs = spark.range(6).select(F.col("id").alias("doc_id"))
        media = attach_pgm_payload(docs)
        stats = {
            r["media_id"]: r for r in image_decode_stats(media).collect()
        }
        for did in range(6):
            px = decode_pgm(synth_pgm_bytes(did)).astype(np.int64)
            assert stats[did]["mean_px"] == round(px.sum() / px.size, 6)
            assert stats[did]["corner_px"] == px[0, 0]
        one = image_resize_real(media, out_w=1, out_h=1).collect()
        for r in one:
            px = decode_pgm(synth_pgm_bytes(r["media_id"])).astype(np.int64)
            assert r["px_mean"] == round(px.sum() / px.size, 6)


# ---------------------------------------------------------------------------
# REAL PNG codec (round 5): stdlib-zlib DEFLATE + chunk CRCs + full
# scanline defilter — the compressed-format decode path.
# ---------------------------------------------------------------------------


class TestPngCodec:
    def test_png_roundtrip_all_filters(self):
        """The synthesizer cycles filter types y%5, so one roundtrip
        exercises None/Sub/Up/Average/Paeth reconstruction; pixels must
        equal the generative formula exactly."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_png,
            synth_png_bytes,
        )

        for seed in (0, 3, 77, 255):
            px = decode_png(synth_png_bytes(seed, w=11, h=9))
            want = [
                [(7 * x + y * y + 2 * seed) % 256 for x in range(11)]
                for y in range(9)
            ]
            assert px.shape == (9, 11)
            assert px.tolist() == want
            assert px.dtype == np.uint8

    def test_png_is_a_real_png_file(self):
        """Signature, IHDR-first layout, and genuine DEFLATE compression
        (well under raw size on this structured image)."""
        from vector_database_in_rust_spark.operators.multimodal import (
            IMG_H,
            IMG_W,
            synth_png_bytes,
        )

        b = synth_png_bytes(0)
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        assert b[12:16] == b"IHDR"
        assert b[-8:-4] == b"IEND"
        assert len(b) < IMG_W * IMG_H  # actually compressed

    def test_png_rejects_corruption(self):
        import struct
        import pytest as _pytest

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_png,
            synth_png_bytes,
        )

        with _pytest.raises(ValueError, match="signature"):
            decode_png(b"not a png at all")
        # flip one byte inside the IDAT payload -> chunk CRC mismatch
        b = bytearray(synth_png_bytes(9))
        b[40] ^= 0xFF
        with _pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(b))
        # valid chunks but wrong color type -> unsupported
        good = synth_png_bytes(1, w=2, h=2)
        ihdr = bytearray(struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        import zlib as _z
        bad = (
            good[:8]
            + struct.pack(">I", 13)
            + b"IHDR"
            + bytes(ihdr)
            + struct.pack(">I", _z.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF)
            + good[8 + 12 + 13 :]
        )
        with _pytest.raises(ValueError, match="grayscale"):
            decode_png(bad)

    def test_png_decoder_interop_with_pgm_stats(self, spark):
        """image_decode_stats with decoder=decode_png must agree with a
        numpy recomputation from the PNG formula — the Spark plumbing is
        decoder-agnostic."""
        import numpy as np

        from pyspark.sql import functions as F

        from vector_database_in_rust_spark.operators.multimodal import (
            attach_png_payload,
            decode_png,
            image_decode_stats,
            synth_png_bytes,
        )

        docs = spark.range(5).select(F.col("id").alias("doc_id"))
        stats = {
            r["media_id"]: r
            for r in image_decode_stats(
                attach_png_payload(docs), decoder=decode_png
            ).collect()
        }
        for did in range(5):
            px = decode_png(synth_png_bytes(did)).astype(np.int64)
            assert stats[did]["mean_px"] == round(px.sum() / px.size, 6)
            assert stats[did]["std_px"] == round(
                float(np.sqrt(np.maximum((px * px).sum() / px.size
                                          - (px.sum() / px.size) ** 2, 0.0))), 6
            )
            assert stats[did]["corner_px"] == px[0, 0]

    def test_png_decode_property_random_pixels_any_filters(self):
        """Property: for ANY pixel matrix and ANY per-row filter
        choice, a spec-conformant encode must decode back exactly —
        pins the defilter reconstruction against arbitrary data, not
        just the formula images."""
        import struct
        import zlib

        import numpy as np
        from hypothesis import given, settings, strategies as st

        from vector_database_in_rust_spark.operators.multimodal import (
            _paeth,
            decode_png,
        )

        def encode(px: np.ndarray, ftypes: list[int]) -> bytes:
            h, w = px.shape
            raw = bytearray()
            prev = np.zeros(w, dtype=np.int64)
            for y in range(h):
                line = px[y].astype(np.int64)
                left = np.concatenate(([0], line[:-1]))
                ul = np.concatenate(([0], prev[:-1]))
                ft = ftypes[y]
                pred = [
                    np.zeros(w, dtype=np.int64),
                    left,
                    prev,
                    (left + prev) // 2,
                    _paeth(left, prev, ul),
                ][ft]
                raw.append(ft)
                raw.extend(((line - pred) % 256).astype(np.uint8).tobytes())
                prev = line

            def chunk(t, d):
                return (
                    struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + chunk(b"IEND", b""))

        @settings(max_examples=40, deadline=None)
        @given(st.data())
        def run(data):
            w = data.draw(st.integers(1, 12))
            h = data.draw(st.integers(1, 12))
            px = np.array(
                data.draw(
                    st.lists(
                        st.lists(st.integers(0, 255), min_size=w, max_size=w),
                        min_size=h,
                        max_size=h,
                    )
                ),
                dtype=np.uint8,
            )
            ftypes = data.draw(
                st.lists(st.integers(0, 4), min_size=h, max_size=h)
            )
            assert decode_png(encode(px, ftypes)).tolist() == px.tolist()

        run()


# ---------------------------------------------------------------------------
# REAL baseline JPEG codec (round 5): Annex K Huffman tables, DC-diff +
# AC run-length entropy coding, byte stuffing, IDCT — compressed-format
# decode #2.
# ---------------------------------------------------------------------------


class TestJpegCodec:
    def test_jpeg_flat_blocks_lossless(self):
        """Block-constant images with all-ones quantization roundtrip
        EXACTLY (only integer DC coefficients survive the DCT), at
        several seeds and a non-square size."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_jpeg,
            synth_jpeg_bytes,
        )

        for seed in (0, 1, 42, 255, 99991):
            px = decode_jpeg(synth_jpeg_bytes(seed))
            bxs = np.arange(4, dtype=np.int64)[None, :]
            bys = np.arange(4, dtype=np.int64)[:, None]
            blocks = (17 * bxs + 29 * bys * bys + 5 * seed + 13) % 256
            want = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
            assert px.shape == (32, 32)
            assert (px == want).all()
            assert px.dtype == np.uint8

    def test_jpeg_is_a_real_jfif_file(self):
        """SOI/APP0-JFIF/DQT/SOF0/DHT/SOS/EOI marker layout, and the
        entropy stream is genuinely compressed (flat blocks cost ~2
        symbols each, far under raw size)."""
        from vector_database_in_rust_spark.operators.multimodal import (
            IMG_H,
            IMG_W,
            synth_jpeg_bytes,
        )

        b = synth_jpeg_bytes(0)
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in b
        assert len(b) < IMG_W * IMG_H

    def test_jpeg_general_image_coefficient_exact(self):
        """On arbitrary images the codec is lossy ONLY through
        coefficient quantization: decode(encode(img)) must equal the
        independently-computed round(IDCT(round(DCT(img))))
        reconstruction bit-for-bit — Huffman/RLE/stuffing add no
        error. Amplitudes span DC categories and AC runs incl. ZRL."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            _DCT8,
            decode_jpeg,
            encode_jpeg_gray,
        )

        rng = np.random.default_rng(1234)
        for shape in ((8, 8), (16, 40), (32, 32)):
            img = rng.integers(96, 160, size=shape).astype(np.uint8)
            # sprinkle flat regions to force long zero runs / ZRL / EOB
            img[: shape[0] // 2, : shape[1] // 2] = 128
            out = decode_jpeg(encode_jpeg_gray(img))
            sh = img.astype(np.float64) - 128.0
            rec = np.zeros_like(img)
            for by in range(shape[0] // 8):
                for bx in range(shape[1] // 8):
                    b = sh[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    coef = np.rint(_DCT8 @ b @ _DCT8.T)
                    px = _DCT8.T @ coef @ _DCT8 + 128.0
                    rec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                        np.rint(px), 0, 255
                    )
            assert (out == rec).all()

    def test_jpeg_property_random_images(self):
        """Hypothesis: any low-contrast random image (AC categories in
        range) roundtrips coefficient-exactly; decoded size matches."""
        import numpy as np
        from hypothesis import given, settings, strategies as st

        from vector_database_in_rust_spark.operators.multimodal import (
            _DCT8,
            decode_jpeg,
            encode_jpeg_gray,
        )

        @settings(max_examples=20, deadline=None)
        @given(
            st.integers(0, 2**31 - 1),
            st.sampled_from([(8, 8), (8, 16), (24, 8)]),
        )
        def check(seed, shape):
            rng = np.random.default_rng(seed)
            img = rng.integers(64, 192, size=shape).astype(np.uint8)
            out = decode_jpeg(encode_jpeg_gray(img))
            assert out.shape == shape
            sh = img.astype(np.float64) - 128.0
            for by in range(shape[0] // 8):
                for bx in range(shape[1] // 8):
                    b = sh[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    coef = np.rint(_DCT8 @ b @ _DCT8.T)
                    px = np.clip(
                        np.rint(_DCT8.T @ coef @ _DCT8 + 128.0), 0, 255
                    )
                    got = out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    assert (got == px).all()

        check()

    def test_jpeg_rejects_malformed(self):
        import pytest as _pytest

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_jpeg,
            synth_jpeg_bytes,
        )

        with _pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"definitely not a jpeg")
        good = synth_jpeg_bytes(5)
        # progressive SOF2 must be rejected, not misparsed
        bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with _pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg(bad)
        # truncate before the scan
        with _pytest.raises((ValueError, IndexError)):
            decode_jpeg(good[:40])

    def test_jpeg_quant_table_is_read_from_file(self):
        """The decoder must dequantize with the table IN THE FILE, not
        an assumed one: encoding with quant=2 halves the coefficients
        and the decoder must multiply them back."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            _DCT8,
            decode_jpeg,
            encode_jpeg_gray,
        )

        img = np.full((8, 8), 200, dtype=np.uint8)
        img[0, 0] = 100
        q = np.full((8, 8), 2, dtype=np.int64)
        out = decode_jpeg(encode_jpeg_gray(img, quant=q))
        sh = img.astype(np.float64) - 128.0
        coef = np.rint((_DCT8 @ sh @ _DCT8.T) / 2.0)
        rec = np.clip(np.rint(_DCT8.T @ (coef * 2.0) @ _DCT8 + 128.0), 0, 255)
        assert (out == rec).all()


# ---------------------------------------------------------------------------
# REAL ISO BMFF (MP4) container demux (round 5): box walk + sample
# tables + frame extraction.
# ---------------------------------------------------------------------------


class TestMp4Demux:
    def test_mp4_frames_roundtrip(self):
        """Every frame of the synthesized file must equal the
        generative formula — frame boundaries come from the sample
        tables, split across two chunks."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            parse_mp4_frames,
            synth_mp4_bytes,
        )

        for seed in (0, 5, 123, 4096):
            frames = parse_mp4_frames(synth_mp4_bytes(seed))
            assert len(frames) == 6
            xs = np.arange(16, dtype=np.int64)[None, :]
            ys = np.arange(16, dtype=np.int64)[:, None]
            for f, fr in enumerate(frames):
                want = (11 * xs + 5 * ys + 19 * f + 7 * seed) % 256
                assert (fr == want).all()

    def test_mp4_is_a_real_bmff_file(self):
        from vector_database_in_rust_spark.operators.multimodal import (
            synth_mp4_bytes,
        )

        b = synth_mp4_bytes(0)
        assert b[4:8] == b"ftyp"
        for box in (b"moov", b"mdat", b"stsd", b"stsz", b"stsc", b"stco",
                    b"stts", b"trak", b"mdia", b"minf", b"stbl", b"vide"):
            assert box in b

    def test_mp4_rejects_malformed(self):
        import pytest as _pytest

        from vector_database_in_rust_spark.operators.multimodal import (
            parse_mp4_frames,
            synth_mp4_bytes,
        )

        with _pytest.raises(ValueError):
            parse_mp4_frames(b"nope")
        good = synth_mp4_bytes(1)
        # compressed essence must raise, not misparse: swap the sample
        # entry fourcc from 'raw ' to 'avc1'
        bad = good.replace(b"raw ", b"avc1", 1)
        with _pytest.raises(ValueError, match="avc1"):
            parse_mp4_frames(bad)
        # truncate inside mdat: a sample runs past end of file...
        # (moov follows mdat here, so cutting the tail kills moov first)
        with _pytest.raises(ValueError):
            parse_mp4_frames(good[:100])

    def test_mp4_chunk_mapping_exercised(self):
        """The two-chunk stsc layout must place frames at two distinct
        stco offsets; collapsing the mapping to one chunk would shift
        the second half by 8 header bytes and change the pixels."""
        from vector_database_in_rust_spark.operators.multimodal import (
            synth_mp4_bytes,
        )

        b = synth_mp4_bytes(7)
        i = b.index(b"stco")
        n_chunks = int.from_bytes(b[i + 8 : i + 12], "big")
        assert n_chunks == 2

    def test_mp4_odd_frame_count(self):
        """n_frames=5 splits 2+3 across the chunks — the stsc run
        arithmetic must still cover every sample."""
        from vector_database_in_rust_spark.operators.multimodal import (
            parse_mp4_frames,
            synth_mp4_bytes,
        )

        frames = parse_mp4_frames(synth_mp4_bytes(3, n_frames=5))
        assert len(frames) == 5


# ---------------------------------------------------------------------------
# G.711 mu-law WAV (round 5, second half): companded-audio decode.
# ---------------------------------------------------------------------------


class TestMulaw:
    def test_g711_table_extremes(self):
        """The four classic G.711 spot values pin the expansion: 0xFF
        and 0x7F are plus/minus zero, 0x00 and 0x80 are the +-32124
        extremes."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            mulaw_expand,
        )

        got = mulaw_expand(np.array([0xFF, 0x7F, 0x00, 0x80], dtype=np.uint8))
        assert got.tolist() == [0, 0, -32124, 32124]

    def test_mulaw_expansion_is_monotone_per_sign(self):
        """Within each sign half, decreasing codewords (after the
        complement) must expand to strictly non-decreasing magnitudes —
        the segment structure of the companding law."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            mulaw_expand,
        )

        # positive half: bytes 0xFF (zero) down to 0x80 (max)
        pos = mulaw_expand(np.arange(0xFF, 0x7F, -1, dtype=np.uint8))
        assert (np.diff(pos) >= 0).all() and pos[0] == 0 and pos[-1] == 32124
        neg = mulaw_expand(np.arange(0x7F, -1, -1, dtype=np.uint8))
        assert (np.diff(neg) <= 0).all() and neg[-1] == -32124

    def test_mulaw_wav_roundtrip_golden(self):
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_wav_mulaw,
            mulaw_expand,
            synth_wav_mulaw_bytes,
        )

        for seed in (0, 9, 999):
            rate, s = decode_wav_mulaw(synth_wav_mulaw_bytes(seed))
            codes = ((13 * np.arange(1024) + 7 * seed + 5) % 256).astype(
                np.uint8
            )
            assert rate == 8000 and (s == mulaw_expand(codes)).all()

    def test_mulaw_wav_is_a_real_riff_file(self):
        from vector_database_in_rust_spark.operators.multimodal import (
            synth_wav_mulaw_bytes,
        )

        b = synth_wav_mulaw_bytes(1)
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        assert b"fmt " in b and b"data" in b
        i = b.index(b"fmt ")
        assert int.from_bytes(b[i + 8 : i + 10], "little") == 7  # MULAW tag

    def test_mulaw_rejects_malformed(self):
        import pytest as _pytest

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_wav_mulaw,
            synth_wav_bytes,
            synth_wav_mulaw_bytes,
        )

        with _pytest.raises(ValueError):
            decode_wav_mulaw(b"not a riff")
        # a PCM (format tag 1) file must be refused, not silently
        # expanded as if companded
        with _pytest.raises(ValueError, match="not WAVE_FORMAT_MULAW"):
            decode_wav_mulaw(synth_wav_bytes(3))
        good = synth_wav_mulaw_bytes(3)
        with _pytest.raises(ValueError):
            decode_wav_mulaw(good[:40])

    def test_mulaw_odd_data_chunk_pad(self):
        """RIFF chunks are word-aligned: an odd-length data chunk is
        followed by a pad byte the walker must skip to find later
        chunks."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_wav_mulaw,
            synth_wav_mulaw_bytes,
        )

        rate, s = decode_wav_mulaw(synth_wav_mulaw_bytes(2, n=777))
        assert len(s) == 777


# ---------------------------------------------------------------------------
# Motion-JPEG in MP4 (round 5, second half): compressed video ESSENCE
# decoded for real — demux + per-sample baseline-JPEG decode.
# ---------------------------------------------------------------------------


class TestMjpegMp4:
    def test_mjpeg_frames_lossless_roundtrip(self):
        """All-ones quantization over block-constant frames makes the
        in-container JPEG codec exactly lossless, so every demuxed and
        entropy-decoded frame must equal the generative block
        formula."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            parse_mp4_frames,
            synth_mp4_bytes,
        )

        for seed in (0, 17, 500):
            frames = parse_mp4_frames(synth_mp4_bytes(seed, codec="mjpg"))
            assert len(frames) == 6
            bxs = np.arange(2, dtype=np.int64)[None, :]
            bys = np.arange(2, dtype=np.int64)[:, None]
            for f, fr in enumerate(frames):
                blocks = (13 * bxs + 31 * bys + 23 * f + 7 * seed + 11) % 256
                want = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                assert (fr.astype(np.int64) == want).all()

    def test_mjpeg_samples_are_complete_jfif_files(self):
        """Each sample in the mdat must start with SOI and end with EOI
        at exactly the stsz-recorded boundary — a demuxer mis-slice
        would hand the JPEG parser a stream without its markers."""
        from vector_database_in_rust_spark.operators.multimodal import (
            synth_mp4_bytes,
        )

        b = synth_mp4_bytes(11, codec="mjpg")
        i = b.index(b"stsz")
        n = int.from_bytes(b[i + 12 : i + 16], "big")
        sizes = [
            int.from_bytes(b[i + 16 + 4 * k : i + 20 + 4 * k], "big")
            for k in range(n)
        ]
        assert len(set(sizes)) > 1  # variable-size path genuinely exercised
        i = b.index(b"stco")
        offs = [
            int.from_bytes(b[i + 12 : i + 16], "big"),
            int.from_bytes(b[i + 16 : i + 20], "big"),
        ]
        pos, c1 = offs[0], 3
        for k, sz in enumerate(sizes):
            if k == c1:
                pos = offs[1]
            assert b[pos : pos + 2] == b"\xff\xd8"
            assert b[pos + sz - 2 : pos + sz] == b"\xff\xd9"
            pos += sz

    def test_mjpeg_dimension_mismatch_rejected(self):
        """If stsd claims different dimensions than the JPEG frames
        decode to, the demuxer must refuse rather than emit frames
        that contradict the sample description."""
        import pytest as _pytest

        from vector_database_in_rust_spark.operators.multimodal import (
            parse_mp4_frames,
            synth_mp4_bytes,
        )

        good = synth_mp4_bytes(4, codec="mjpg")
        i = good.index(b"mjpg")  # stsd sample entry fourcc
        # width field sits 28 bytes after the fourcc in the entry
        bad = bytearray(good)
        bad[i + 28 : i + 30] = (24).to_bytes(2, "big")
        with _pytest.raises(ValueError, match="stsd says"):
            parse_mp4_frames(bytes(bad))

    def test_raw_and_mjpeg_share_the_demux_path(self):
        """The sample-table walk is codec-agnostic: both payloads must
        report the same frame count and chunk split."""
        from vector_database_in_rust_spark.operators.multimodal import (
            parse_mp4_frames,
            synth_mp4_bytes,
        )

        raw = parse_mp4_frames(synth_mp4_bytes(9))
        mj = parse_mp4_frames(synth_mp4_bytes(9, codec="mjpg"))
        assert len(raw) == len(mj) == 6
        assert raw[0].shape == mj[0].shape == (16, 16)


# ---------------------------------------------------------------------------
# IMA ADPCM (round 5, second half): adaptive lossy audio.
# ---------------------------------------------------------------------------


class TestAdpcm:
    def test_first_sample_exact_and_bounds(self):
        """Header predictor carries sample 0 verbatim; the adaptive
        loop must track the triangle within the verdict bounds for
        every slope class k in 1..127."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            _adpcm_source,
            decode_wav_adpcm,
            synth_wav_adpcm_bytes,
        )

        for seed in (0, 1, 63, 126, 300):
            rate, n, s = decode_wav_adpcm(synth_wav_adpcm_bytes(seed))
            src = _adpcm_source(seed, n)
            assert rate == 8000 and n == 1023 and s[0] == src[0]
            err = np.abs(s - src)
            assert err.max() <= 512
            assert float(np.sqrt(((s - src).astype(float) ** 2).mean())) <= 128

    def test_decode_tracks_closed_loop_encoder_exactly(self):
        """decode(encode(x)) must equal the encoder's own internal
        reconstruction — the defining DPCM property: zero drift
        between the two adaptive state machines."""
        import numpy as np

        from vector_database_in_rust_spark.operators.multimodal import (
            _IMA_STEPS,
            _ima_decode_nibble,
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        rng = np.random.RandomState(7)
        x = rng.randint(-32768, 32767, size=501).astype(np.int64)
        block = ima_adpcm_encode(x)
        s = ima_adpcm_decode(block, 501)
        # replay the encoder's reconstruction path
        pred, index = int(x[0]), 0
        recon = [pred]
        codes = []
        for byte in block[4:]:
            codes += [byte & 0x0F, byte >> 4]
        for code in codes[:500]:
            pred, index = _ima_decode_nibble(code, pred, index)
            recon.append(pred)
        assert (s == np.array(recon)).all()

    def test_is_a_real_adpcm_wav(self):
        from vector_database_in_rust_spark.operators.multimodal import (
            synth_wav_adpcm_bytes,
        )

        b = synth_wav_adpcm_bytes(5)
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        i = b.index(b"fmt ")
        assert int.from_bytes(b[i + 8 : i + 10], "little") == 0x11
        # wSamplesPerBlock in the fmt extension
        assert int.from_bytes(b[i + 26 : i + 28], "little") == 1023

    def test_rejects_malformed(self):
        import pytest as _pytest

        from vector_database_in_rust_spark.operators.multimodal import (
            decode_wav_adpcm,
            synth_wav_bytes,
            synth_wav_mulaw_bytes,
            synth_wav_adpcm_bytes,
        )

        with _pytest.raises(ValueError):
            decode_wav_adpcm(b"junk")
        with _pytest.raises(ValueError, match="not IMA ADPCM"):
            decode_wav_adpcm(synth_wav_mulaw_bytes(1))
        good = synth_wav_adpcm_bytes(1)
        with _pytest.raises(ValueError):
            decode_wav_adpcm(good[:60])

    def test_step_index_out_of_range_rejected(self):
        import pytest as _pytest

        from vector_database_in_rust_spark.operators.multimodal import (
            synth_wav_adpcm_bytes,
            decode_wav_adpcm,
        )

        good = bytearray(synth_wav_adpcm_bytes(2))
        i = bytes(good).index(b"data") + 8 + 2  # block header index byte
        good[i] = 90
        with _pytest.raises(ValueError, match="out of range"):
            decode_wav_adpcm(bytes(good))


def test_quarantine_classifies_planted_corruption(spark):
    """Flipped-byte files (CRC) and truncated files both quarantine;
    good files decode with exact stats; nothing is silently wrong."""
    from vector_database_in_rust_spark.operators.multimodal import (
        attach_png_payload_corrupt,
        decode_png,
        image_decode_quarantine,
        synth_png_bytes,
    )

    docs = spark.createDataFrame([(i,) for i in range(14)], "doc_id long")
    out = {
        r["media_id"]: r
        for r in image_decode_quarantine(
            attach_png_payload_corrupt(docs), decoder=decode_png
        ).collect()
    }
    assert len(out) == 14
    for i in range(14):
        if i % 7 in (3, 5):
            assert not out[i]["ok"] and out[i]["mean_px"] is None
        else:
            assert out[i]["ok"] and out[i]["width"] == 32
    # the corruption is REAL: a flipped byte must raise at decode
    import pytest as _pytest

    raw = bytearray(synth_png_bytes(3))
    raw[len(raw) // 2] ^= 0xFF
    with _pytest.raises(Exception):
        decode_png(bytes(raw))
