"""REAL MPEG-1 video (ISO/IEC 11172-2) subset codec — round 5, second
half. Closes the last media stub ("inter-frame video essence") with
ZERO new dependencies: a genuine motion-compensated bitstream decoder
over the published syntax —

  sequence_header / GOP / picture / slice start codes, bit-serial
  macroblock layer with the Annex-B VLC tables (B.1 address
  increments, B.2a/B.2b macroblock types, B.4 motion codes, B.5a/B.5b
  DC size tables, run-level AC with EOB and escape), intra DC
  PREDICTION CHAINS with the slice/non-intra reset rule, forward
  MOTION COMPENSATION with signed full-pel vectors and per-macroblock
  predictor reset, SKIPPED-macroblock copy semantics, dequantization
  (fixed x8 intra DC; AC via the default intra matrix with
  mismatch-control oddification) and the separable orthonormal IDCT
  shared in spirit with the JPEG lane.

The paired encoder emits spec-shaped streams whose intra blocks are
DC-only and whose MC macroblocks carry zero residual, so reconstruction
is integer-EXACT and the driver oracle predicts every decoded pixel
analytically (see ``synth_mpeg1_bytes``). Decoder tables are
transcribed from the public standard; conformance against external
encoders is untested in this container (no ffmpeg) — the same
epistemic position as the JPEG lane, whose tables come from T.81
Annex K. B-pictures, coded-residual prediction (cbp) parsing beyond
the table entries, and half-pel interpolation raise ``ValueError``
with the unsupported feature named.

Reference parity note: the reference (apaul02/Vector-Database-in-Rust)
has no media path at all — this lane is north-star extension surface
(SURVEY.md §2.3 multimodal columns).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Bit IO (MPEG has no byte stuffing — plain MSB-first bit serial)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                self._acc, self._n = 0, 0

    def put_bits(self, bits: str) -> None:
        for b in bits:
            self.put(1 if b == "1" else 0, 1)

    def align(self) -> None:
        while self._n:
            self.put(0, 1)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read_bit(self) -> int:
        if self.byte >= len(self.data):
            raise ValueError("MPEG-1 bitstream truncated")
        b = (self.data[self.byte] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.byte = 0, self.byte + 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit, self.byte = 0, self.byte + 1


# ---------------------------------------------------------------------------
# Annex-B VLC tables (ISO/IEC 11172-2). Stored as code-string -> value;
# decoded by longest-prefix walk. Only the rows below are transcribed —
# enough for every stream this module emits plus headroom; an
# unrecognized prefix raises rather than misparses.
# ---------------------------------------------------------------------------

# B.1 macroblock_address_increment
_B1_ADDR_INC = {
    "1": 1, "011": 2, "010": 3, "0011": 4, "0010": 5,
    "00011": 6, "00010": 7, "0000111": 8, "0000110": 9,
    "00001011": 10, "00001010": 11, "00001001": 12, "00001000": 13,
    "00000111": 14, "00000110": 15,
}

# B.2a macroblock_type, I-pictures: (quant, motion_forward, pattern, intra)
_B2A_I_TYPE = {"1": (0, 0, 0, 1), "01": (1, 0, 0, 1)}

# B.2b macroblock_type, P-pictures
_B2B_P_TYPE = {
    "1": (0, 1, 1, 0),      # pred-mc+cbp
    "01": (0, 0, 1, 0),     # pred-cbp
    "001": (0, 1, 0, 0),    # pred-mc (no coded blocks)
    "00011": (0, 0, 0, 1),  # intra
    "00010": (1, 1, 1, 0),  # pred-mc+cbp+quant
    "00001": (1, 0, 1, 0),  # pred-cbp+quant
    "000001": (1, 0, 0, 1), # intra+quant
}

# B.4 motion_code (signed, full table to |8|; positive ends in 0)
_B4_MOTION = {"1": 0}
for _mag, _base in [
    (1, "01"), (2, "001"), (3, "0001"), (4, "000011"),
    (5, "0000101"), (6, "0000100"), (7, "0000011"), (8, "000001011"),
]:
    _B4_MOTION[_base + "0"] = _mag
    _B4_MOTION[_base + "1"] = -_mag

# B.5a dct_dc_size_luminance / B.5b dct_dc_size_chrominance
_B5A_DC_LUMA = {
    "100": 0, "00": 1, "01": 2, "101": 3, "110": 4,
    "1110": 5, "11110": 6, "111110": 7, "1111110": 8,
}
_B5B_DC_CHROMA = {
    "00": 0, "01": 1, "10": 2, "110": 3, "1110": 4,
    "11110": 5, "111110": 6, "1111110": 7, "11111110": 8,
}

# Run-level AC table (B.5c head): (run, |level|) -> code WITHOUT the
# trailing sign bit. '10' is EOB; '000001' is escape. Head rows only —
# this module's streams are DC-only, the decoder handles small
# residuals and raises on unknown prefixes.
_AC_HEAD = {
    "11": (0, 1),  # first-coefficient form is handled in the decoder
    "011": (1, 1), "0100": (0, 2), "0101": (2, 1),
    "00101": (0, 3), "00111": (3, 1), "00110": (4, 1),
    "000110": (1, 2), "000111": (5, 1), "000101": (6, 1),
    "000100": (7, 1),
}
_EOB = "10"
_ESCAPE = "000001"


def _invert(table: dict) -> dict:
    return {v: k for k, v in table.items()}


_B1_ENC = _invert(_B1_ADDR_INC)
_B4_ENC = _invert(_B4_MOTION)
_B5A_ENC = _invert(_B5A_DC_LUMA)
_B5B_ENC = _invert(_B5B_DC_CHROMA)


def _read_vlc(br: _BitReader, table: dict, what: str):
    code = ""
    for _ in range(16):
        code += "1" if br.read_bit() else "0"
        if code in table:
            return table[code]
    raise ValueError(f"bad {what} VLC prefix {code!r}")


def _dc_size_bits(diff: int) -> tuple[int, int]:
    """(size, amplitude bits): positive plain, negative offset by
    2^size - 1 (11172-2 §2.4.3.7)."""
    mag, size = abs(diff), 0
    while mag:
        mag >>= 1
        size += 1
    if diff >= 0:
        return size, diff
    return size, diff + (1 << size) - 1


def _dc_extend(size: int, bits: int) -> int:
    if size == 0:
        return 0
    if bits >= (1 << (size - 1)):
        return bits
    return bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# Encoder (synthesis): DC-only intra + zero-residual MC, spec-shaped.
# ---------------------------------------------------------------------------

VID_W, VID_H, VID_FRAMES = 64, 16, 5
_MB_LAYOUT = ("intra", "mc", "skip", "intra")  # per P-picture, 4 MBs
_MVX = -4  # forward motion: prediction read 4 pixels to the LEFT


def _start_code(bw: _BitWriter, code: int) -> None:
    bw.align()
    bw.put(0x000001, 24)
    bw.put(code, 8)


def _put_dc(bw: _BitWriter, diff: int, table_enc: dict) -> None:
    size, bits = _dc_size_bits(diff)
    bw.put_bits(table_enc[size])
    if size:
        bw.put(bits, size)


def _intra_mb(bw: _BitWriter, y_val: int, preds: dict) -> None:
    """Six DC-only blocks (4Y, Cb, Cr), each DC + EOB; luma predictor
    chains through the Y blocks, chroma stays at its predictor (128)."""
    for blk in range(6):
        if blk < 4:
            diff = y_val - preds["y"]
            preds["y"] = y_val
            _put_dc(bw, diff, _B5A_ENC)
        else:
            _put_dc(bw, 0, _B5B_ENC)  # chroma constant 128
        bw.put_bits(_EOB)


def encode_mpeg1_gray(
    frame_specs: list[list[tuple]], w: int, h: int
) -> bytes:
    """A general spec-shaped MPEG-1 encoder for one-MB-row streams:
    ``frame_specs[f]`` lists one op per macroblock —

      ("intra", value)   DC-only intra block, constant ``value``
      ("mc", mvx, mvy)   forward MC, zero residual, full-pel vector
      ("skip",)          skipped (copy co-located; illegal first/last
                         and illegal in I-pictures, enforced)

    Frame 0 must be all-intra (the I-picture). Used by
    :func:`synth_mpeg1_bytes` for the fixed driver layout and by the
    property tests to exercise ARBITRARY layouts against an
    independent reconstruction simulation."""
    if h != 16 or w % 16:
        raise ValueError("encoder supports one 16-aligned MB row")
    mb_w = w // 16
    for f, spec in enumerate(frame_specs):
        if len(spec) != mb_w:
            raise ValueError(f"frame {f}: {len(spec)} ops for {mb_w} MBs")
        if f == 0 and any(op[0] != "intra" for op in spec):
            raise ValueError("I-picture must be all-intra")
        if spec[0][0] == "skip" or spec[-1][0] == "skip":
            raise ValueError("first/last macroblock of a slice cannot skip")
        for mb, op in enumerate(spec):
            if op[0] == "mc":
                # full_pel_forward_vector=1 doubles the coded
                # motion_code (§2.4.4.2), so only EVEN displacements
                # are expressible and the coded value is mvx/2.
                if op[1] % 2 or op[2] % 2:
                    raise ValueError(
                        "full-pel streams can only express even "
                        f"displacements, got {op[1:3]}"
                    )
                if op[1] // 2 not in _B4_ENC or op[2] // 2 not in _B4_ENC:
                    raise ValueError(
                        "motion code outside the transcribed B.4 rows "
                        "(|displacement/2| <= 8)"
                    )
                if not (0 <= mb * 16 + op[1] and mb * 16 + 16 + op[1] <= w):
                    raise ValueError("motion vector references out of frame")
                if op[2] != 0:
                    raise ValueError("one-MB-row streams require mvy == 0")

    bw = _BitWriter()
    _start_code(bw, 0xB3)  # sequence header
    bw.put(w, 12)
    bw.put(h, 12)
    bw.put(1, 4)   # pel aspect 1:1
    bw.put(3, 4)   # picture rate code 3 (25 fps)
    bw.put(0x3FFFF, 18)  # bit_rate: variable
    bw.put(1, 1)   # marker
    bw.put(16, 10)  # vbv_buffer_size
    bw.put(0, 1)   # constrained_parameters_flag
    bw.put(0, 1)   # load_intra_quantizer_matrix (default)
    bw.put(0, 1)   # load_non_intra_quantizer_matrix (default)

    _start_code(bw, 0xB8)  # GOP
    bw.put(0, 1)  # drop_frame
    bw.put(0, 5)  # hours
    bw.put(0, 6)  # minutes
    bw.put(1, 1)  # marker
    bw.put(0, 6)  # seconds
    bw.put(0, 6)  # pictures
    bw.put(1, 1)  # closed_gop
    bw.put(0, 1)  # broken_link

    for f, spec in enumerate(frame_specs):
        _start_code(bw, 0x00)  # picture
        bw.put(f, 10)          # temporal reference
        bw.put(1 if f == 0 else 2, 3)  # I or P
        bw.put(0xFFFF, 16)     # vbv_delay
        if f > 0:
            bw.put(1, 1)  # full_pel_forward_vector
            bw.put(1, 3)  # forward_f_code = 1
        bw.put(0, 1)  # extra_bit_picture

        _start_code(bw, 0x01)  # slice, vertical position 1
        bw.put(8, 5)  # quantizer_scale
        bw.put(0, 1)  # extra_bit_slice
        preds = {"y": 128}
        pending_inc = 1
        for op in spec:
            if op[0] == "skip":
                pending_inc += 1
                preds["y"] = 128  # skip resets the DC chain
                continue
            bw.put_bits(_B1_ENC[pending_inc])
            pending_inc = 1
            if op[0] == "intra":
                bw.put_bits("1" if f == 0 else "00011")
                _intra_mb(bw, int(op[1]) % 256, preds)
            else:  # mc
                bw.put_bits("001")  # B.2b pred-mc
                # coded motion_code = displacement / 2 (full_pel <<1)
                bw.put_bits(_B4_ENC[op[1] // 2])  # horizontal
                bw.put_bits(_B4_ENC[op[2] // 2])  # vertical
                preds["y"] = 128  # non-intra MB resets the DC chain
    _start_code(bw, 0xB7)  # sequence end
    bw.align()
    return bytes(bw.out)


def simulate_reconstruction(
    frame_specs: list[list[tuple]], w: int, h: int = 16
) -> list[np.ndarray]:
    """Reference reconstruction straight from MC/skip/intra SEMANTICS —
    no bitstream involved. The property tests compare
    ``decode_mpeg1(encode_mpeg1_gray(spec))`` against this, so an
    encoder/decoder pair that is self-consistent but wrong about the
    semantics (mis-signed vector, wrong skip default) still fails."""
    frames = []
    prev = None
    for spec in frame_specs:
        cur = np.zeros((h, w), dtype=np.uint8) if prev is None else prev.copy()
        for mb, op in enumerate(spec):
            x0 = mb * 16
            if op[0] == "intra":
                cur[:, x0 : x0 + 16] = int(op[1]) % 256
            elif op[0] == "mc":
                cur[:, x0 : x0 + 16] = prev[:, x0 + op[1] : x0 + 16 + op[1]]
            # skip: co-located copy, already in place
        frames.append(cur)
        prev = cur
    return frames


def synth_mpeg1_bytes(
    seed: int, n_frames: int = VID_FRAMES, w: int = VID_W, h: int = VID_H
) -> bytes:
    """The driver layout, 64x16, one slice per picture; P-pictures:

      MB0 intra a_f | MB1 MC(-4,0) | MB2 SKIPPED | MB3 intra m_f

    with a_f = (37f + 11*seed + 29) % 256, m_f = (91f + 13*seed + 57)
    % 256, and the I-picture all-intra with MBk = b_k = (53k + 7*seed
    + 101) % 256 (b_0 := a_0). Zero-residual MC + DC-only intra makes
    reconstruction integer-exact, so decoded pixels follow the closed
    form (4-pixel column c = x // 4):

      c 0-3   : a_f
      c 4-7   : a_{f-(c-3)} if f >= c-3 else b_1   (the MC drag chain)
      c 8-11  : b_2                                 (skipped, static)
      c 12-15 : m_f (f >= 1) else b_3

    Every P-picture exercises real forward MC with a negative full-pel
    vector, a skipped macroblock, and two intra DC predictor resets."""
    if (w, h) != (VID_W, VID_H):
        raise ValueError("driver layout is fixed at 64x16 (4 MBs x 1 row)")
    a = lambda f: (37 * f + 11 * int(seed) + 29) % 256  # noqa: E731
    m = lambda f: (91 * f + 13 * int(seed) + 57) % 256  # noqa: E731
    b = lambda k: (53 * k + 7 * int(seed) + 101) % 256  # noqa: E731
    specs: list[list[tuple]] = [
        [("intra", a(0)), ("intra", b(1)), ("intra", b(2)), ("intra", b(3))]
    ]
    for f in range(1, n_frames):
        specs.append(
            [("intra", a(f)), ("mc", _MVX, 0), ("skip",), ("intra", m(f))]
        )
    return encode_mpeg1_gray(specs, w, h)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

# default intra quantizer matrix (11172-2 §2.4.4.1), zigzag order not
# needed here because only DC survives in this module's streams; kept
# for the AC dequant path.
_DEFAULT_INTRA_Q = np.array(
    [
        8, 16, 19, 22, 26, 27, 29, 34,
        16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38,
        22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48,
        26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69,
        27, 29, 35, 38, 46, 56, 69, 83,
    ],
    dtype=np.int64,
).reshape(8, 8)

# scan order §2.4.4.1 Fig. 2-D: even diagonals run x-ascending, odd
# diagonals y-ascending — (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),...
_ZIGZAG_2D = sorted(
    ((y, x) for y in range(8) for x in range(8)),
    key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else p[1]),
)


def _idct_block(coef: np.ndarray) -> np.ndarray:
    n = np.arange(8)
    c = np.where(n == 0, 1.0 / np.sqrt(2.0), 1.0)
    basis = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    d = 0.5 * c[:, None] * basis  # orthonormal 1-D DCT matrix
    return d.T @ coef.astype(np.float64) @ d


def _read_block(br: _BitReader, *, luma: bool, pred: int) -> tuple[np.ndarray, int]:
    """One intra block: DC (predictive) + AC run-level until EOB.
    Returns (8x8 coefficient array BEFORE dequant, new DC predictor)."""
    size = _read_vlc(br, _B5A_DC_LUMA if luma else _B5B_DC_CHROMA, "dct_dc_size")
    diff = _dc_extend(size, br.read(size)) if size else 0
    dc = pred + diff
    coef = np.zeros((8, 8), dtype=np.int64)
    coef[0, 0] = dc
    idx = 0
    while True:
        code = ""
        for _ in range(17):
            code += "1" if br.read_bit() else "0"
            if code == _EOB:
                return coef, dc
            if code == _ESCAPE:
                run = br.read(6)
                lev = br.read(8)
                if lev == 0:
                    lev = br.read(8)
                elif lev == 128:
                    lev = br.read(8) - 256
                elif lev > 128:
                    lev -= 256
                idx += run + 1
                if idx > 63:
                    raise ValueError("AC run past block end")
                y, x = _ZIGZAG_2D[idx]
                coef[y, x] = lev
                break
            if code in _AC_HEAD:
                run, mag = _AC_HEAD[code]
                sign = br.read_bit()
                idx += run + 1
                if idx > 63:
                    raise ValueError("AC run past block end")
                y, x = _ZIGZAG_2D[idx]
                coef[y, x] = -mag if sign else mag
                break
        else:
            raise ValueError(f"bad AC VLC prefix {code!r}")


def _dequant_intra(coef: np.ndarray, qscale: int) -> np.ndarray:
    out = (2 * coef * qscale * _DEFAULT_INTRA_Q) // 16
    # mismatch control: force odd toward zero (11172-2 §2.4.4.2)
    nz = (out != 0) & (out % 2 == 0)
    out = np.where(nz, out - np.sign(out), out)
    out[0, 0] = 8 * coef[0, 0]  # intra DC: fixed x8, no oddification
    return out


def _next_start_code(br: _BitReader) -> int:
    br.align()
    data, i = br.data, br.byte
    while i + 4 <= len(data):
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            br.byte = i + 4
            return data[i + 3]
        i += 1
    raise ValueError("no further start code")


def decode_mpeg1(content: bytes) -> list[np.ndarray]:
    """Decode an MPEG-1 video elementary stream (the documented
    subset: I/P pictures, intra DC+AC blocks, forward full-pel MC,
    skipped macroblocks). Returns the luma planes, one uint8 (h, w)
    array per picture, in coding order."""
    br = _BitReader(content)
    code = _next_start_code(br)
    if code != 0xB3:
        raise ValueError("not an MPEG-1 video stream (no sequence header)")
    w = br.read(12)
    h = br.read(12)
    br.read(4)   # aspect
    br.read(4)   # rate
    br.read(18)  # bit rate
    if not br.read_bit():
        raise ValueError("sequence header marker bit missing")
    br.read(10)  # vbv
    br.read(1)   # constrained
    if br.read_bit():
        br.read(8 * 64)  # custom intra matrix: skip (unused by subset)
    if br.read_bit():
        br.read(8 * 64)
    if w % 16 or h % 16:
        raise ValueError("subset requires 16-aligned dimensions")
    mb_w = w // 16

    frames: list[np.ndarray] = []
    prev: np.ndarray | None = None  # the reference frame for MC
    cur: np.ndarray | None = None
    cur_ptype = 0
    while True:
        code = _next_start_code(br)
        if code == 0xB7:  # sequence end
            break
        if code == 0xB8:  # GOP: skip payload
            br.read(27)
            continue
        if code == 0x00:  # picture header
            if cur is not None:
                prev = cur  # the finished picture becomes the reference
            br.read(10)  # temporal reference
            cur_ptype = br.read(3)
            br.read(16)  # vbv_delay
            if cur_ptype == 1:
                pass
            elif cur_ptype == 2:
                full_pel = br.read_bit()
                f_code = br.read(3)
                if f_code != 1 or not full_pel:
                    raise ValueError(
                        "subset supports full-pel f_code=1 vectors only"
                    )
            else:
                raise ValueError(f"picture type {cur_ptype} unsupported (B/D)")
            while br.read_bit():
                br.read(8)  # extra_information_picture
            cur = np.zeros((h, w), dtype=np.uint8)
            if cur_ptype == 2:
                if prev is None:
                    raise ValueError("P-picture before any I-picture")
                cur[:, :] = prev  # skipped-MB default: copy co-located
            frames.append(cur)
            continue
        if not (0x01 <= code <= 0xAF):
            raise ValueError(f"unexpected start code {code:#x}")
        # ---- slice ----
        if cur is None:
            raise ValueError("slice before picture header")
        qscale = br.read(5)
        while br.read_bit():
            br.read(8)  # extra_information_slice
        mb_addr = -1
        y_pred = 128
        while True:
            inc = _read_vlc(br, _B1_ADDR_INC, "macroblock_address_increment")
            mb_addr += inc
            if inc > 1:
                y_pred = 128  # skipped MBs reset the DC chain
            if mb_addr >= mb_w:
                raise ValueError("macroblock address past slice width")
            ttable = _B2B_P_TYPE if cur_ptype == 2 else _B2A_I_TYPE
            quant, mf, pattern, intra = _read_vlc(br, ttable, "macroblock_type")
            if pattern:
                raise ValueError(
                    "coded-residual (cbp) macroblocks unsupported by subset"
                )
            if quant:
                qscale = br.read(5)
            x0 = mb_addr * 16
            if intra:
                vals = []
                for blk in range(6):
                    if blk < 4:
                        coef, y_pred = _read_block(br, luma=True, pred=y_pred)
                        deq = _dequant_intra(coef, qscale)
                        px = np.clip(
                            np.rint(_idct_block(deq)), 0, 255
                        ).astype(np.uint8)
                        vals.append(px)
                    else:
                        # chroma blocks: parsed for bit accounting,
                        # dropped (luma-only output)
                        _read_block(br, luma=False, pred=128)
                cur[0:8, x0 : x0 + 8] = vals[0]
                cur[0:8, x0 + 8 : x0 + 16] = vals[1]
                cur[8:16, x0 : x0 + 8] = vals[2]
                cur[8:16, x0 + 8 : x0 + 16] = vals[3]
            elif mf:
                # §2.4.4.2 motion reconstruction: at forward_f_code=1
                # the motion_code IS the reconstructed value, and
                # full_pel_forward_vector=1 (the only mode this subset
                # accepts) DOUBLES it — found by the r14 hand-built
                # conformance vectors; the paired encoder shared the
                # missing <<1, so self-roundtrip never saw it.
                mvx = 2 * _read_vlc(br, _B4_MOTION, "motion_code")
                mvy = 2 * _read_vlc(br, _B4_MOTION, "motion_code")
                y_pred = 128  # non-intra MB resets the DC chain
                sy, sx = mvy, x0 + mvx
                if not (
                    0 <= sy
                    and sy + 16 <= cur.shape[0]
                    and 0 <= sx
                    and sx + 16 <= cur.shape[1]
                ):
                    raise ValueError("motion vector references out of frame")
                cur[0:16, x0 : x0 + 16] = prev[sy : sy + 16, sx : sx + 16]
            else:
                raise ValueError("macroblock with neither intra nor MC")
            if mb_addr == mb_w - 1:
                break
    if not frames:
        raise ValueError("stream contains no pictures")
    return frames


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def attach_mpeg1_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table with a REAL MPEG-1 elementary stream
    per row. Synthesis runs executor-side in Arrow batches; bytes
    never shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "video/mpeg",
                    "content": [synth_mpeg1_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )
