"""Codec CONFORMANCE vectors (round 14, r13 verdict item 7).

Both in-repo decoders (baseline JPEG, MPEG-1 video subset) were
previously verified only by self-roundtrip — a mis-derived Huffman
table that is self-consistent roundtrips green. These tests break the
encoder/decoder circularity: every bitstream below is HAND-ASSEMBLED
bit-by-bit from the published specifications (ITU T.81 for JPEG —
Annex K tables, F.1.2/F.2.2 coding rules; ISO/IEC 11172-2 for MPEG-1 —
Annex B VLC tables, §2.4.3-2.4.4 semantics), and every expected pixel
value is derived ANALYTICALLY from the specs' reconstruction formulas
transcribed locally — never from the module's encoder or its helper
tables. A decoder bug that the paired encoder shares can therefore no
longer hide.

Bit-string layout notes kept inline next to each fixture so the
derivation is checkable against the spec text.
"""

from __future__ import annotations

import numpy as np
import pytest

from vector_database_in_rust_spark.operators import multimodal as mm
from vector_database_in_rust_spark.operators import mpeg1 as mp

# ---------------------------------------------------------------------------
# Spec literals, transcribed here independently of the modules
# ---------------------------------------------------------------------------

# T.81 Figure A.6 zigzag order: flat (row-major) coefficient index per
# zigzag position; entry k at flat index ZZ[k] -> (v, u) = divmod(., 8)
# with u the HORIZONTAL frequency.
_T81_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Table K.3 (luminance DC): BITS[1..16] then HUFFVAL.
_K3_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K3_DC_VALS = list(range(12))
# T.81 Table K.5 (luminance AC): BITS[1..16] then HUFFVAL (162 symbols).
_K5_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K5_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def test_module_tables_match_t81_annex_k():
    """The encoder's baked-in tables must BE the Annex K literals —
    transcribed here from the spec, not imported from the module."""
    assert list(mm._DC_BITS[1:]) == _K3_DC_BITS
    assert list(mm._DC_VALS) == _K3_DC_VALS
    assert list(mm._AC_BITS[1:]) == _K5_AC_BITS
    assert list(mm._AC_VALS) == _K5_AC_VALS
    assert list(mm._ZIGZAG) == _T81_ZIGZAG


def _t81_idct_block(coef: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 IDCT, transcribed literally: s(y,x) = (1/4) sum_u
    sum_v C(u) C(v) S(v,u) cos((2x+1)u*pi/16) cos((2y+1)v*pi/16)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def _jpeg_golden(blocks_zz: list[dict]) -> np.ndarray:
    """Expected pixels for a row of 8x8 blocks given {zigzag k: value}
    DEQUANTIZED coefficients (all-ones quant table in these fixtures):
    T.81 IDCT + level shift + clamp."""
    out = []
    for zzmap in blocks_zz:
        coef = np.zeros((8, 8))
        for k, val in zzmap.items():
            flat = _T81_ZIGZAG[k]
            coef[flat // 8, flat % 8] = val
        px = _t81_idct_block(coef) + 128.0
        out.append(np.clip(np.rint(px), 0, 255).astype(np.uint8))
    return np.hstack(out)


def _pack_scan(bits: str) -> bytes:
    """T.81 entropy-segment byte packing, transcribed from the spec:
    MSB-first, final partial byte PADDED WITH 1-BITS (F.1.2.3), each
    0xFF byte followed by a stuffed 0x00 (F.1.2.3)."""
    if len(bits) % 8:
        bits = bits + "1" * (8 - len(bits) % 8)
    raw = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out = bytearray()
    for b in raw:
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def _jpeg_fixture(width: int, scan_bits: str) -> bytes:
    """Hand-assembled baseline JPEG: 8-px-tall grayscale, all-ones
    quantization table, Annex K luminance Huffman tables, one scan."""

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id0, all ones
    out += seg(  # SOF0: 8-bit, h=8, w=width, 1 component, 1x1 sampling
        0xC0,
        bytes([8]) + (8).to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00] + _K3_DC_BITS) + bytes(_K3_DC_VALS))
    out += seg(0xC4, bytes([0x10] + _K5_AC_BITS) + bytes(_K5_AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += _pack_scan(scan_bits)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Hand-derived Annex K canonical codes used below (canonical rule:
# codes assigned in BITS order, incrementing, left-shifted per length —
# T.81 C.2). DC (K.3): cat0='00' cat1='010' ... cat7='11110'
# cat11='111111110'. AC (K.5): EOB(0x00)='1010', 0x01='00', 0x02='01',
# 0x03='100', 0x22='11111001' (3rd symbol of length 8: len7 ends at
# '1111011', so len8 starts '11111000'=0x07, then 0x22, 0x71).


def test_jpeg_dc_only_block_decodes_to_flat_136():
    """One 8x8 block, DC coefficient 64 (quant 1), no AC: T.81's IDCT
    gives a flat 64/8 = 8 above mid-gray -> every pixel 136. Scan bits:
    DC cat 7 '11110' + amplitude '1000000' (64) + EOB '1010'."""
    content = _jpeg_fixture(8, "11110" + "1000000" + "1010")
    img = mm.decode_jpeg(content)
    assert img.shape == (8, 8)
    assert (img == 136).all()


def test_jpeg_two_blocks_dc_prediction_and_ac():
    """Two blocks exercising DC prediction, positive and negative AC
    amplitudes, and an AC zero-run — against the analytically-computed
    T.81 reconstruction.

    Block 1: DC diff +64 (cat 7: '11110'+'1000000'); AC at zigzag 1 =
    +4 (symbol 0x03 run0/size3 = '100', amplitude '100'); EOB.
    Block 2: DC diff -64 (cat 7, F.1.2.1 negative amplitude = diff - 1
    + 2^7 = 63 -> '0111111', so DC back to 0); two zero coefficients
    then -2 at zigzag 3 (symbol 0x22 run2/size2 = '11111001',
    amplitude -2 -> '01'); EOB."""
    bits = (
        "11110" + "1000000" + "100" + "100" + "1010"
        + "11110" + "0111111" + "11111001" + "01" + "1010"
    )
    content = _jpeg_fixture(16, bits)
    img = mm.decode_jpeg(content)
    golden = _jpeg_golden([{0: 64, 1: 4}, {0: 0, 3: -2}])
    assert img.shape == golden.shape == (8, 16)
    assert (img == golden).all()


def test_jpeg_byte_stuffing_and_clamp():
    """A DC large enough to clamp, laid out so the first scan byte is
    0xFF — the fixture pins F.1.2.3 byte stuffing (the raw scan MUST
    carry FF 00) and the sample clamp: DC cat 11 ('111111110') with
    amplitude 1024 ('10000000000') reconstructs 1024/8 + 128 = 256 ->
    clamped to 255."""
    bits = "111111110" + "10000000000" + "1010"
    scan = _pack_scan(bits)
    assert scan[0] == 0xFF and scan[1] == 0x00  # stuffing really present
    img = mm.decode_jpeg(_jpeg_fixture(8, bits))
    assert (img == 255).all()


def test_jpeg_rejects_truncated_scan():
    """A scan that ends mid-block must raise, not return garbage."""
    content = _jpeg_fixture(16, "11110" + "1000000" + "1010")  # 1 of 2 blocks
    with pytest.raises((ValueError, IndexError)):
        mm.decode_jpeg(content)


# ---------------------------------------------------------------------------
# MPEG-1 (ISO/IEC 11172-2)
# ---------------------------------------------------------------------------

# Default intra quantization matrix, §2.4.4.2 — transcribed literal.
_ISO_INTRA_Q = np.array(
    [
        [8, 16, 19, 22, 26, 27, 29, 34],
        [16, 16, 22, 24, 27, 29, 34, 37],
        [19, 22, 26, 27, 29, 34, 34, 38],
        [22, 22, 26, 27, 29, 34, 37, 40],
        [22, 26, 27, 29, 32, 35, 40, 48],
        [26, 27, 29, 32, 35, 40, 48, 58],
        [26, 27, 29, 34, 38, 46, 56, 69],
        [27, 29, 35, 38, 46, 56, 69, 83],
    ],
    dtype=np.int64,
)


def test_mpeg1_default_intra_matrix_matches_spec():
    assert (mp._DEFAULT_INTRA_Q == _ISO_INTRA_Q).all()


class _Asm:
    """Bit-string assembler for hand-built MPEG streams: plain MSB
    packing, zero-padded byte alignment before start codes (11172-2
    §2.3 next_start_code())."""

    def __init__(self):
        self.bits = ""

    def put(self, bits: str):
        self.bits += bits

    def uint(self, value: int, n: int):
        self.bits += format(value, f"0{n}b")

    def start_code(self, code: int):
        if len(self.bits) % 8:
            self.bits += "0" * (8 - len(self.bits) % 8)
        self.uint(0x000001, 24)
        self.uint(code, 8)

    def bytes(self) -> bytes:
        bits = self.bits
        if len(bits) % 8:
            bits += "0" * (8 - len(bits) % 8)
        return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def _seq_header(a: _Asm, w: int, h: int):
    """§2.4.2.3: width(12) height(12) aspect(4) picture_rate(4)
    bit_rate(18) marker(1) vbv(10) constrained(1) load_intra(1)=0
    load_non_intra(1)=0."""
    a.start_code(0xB3)
    a.uint(w, 12)
    a.uint(h, 12)
    a.uint(1, 4)   # aspect: square
    a.uint(1, 4)   # picture rate code
    a.uint(0x3FFFF, 18)  # variable bit rate
    a.put("1")     # marker bit
    a.uint(0, 10)  # vbv buffer
    a.put("0")     # constrained flag
    a.put("0")     # no custom intra matrix
    a.put("0")     # no custom non-intra matrix


def _picture_header(a: _Asm, ptype: int):
    """§2.4.3.4: temporal_reference(10) picture_coding_type(3)
    vbv_delay(16) [+ full_pel(1) f_code(3) for P] extra_bit=0."""
    a.start_code(0x00)
    a.uint(0, 10)
    a.uint(ptype, 3)
    a.uint(0xFFFF, 16)
    if ptype == 2:
        a.put("1")      # full_pel_forward_vector
        a.uint(1, 3)    # forward_f_code = 1
    a.put("0")          # no extra information


def _dc_size_code_luma(size: int) -> str:
    # Table B.5a, transcribed: 0:'100' 1:'00' 2:'01' 3:'101' 4:'110'
    # 5:'1110' 6:'11110' 7:'111110' 8:'1111110'
    return ["100", "00", "01", "101", "110", "1110", "11110",
            "111110", "1111110"][size]


def _dc_bits(diff: int) -> str:
    """§2.4.3.7 DC amplitude: positive plain binary; negative offset by
    2^size - 1."""
    size = abs(diff).bit_length()
    code = _dc_size_code_luma(size)
    if size == 0:
        return code
    amp = diff if diff >= 0 else diff + (1 << size) - 1
    return code + format(amp, f"0{size}b")


def _intra_mb_bits(y_dcs: list[int], prev_dc: int) -> tuple[str, int]:
    """macroblock_address_increment '1', I-type '1' (B.2a, no quant),
    then 6 blocks: 4 luma DC-only (predictive chain), 2 chroma with DC
    diff 0 (B.5b size-0 code '00'), each closed by EOB '10' (B.5c)."""
    bits = "1" + "1"
    for dc in y_dcs:
        bits += _dc_bits(dc - prev_dc) + "10"
        prev_dc = dc
    bits += ("00" + "10") * 2  # two chroma blocks, diff 0, EOB
    return bits, prev_dc


def test_mpeg1_intra_dc_conformance():
    """One 16x16 I-picture, four DC-only luma blocks at luma 200
    (predictor starts at 128, §2.4.3.7): hand-built bitstream, pixels
    predicted by the spec's intra reconstruction (DC x 8 dequant,
    IDCT of a DC-only block = DC x 8 / 8 = DC)."""
    a = _Asm()
    _seq_header(a, 16, 16)
    _picture_header(a, 1)
    a.start_code(0x01)       # slice 1
    a.uint(8, 5)             # quantizer_scale
    a.put("0")               # no extra slice info
    bits, _ = _intra_mb_bits([200, 200, 200, 200], 128)
    a.put(bits)
    a.start_code(0xB7)       # sequence end
    frames = mp.decode_mpeg1(a.bytes())
    assert len(frames) == 1
    assert frames[0].shape == (16, 16)
    assert (frames[0] == 200).all()


def test_mpeg1_intra_ac_conformance():
    """An AC coefficient through the B.5c run-level VLC ('011' = run 1,
    level 1, sign bit 1 -> -1 at zigzag index 2) against the spec's
    dequantization arithmetic transcribed locally: AC dequant =
    (2 x level x qscale x Q[v][u]) // 16, oddified toward zero when
    even (§2.4.4.2 mismatch control); DC dequant = 8 x DC exactly."""
    a = _Asm()
    _seq_header(a, 16, 16)
    _picture_header(a, 1)
    a.start_code(0x01)
    a.uint(8, 5)
    a.put("0")
    # MB: addr inc '1', type I '1'; luma block 0: DC 200 + AC(-1 @ zz2)
    a.put("1" + "1")
    a.put(_dc_bits(200 - 128) + "011" + "1" + "10")  # DC, AC, EOB
    for _ in range(3):  # remaining luma blocks: DC-only at 200
        a.put(_dc_bits(0) + "10")
    a.put(("00" + "10") * 2)  # chroma
    a.start_code(0xB7)
    frames = mp.decode_mpeg1(a.bytes())

    # golden: block 0 per the spec arithmetic
    coef = np.zeros((8, 8), dtype=np.int64)
    flat = _T81_ZIGZAG[2]  # 11172-2 uses the same zigzag as T.81
    deq_ac = (2 * -1 * 8 * _ISO_INTRA_Q[flat // 8, flat % 8]) // 16
    if deq_ac != 0 and deq_ac % 2 == 0:
        deq_ac -= np.sign(deq_ac)
    coef[flat // 8, flat % 8] = deq_ac
    coef[0, 0] = 8 * 200
    golden0 = np.clip(np.rint(_t81_idct_block(coef.astype(float))), 0, 255)
    assert (frames[0][0:8, 0:8] == golden0.astype(np.uint8)).all()
    assert (frames[0][0:8, 8:16] == 200).all()  # DC chain carried on


def test_mpeg1_p_picture_mc_and_skip_conformance():
    """I-picture with a luma gradient per macroblock, then a P-picture:
    MB0 intra (recoded flat 90), MB1 forward MC with full-pel vector
    (-16, 0) (B.4 motion_code: magnitude 4... here -16 expressed as
    code for -16/1? full_pel doubles? §2.4.4.3 full_pel shifts by the
    vector value itself at f_code=1), MB2 SKIPPED (address increment
    '011' jumps it — §2.4.4.4: co-located copy), MB3 intra flat 60."""
    a = _Asm()
    _seq_header(a, 64, 16)
    _picture_header(a, 1)
    a.start_code(0x01)
    a.uint(8, 5)
    a.put("0")
    prev_dc = 128
    for level in (40, 80, 120, 160):  # four flat intra MBs
        bits, prev_dc = _intra_mb_bits([level] * 4, prev_dc)
        a.put(bits)
    _picture_header(a, 2)  # P-picture
    a.start_code(0x01)
    a.uint(8, 5)
    a.put("0")
    # MB0: intra flat 90 (P-picture intra type is B.2b '00011')
    a.put("1" + "00011")
    p = 128
    for _ in range(4):
        a.put(_dc_bits(90 - p) + "10")
        p = 90
    a.put(("00" + "10") * 2)
    # MB1: pred-mc (B.2b '001'), motion vectors read as two B.4 codes.
    # full_pel=1, f_code=1: reconstructed vector = 2 x motion_code
    # (§2.4.4.3: full-pel vectors are doubled). motion_code -8 =
    # '0000010111'? — B.4 to |8|: magnitude 8 base '000001011',
    # negative sign suffix '1'. vector = 2 x (-8) = -16 (one MB left).
    a.put("1" + "001")
    a.put("0000010111")  # horizontal motion_code -8
    a.put("1")           # vertical motion_code 0
    # MB2 skipped: next increment '011' (=2) jumps one macroblock.
    # MB3: intra flat 60.
    a.put("011" + "00011")
    p = 128
    for _ in range(4):
        a.put(_dc_bits(60 - p) + "10")
        p = 60
    a.put(("00" + "10") * 2)
    a.start_code(0xB7)
    frames = mp.decode_mpeg1(a.bytes())
    assert len(frames) == 2
    i_frame, p_frame = frames
    for mb, level in enumerate((40, 80, 120, 160)):
        assert (i_frame[:, mb * 16 : mb * 16 + 16] == level).all()
    assert (p_frame[:, 0:16] == 90).all()       # intra recode
    assert (p_frame[:, 16:32] == 40).all()      # MC from one MB left
    assert (p_frame[:, 32:48] == 120).all()     # skipped: co-located
    assert (p_frame[:, 48:64] == 60).all()      # intra
