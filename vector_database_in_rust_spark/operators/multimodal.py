"""Multimodal column operators (north-star extension).

Treats image/audio/video as opaque ``BINARY`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas``.

Two decode paths coexist:

- **Real decoders, zero dependencies** (bottom of this module): netpbm
  PGM images via a hand parser (``decode_pgm``), RIFF/WAV audio via
  the stdlib ``wave`` module (``decode_wav``), COMPRESSED PNG via a
  hand chunk/CRC/defilter parser over stdlib zlib (``decode_png``),
  and COMPRESSED baseline JPEG via a hand marker/Huffman/IDCT decoder
  (``decode_jpeg``), with real synthesized files and
  analytically-verified oracles — actual byte-level media decoding,
  hash-checked by the driver.
- **Stub path for the remaining format** (``decode_media`` below):
  MP4/video needs pyav, which this container does not ship; the stub
  is a clearly-marked deterministic fake that keeps the plumbing
  (schema, batching, partitioning) testable, with the real-library slot
  raising ``NotImplementedError`` until the libraries exist.

Scale notes:
- media bytes never leave the executor except through Arrow batches;
- feature extraction is embarrassingly parallel — repartition by id
  range so each task holds a bounded byte volume
  (``spark.sql.files.maxPartitionBytes`` governs the binaryFile source);
- downstream joins use only (id, features, meta), never the raw bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, media_type STRING, content BINARY, "
    "meta STRUCT<source: STRING, n_bytes: BIGINT>"
)

FEATURE_DIM = 16

# Set True only in environments with real decoders installed.
REAL_DECODERS_AVAILABLE = False


def attach_binary_payload(docs: DataFrame, *, media_type: str = "image") -> DataFrame:
    """Fixture adapter: lift the documents table into a media table with
    an opaque binary payload (UTF-8 bytes of the text stand in for image
    bytes — same schema/plumbing as a real ``binaryFile`` load)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def sha_feature_vector(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector derived from payload bytes:
    sha256 digest -> little-endian uint32 words (repeated to ``dim``)
    -> (word % 1000) / 1000 as float32.

    Chosen so the exact same derivation is expressible in ANSI SQL
    (sha256 hex -> byte-swapped hex substrings -> integer cast), which
    makes every stub-decode/stub-encode operator fully DuckDB-oracle-able
    — see ``harness._sha_feature_oracle``.
    """
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(
        (digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32
    )
    return (raw % 1000).astype(np.float32) / 1000.0


def decode_media(content: bytes, media_type: str) -> np.ndarray:
    """STUB decode: returns a deterministic FEATURE_DIM-vector derived
    from the payload bytes (sha256-seeded), so the full pipeline is
    testable end-to-end without media libraries.

    Real implementation slot: frame sampling for video (pyav) —
    NotImplementedError until the libraries exist in the runtime. For
    PGM/WAV/PNG/baseline-JPEG this module already ships real
    zero-dependency decoders (see ``decode_pgm``/``decode_wav``/
    ``decode_png``/``decode_jpeg`` below).
    """
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError(
            "real decoders are not installed in this container; "
            "plug PIL/librosa decoding in here"
        )
    return sha_feature_vector(content, FEATURE_DIM)


def extract_features(media: DataFrame) -> DataFrame:
    """media -> (media_id, media_type, n_bytes, features ARRAY<FLOAT>).

    Arrow-batched mapInPandas: one Python roundtrip per batch of rows,
    numpy inside — the correct shape for per-item media work at scale
    (never a row-at-a-time Python UDF).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(c, t)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        batches,
        schema=(
            "media_id BIGINT, media_type STRING, n_bytes BIGINT, "
            "features ARRAY<FLOAT>"
        ),
    )


def feature_digests(features: DataFrame) -> DataFrame:
    """Project a ``features ARRAY<FLOAT>`` column to portable scalars:
    dimension, quantized L2 norm and md5 of the quantized values.

    Array columns do not hash portably across engines (the driver's
    row canonicalizer cannot sort them, and float formatting differs),
    so oracle-checked queries pin array outputs through this projection.
    Quantization: the stub features are k/1000 by construction, so
    ``round(x * 1000)`` recovers the exact integer k on both sides.
    """
    q = F.transform(
        F.col("features"), lambda x: F.round(x * 1000).cast("int")
    )
    sq = F.aggregate(
        q,
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + (v * v).cast("bigint"),
    )
    return features.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.size("features").cast("long").alias("feature_dim"),
        F.round(F.sqrt(sq.cast("double")) / 1000.0, 4).alias("feature_norm"),
        F.md5(F.array_join(q.cast("array<string>"), ",")).alias("feature_md5"),
    )


RESIZE_SCHEMA = (
    "media_id BIGINT, media_type STRING, out_w INT, out_h INT, content BINARY"
)


def resize_media(media: DataFrame, *, width: int = 8, height: int = 8) -> DataFrame:
    """STUB image resize: produces exactly ``width*height`` output bytes
    per item (a fake grayscale bitmap, sha256-stretched from the
    payload) so the BINARY-in/BINARY-out plumbing — Arrow batches,
    schema, per-task byte volume — is the real path. Real slot:
    ``PIL.Image.open(...).resize(...)`` when decoders are installed
    (``REAL_DECODERS_AVAILABLE``).

    The stub derivation ((sha256 digest repeated)[:w*h]) is hex-string
    arithmetic both engines can express, so the harness entry is fully
    oracle-checkable.
    """
    n_out = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if REAL_DECODERS_AVAILABLE:  # pragma: no cover
                raise NotImplementedError("plug PIL resize in here")
            out = []
            for c in pdf["content"]:
                digest = hashlib.sha256(c).digest()
                out.append((digest * (n_out // len(digest) + 1))[:n_out])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "out_w": np.full(len(pdf), width, dtype=np.int32),
                    "out_h": np.full(len(pdf), height, dtype=np.int32),
                    "content": out,
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_BYTES = 64


def frame_sample(media: DataFrame, *, every_n: int = 4) -> DataFrame:
    """STUB video frame sampling: treat the payload as a stream of
    ``FRAME_BYTES``-byte frames and emit every ``every_n``-th FULL frame
    (trailing partial frames are dropped). One input row explodes into
    a variable number of output rows inside the same Arrow batch — the
    shape a real keyframe extractor (pyav/ffmpeg) produces. Scale: the
    fan-out happens executor-side; only sampled frames (bounded by
    ``len/FRAME_BYTES/every_n`` per item) leave the task.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if REAL_DECODERS_AVAILABLE:  # pragma: no cover
                raise NotImplementedError("plug pyav keyframe extraction in here")
            ids, idxs, frames = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                n_frames = len(c) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(c[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(
        batches, schema="media_id BIGINT, frame_idx INT, frame BINARY"
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata pass over the binary column (no decode):
    per media_id byte length + payload md5. Oracle-able — byte semantics
    match DuckDB's octet_length/md5 over the same text payloads."""
    return media.select(
        "media_id",
        "media_type",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# REAL decoders (round 4): the container ships no media libraries, but
# two open formats need none — netpbm PGM (P5) images parse with a
# 20-line header reader + numpy, and RIFF/WAV audio decodes with the
# stdlib ``wave`` module. Payloads are SYNTHESIZED as real files from a
# deterministic integer formula, so the DuckDB oracle can verify every
# decoded statistic ANALYTICALLY from the formula — the decode path is
# real (magic numbers, header parsing, PCM frames), and its correctness
# is hash-checked, not assumed. The pyav slot for video (MP4) remains
# behind REAL_DECODERS_AVAILABLE above; PNG and baseline JPEG are real
# hand decoders below.
# ---------------------------------------------------------------------------

IMG_W, IMG_H = 32, 32
WAV_RATE, WAV_N = 8000, 2000


def synth_pgm_bytes(seed: int, w: int = IMG_W, h: int = IMG_H) -> bytes:
    """A real binary PGM (P5) file: pixel(x, y) = (3x + y^2 + seed) % 256.

    The formula is deliberately seed-dependent (per-image stats differ)
    and transpose-asymmetric (a reshaped/transposed decode changes the
    answer), so the analytic oracle catches real parser bugs."""
    header = f"P5\n{w} {h}\n255\n".encode()
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    px = ((3 * xs + ys * ys + int(seed)) % 256).astype(np.uint8)
    return header + px.tobytes()


def decode_pgm(content: bytes) -> np.ndarray:
    """REAL netpbm P5 parser: magic check, whitespace/comment-tolerant
    header scan, raw-section reshape. Raises on anything malformed."""
    if not content.startswith(b"P5"):
        raise ValueError("not a binary PGM (P5) payload")
    # header = magic, width, height, maxval — tokens separated by
    # whitespace, '#' comments run to end of line
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(int(content[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raw pixels
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    if len(content) - i < w * h:
        raise ValueError(
            f"truncated PGM: want {w * h} pixel bytes, have {len(content) - i}"
        )
    px = np.frombuffer(content, dtype=np.uint8, count=w * h, offset=i)
    return px.reshape(h, w)


def synth_wav_bytes(seed: int, n: int = WAV_N, rate: int = WAV_RATE) -> bytes:
    """A real RIFF/WAVE file (PCM 16-bit mono) written with the stdlib
    ``wave`` module: sample(i) = ((i * k) % 2048) - 1024, k = seed%127+1
    — integer-exact, so every decoded statistic is SQL-reproducible."""
    import io
    import wave

    k = int(seed) % 127 + 1
    samples = ((np.arange(n, dtype=np.int64) * k) % 2048 - 1024).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """REAL RIFF/WAVE decode via the stdlib ``wave`` module: chunk
    parsing, format validation, PCM frame extraction."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only PCM16 mono supported by this decoder")
        rate = wf.getframerate()
        samples = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    return rate, samples.astype(np.int64)


MULAW_N, MULAW_RATE = 1024, 8000


def mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law expansion, vectorized and integer-exact:
    complement the codeword, split sign/exponent/mantissa, rebuild the
    13-bit magnitude ``((mant<<3 | 0x84) << exp) - 0x84``. Spot values
    pin the table: 0xFF -> 0, 0x7F -> -0, 0x00 -> -32124, 0x80 ->
    +32124 (the classic G.711 extremes)."""
    u = (~codes.astype(np.int64)) & 0xFF
    sign = u >= 0x80
    u7 = u & 0x7F
    exp = u7 >> 4
    mant = u7 & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag)


def synth_wav_mulaw_bytes(seed: int, n: int = MULAW_N, rate: int = MULAW_RATE) -> bytes:
    """A real RIFF/WAVE file with format tag 7 (WAVE_FORMAT_MULAW,
    8-bit companded mono) — hand-assembled because the stdlib ``wave``
    module writes PCM only. Codeword(i) = (13*i + 7*seed + 5) % 256,
    so the expanded linear samples are SQL-reproducible through the
    closed-form G.711 formula."""
    codes = ((13 * np.arange(n, dtype=np.int64) + 7 * int(seed) + 5) % 256).astype(
        np.uint8
    )
    data = codes.tobytes()
    fmt = (
        (7).to_bytes(2, "little")  # WAVE_FORMAT_MULAW
        + (1).to_bytes(2, "little")  # mono
        + rate.to_bytes(4, "little")
        + rate.to_bytes(4, "little")  # byte rate (1 byte/sample)
        + (1).to_bytes(2, "little")  # block align
        + (8).to_bytes(2, "little")  # bits per sample
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_wav_mulaw(content: bytes) -> tuple[int, np.ndarray]:
    """REAL G.711 mu-law WAV decode with a hand-rolled RIFF chunk walk
    (the stdlib ``wave`` module refuses non-PCM): validate the RIFF/
    WAVE header, iterate chunks honoring pad bytes, require format
    tag 7 / mono / 8-bit, then expand every codeword to 16-bit linear
    via :func:`mulaw_expand`."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        sz = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + sz]
        if len(body) != sz:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            ch = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag != 7:
                raise ValueError(f"format tag {tag} is not WAVE_FORMAT_MULAW")
            if ch != 1 or bits != 8:
                raise ValueError("only 8-bit mono mu-law supported")
            rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    codes = np.frombuffer(data, dtype=np.uint8)
    return rate, mulaw_expand(codes)


def attach_mulaw_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table with a REAL mu-law WAV per row.
    Synthesis runs executor-side in Arrow batches; bytes never
    shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "audio/basic",
                    "content": [
                        synth_wav_mulaw_bytes(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )


# ---------------------------------------------------------------------------
# IMA ADPCM (round 5, second half): REAL adaptive lossy audio — the
# third audio codec (PCM exact, mu-law companded, ADPCM
# differential-adaptive). Standard IMA/DVI tables; WAV format tag 0x11.
# Lossy-by-design, so the driver query is a VERDICT table (the sketch
# pattern): exact rate / sample count / exact first sample (the block
# header carries it verbatim) plus tracking-error bounds a broken
# quantizer or step adaptation blows past by orders of magnitude.
# ---------------------------------------------------------------------------

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]

ADPCM_N = 1023  # one block: 4-byte header + 511 nibble bytes


def _ima_decode_nibble(code: int, pred: int, index: int) -> tuple[int, int]:
    step = _IMA_STEPS[index]
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[code & 7]))
    return pred, index


def ima_adpcm_encode(samples: np.ndarray) -> bytes:
    """One-block IMA ADPCM encode: header (predictor = first sample,
    index 0) + 4-bit codes, low nibble first. The encoder runs the
    SAME adaptive loop as the decoder (closed-loop DPCM), so encoder
    state never drifts from what a correct decoder reconstructs."""
    s = samples.astype(np.int64)
    pred, index = int(s[0]), 0
    out = bytearray()
    out += int(pred).to_bytes(2, "little", signed=True)
    out.append(index)
    out.append(0)
    codes = []
    for x in s[1:]:
        step = _IMA_STEPS[index]
        diff = int(x) - pred
        code = 8 if diff < 0 else 0
        diff = abs(diff)
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        pred, index = _ima_decode_nibble(code, pred, index)
        codes.append(code)
    if len(codes) % 2:
        codes.append(0)
    for lo, hi in zip(codes[0::2], codes[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out)


def ima_adpcm_decode(block: bytes, n_samples: int) -> np.ndarray:
    """REAL IMA ADPCM block decode: header predictor/index, then the
    standard quantized-difference reconstruction with step-size
    adaptation and clamping."""
    if len(block) < 4:
        raise ValueError("ADPCM block shorter than its header")
    pred = int.from_bytes(block[0:2], "little", signed=True)
    index = block[2]
    if index > 88:
        raise ValueError(f"ADPCM step index {index} out of range")
    out = [pred]
    for byte in block[4:]:
        for code in (byte & 0x0F, byte >> 4):
            pred, index = _ima_decode_nibble(code, pred, index)
            out.append(pred)
            if len(out) == n_samples:
                return np.array(out, dtype=np.int64)
    if len(out) < n_samples:
        raise ValueError("ADPCM block exhausted before n_samples")
    return np.array(out, dtype=np.int64)


def _adpcm_source(seed: int, n: int) -> np.ndarray:
    """The analytic test signal: a TRIANGLE wave with per-sample slope
    +-k, k = seed % 127 + 1 — continuous (unlike the PCM lane's
    sawtooth, whose 2047-point wrap no differential codec can track),
    so a correct ADPCM loop follows it within a small, boundable
    error while remaining fully id-reproducible."""
    k = int(seed) % 127 + 1
    return 1024 - np.abs(((np.arange(n, dtype=np.int64) * k) % 4096) - 2048)


def synth_wav_adpcm_bytes(seed: int, n: int = ADPCM_N, rate: int = WAV_RATE) -> bytes:
    """A real RIFF/WAVE file with format tag 0x11 (IMA ADPCM), one
    block, mono, over the analytic triangle source
    (:func:`_adpcm_source`)."""
    samples = _adpcm_source(seed, n)
    data = ima_adpcm_encode(samples)
    block_align = len(data)
    fmt = (
        (0x11).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align // n).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")  # bits per (coded) sample
        + (2).to_bytes(2, "little")  # cbSize
        + n.to_bytes(2, "little")    # wSamplesPerBlock
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_wav_adpcm(content: bytes) -> tuple[int, int, np.ndarray]:
    """REAL IMA-ADPCM WAV decode: RIFF chunk walk, format-tag 0x11
    validation, wSamplesPerBlock from the fmt extension, block decode.
    Returns (rate, samples_per_block, samples)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, spb, data = 12, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        sz = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + sz]
        if len(body) != sz:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            if tag != 0x11:
                raise ValueError(f"format tag {tag} is not IMA ADPCM")
            if int.from_bytes(body[2:4], "little") != 1:
                raise ValueError("only mono ADPCM supported")
            rate = int.from_bytes(body[4:8], "little")
            spb = int.from_bytes(body[18:20], "little")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if rate is None or data is None or spb is None:
        raise ValueError("missing fmt or data chunk")
    return rate, spb, ima_adpcm_decode(data, spb)


def attach_adpcm_payload(docs: DataFrame) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "audio/adpcm",
                    "content": [
                        synth_wav_adpcm_bytes(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )


def adpcm_decode_verdict(media: DataFrame) -> DataFrame:
    """Verdict table for the lossy codec (the sketch-lane pattern):
    decode, regenerate the analytic source from the id, and emit what
    the oracle can predict — exact rate and count, the exact first
    sample (carried verbatim in the block header), and tracking-error
    bounds (max |err| <= 512, rms err <= 128) that hold with wide
    margin for a correct quantize/adapt loop on this signal family
    but explode by orders of magnitude under a wrong step table, a
    mis-signed nibble, or broken index adaptation."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rates, ns, fs, mx, rm = [], [], [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                rate, n, s = decode_wav_adpcm(bytes(c))
                src = _adpcm_source(int(mid), n)
                err = s - src
                ids.append(mid)
                rates.append(rate)
                ns.append(n)
                fs.append(bool(s[0] == src[0]))
                mx.append(bool(np.abs(err).max() <= 512))
                rm.append(bool(float(np.sqrt((err * err).mean())) <= 128.0))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "first_sample_exact": pd.Series(fs, dtype="bool"),
                    "max_err_ok": pd.Series(mx, dtype="bool"),
                    "rms_err_ok": pd.Series(rm, dtype="bool"),
                }
            )

    return media.mapInPandas(
        batches,
        schema=(
            "media_id BIGINT, sample_rate INT, n_samples BIGINT, "
            "first_sample_exact BOOLEAN, max_err_ok BOOLEAN, "
            "rms_err_ok BOOLEAN"
        ),
    )


def attach_pgm_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table whose content is a REAL PGM file per row
    (seeded by doc_id). Synthesis runs executor-side in Arrow batches;
    bytes never shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image/x-portable-graymap",
                    "content": [synth_pgm_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )


def attach_wav_payload(docs: DataFrame) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "content": [synth_wav_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )


def image_decode_stats(media: DataFrame, *, decoder=None) -> DataFrame:
    """REAL decode -> per-image statistics: (width, height, mean and
    std of the pixel values, corner pixel). Integer-exact sums inside
    the task; only 5 scalars per image leave the executor.

    ``decoder`` is any bytes -> 2-D uint8 array parser (default
    :func:`decode_pgm`; pass :func:`decode_png` for PNG payloads)."""
    decoder = decoder or decode_pgm

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, means, stds, corners = [], [], [], [], []
            for c in pdf["content"]:
                px = decoder(bytes(c)).astype(np.int64)
                h, w = px.shape
                n = h * w
                s, s2 = int(px.sum()), int((px * px).sum())
                mean = s / n
                var = s2 / n - mean * mean
                ws.append(w)
                hs.append(h)
                means.append(round(mean, 6))
                stds.append(round(float(np.sqrt(max(var, 0.0))), 6))
                corners.append(int(px[0, 0]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_px": means,
                    "std_px": stds,
                    "corner_px": pd.Series(corners, dtype="int32"),
                }
            )

    return media.mapInPandas(
        batches,
        schema=(
            "media_id BIGINT, width INT, height INT, "
            "mean_px DOUBLE, std_px DOUBLE, corner_px INT"
        ),
    )


def audio_decode_stats(media: DataFrame, *, decoder=None) -> DataFrame:
    """REAL WAV decode -> (sample_rate, n_samples, rms, n_sign_flips):
    rms from integer-exact sum of squares; a sign flip counts adjacent
    samples with strictly opposite signs (zero is neither).

    ``decoder`` is any bytes -> (rate, int64 samples) parser (default
    :func:`decode_wav`; pass :func:`decode_wav_mulaw` for G.711
    mu-law payloads)."""
    decoder = decoder or decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, ns, rms, flips = [], [], [], []
            for c in pdf["content"]:
                rate, s = decoder(bytes(c))
                rates.append(rate)
                ns.append(len(s))
                rms.append(round(float(np.sqrt((s * s).sum() / len(s))), 6))
                flips.append(int(((s[:-1] * s[1:]) < 0).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "rms": rms,
                    "n_sign_flips": pd.Series(flips, dtype="int64"),
                }
            )

    return media.mapInPandas(
        batches,
        schema=(
            "media_id BIGINT, sample_rate INT, n_samples BIGINT, "
            "rms DOUBLE, n_sign_flips BIGINT"
        ),
    )


# ---------------------------------------------------------------------------
# REAL PNG codec (round 5): closes the "compressed format decode" stub
# honestly with ZERO new dependencies — DEFLATE via stdlib ``zlib``,
# chunk CRCs via ``zlib.crc32``, and a full scanline defilter
# (None/Sub/Up/Average/Paeth, RFC 2083 §6). The synthesizer cycles the
# filter type per row (row % 5), so every reconstruction path is
# exercised in every image and a broken Paeth predictor or a
# CRC-skipping parser flips the driver's analytic hash. JPEG/MP4 (lossy
# / container formats genuinely needing PIL/pyav) remain the documented
# stubs behind REAL_DECODERS_AVAILABLE.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6), vectorized: pick whichever of
    left/up/up-left is closest to a + b - c, ties resolved a, b, c."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def synth_png_bytes(seed: int, w: int = IMG_W, h: int = IMG_H) -> bytes:
    """A REAL 8-bit grayscale PNG: pixel(x, y) = (7x + y^2 + 2*seed) % 256
    (a different formula from the PGM lane, so the two oracles cannot
    mask each other), scanlines filtered with type = y % 5 — all five
    PNG filters appear in every image — DEFLATE-compressed IDAT, CRC'd
    chunks."""
    import struct
    import zlib

    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    px = ((7 * xs + ys * ys + 2 * int(seed)) % 256).astype(np.int64)

    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        line = px[y]
        left = np.concatenate(([0], line[:-1]))
        up_left = np.concatenate(([0], prev[:-1]))
        ftype = y % 5
        if ftype == 0:
            filt = line
        elif ftype == 1:
            filt = line - left
        elif ftype == 2:
            filt = line - prev
        elif ftype == 3:
            filt = line - (left + prev) // 2
        else:
            filt = line - _paeth(left, prev, up_left)
        raw.append(ftype)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray:
    """REAL PNG decode, zero dependencies: signature check, chunk walk
    with CRC-32 verification, IHDR validation (8-bit grayscale,
    non-interlaced), multi-IDAT concatenation, zlib inflate, and full
    scanline defiltering (None/Sub/Up/Average/Paeth reconstruction).
    Raises ValueError on anything malformed — bad magic, CRC mismatch,
    truncated inflate output, unsupported color mode."""
    import struct
    import zlib

    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
        raise ValueError(
            "only 8-bit grayscale non-interlaced PNG supported, got "
            f"depth={depth} color={color} interlace={interlace}"
        )
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError(
            f"inflated scanline data is {len(raw)} bytes, want {h * (w + 1)}"
        )
    out = np.zeros((h, w), dtype=np.int64)
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        row = raw[y * (w + 1) : (y + 1) * (w + 1)]
        ftype = row[0]
        filt_b = np.frombuffer(row, dtype=np.uint8, count=w, offset=1).astype(
            np.int64
        )
        if ftype == 0:
            recon = filt_b
        elif ftype == 2:
            recon = (filt_b + prev) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters reconstruct sequentially
            recon = np.zeros(w, dtype=np.int64)
            for x in range(w):
                a = recon[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    pred = int(_paeth(np.int64(a), np.int64(b), np.int64(c)))
                recon[x] = (filt_b[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    return out.astype(np.uint8)


def attach_png_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table whose content is a REAL PNG file per row
    (seeded by doc_id) — same executor-side Arrow synthesis shape as
    :func:`attach_pgm_payload`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "content": [synth_png_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )


def image_resize_real(
    media: DataFrame, *, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """REAL image resize: decode the PGM, area-average (block mean-pool)
    to ``out_w x out_h``, one row per output pixel with its exact
    rational mean rounded to 6 digits. The pool shape (the standard
    INTER_AREA downscale) keeps the arithmetic integer-exact and
    SQL-reproducible."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, bys, bxs, vals = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                px = decode_pgm(bytes(c)).astype(np.int64)
                h, w = px.shape
                bh, bw = h // out_h, w // out_w
                pooled = px[: out_h * bh, : out_w * bw].reshape(
                    out_h, bh, out_w, bw
                )
                means = pooled.sum(axis=(1, 3)) / (bh * bw)
                for by in range(out_h):
                    for bx in range(out_w):
                        ids.append(mid)
                        bys.append(by)
                        bxs.append(bx)
                        vals.append(round(float(means[by, bx]), 6))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "out_y": pd.Series(bys, dtype="int32"),
                    "out_x": pd.Series(bxs, dtype="int32"),
                    "px_mean": vals,
                }
            )

    return media.mapInPandas(
        batches,
        schema="media_id BIGINT, out_y INT, out_x INT, px_mean DOUBLE",
    )


# ---------------------------------------------------------------------------
# REAL JPEG (baseline DCT, grayscale) — round 5. Zero dependencies:
# the encoder below exists to SYNTHESIZE valid JFIF files (and to
# exercise the decoder's Huffman/RLE paths in property tests); the
# decoder is a genuine baseline-JPEG parser — marker walk, DQT/DHT/
# SOF0/SOS parsing, canonical Huffman table construction from the
# file's own BITS/HUFFVAL, byte-unstuffed bit reading, DC-diff +
# AC run-length coefficient decode (EOB/ZRL included), dequantize,
# de-zigzag, separable float IDCT, level shift. The driver oracle
# feeds it block-constant images quantized losslessly (all-ones
# tables), so every decoded pixel is analytically predictable while
# the full real decode path runs; lossy behavior on general images is
# covered by coefficient-exact roundtrip property tests.
#
# The reference repo has no media path at all (SURVEY.md §2.3 —
# north-star surface); the public JPEG spec (ITU T.81) defines the
# format, including the Annex K example Huffman tables used here.
# ---------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K (ITU T.81) example luminance tables — the de-facto standard.
_DC_BITS = (0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)  # [1..16]
_DC_VALS = tuple(range(12))
_AC_BITS = (0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_VALS = (
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
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: A[u, x] = C(u)/2 * cos((2x+1)uπ/16).
    2-D DCT of a block b is A @ b @ A.T; IDCT is A.T @ F @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_DCT8 = _dct_matrix()


def _canonical_codes(bits, vals):
    """BITS/HUFFVAL → {symbol: (code, length)} per T.81 C.2 (canonical
    Huffman: codes of each length assigned in HUFFVAL order)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (0xFF → 0xFF00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            # pad with 1-bits per the spec
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, cat: int) -> int:
    """T.81 F.1.2.1: negative values encode as v - 1 + 2^cat (i.e. the
    one's complement of |v| in cat bits)."""
    return v if v >= 0 else v - 1 + (1 << cat)


def encode_jpeg_gray(img: np.ndarray, *, quant: np.ndarray | None = None) -> bytes:
    """A REAL baseline JFIF encoder for 8-bit grayscale: level shift,
    per-block orthonormal DCT, quantization, zigzag, DC-difference +
    AC run-length (EOB/ZRL) Huffman coding with byte stuffing. Exists
    to synthesize valid files and to adversarially exercise
    :func:`decode_jpeg`; with an all-ones quantization table and
    block-constant input the codec is exactly lossless, which is what
    the analytic driver oracle relies on."""
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires 8-aligned dimensions")
    q = np.ones((8, 8), dtype=np.int64) if quant is None else quant.astype(np.int64)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(q.flat[zi]) for zi in _ZIGZAG))
    out += seg(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    prev_dc = 0
    shifted = img.astype(np.float64) - 128.0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = np.rint((_DCT8 @ block @ _DCT8.T) / q).astype(np.int64)
            zz = coef.flatten()[_ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            cat = _category(diff)
            if cat > 11:
                raise ValueError(f"DC difference {diff} exceeds category 11")
            code, ln = dc_codes[cat]
            bw.put(code, ln)
            bw.put(_amplitude_bits(diff, cat), cat)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                cat = _category(v)
                if cat > 10:
                    raise ValueError(f"AC coefficient {v} exceeds category 10")
                code, ln = ac_codes[(run << 4) | cat]
                bw.put(code, ln)
                bw.put(_amplitude_bits(v, cat), cat)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.put(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; raises on unexpected markers or exhaustion."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bits(self, n: int) -> int:
        while self._n < n:
            self._fill()
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        return v

    def bit(self) -> int:
        return self.bits(1)


def _huff_decoder(bits, vals):
    """BITS/HUFFVAL → {(length, code): symbol} for bit-serial decode."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: map cat received bits to the signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """REAL baseline JPEG decode (8-bit grayscale, one non-subsampled
    component, no restart markers): marker walk with segment-length
    validation, DQT (8-bit, multi-table), DHT (canonical Huffman from
    the file's BITS/HUFFVAL), SOF0, SOS; then byte-unstuffed bit-serial
    entropy decode of DC differences and AC (run, size) pairs with
    EOB/ZRL, dequantize, de-zigzag, separable orthonormal IDCT, +128
    level shift, round, clamp, block assembly. Raises on malformed
    input — progressive (SOF2), multi-component, subsampled, or
    restart-interval streams are explicitly rejected, not misparsed."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q = None
    dc_id = ac_id = None
    while True:
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI with no scan
            raise ValueError("EOI before scan data")
        ln = int.from_bytes(content[pos : pos + 2], "big")
        seg = content[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = zz
                qtables[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = (0,) + tuple(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = tuple(seg[i + 17 : i + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            if seg[5] != 1:
                raise ValueError("only single-component (grayscale) supported")
            if seg[7] != 0x11:
                raise ValueError("subsampling unsupported")
            comp_q = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(f"non-baseline SOF 0xFF{marker:02X} unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if seg[0] != 1:
                raise ValueError("single-component scan required")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0x0F
            if tuple(seg[3:6]) != (0, 63, 0):
                raise ValueError("non-baseline spectral selection")
            pos += ln
            break
        pos += ln
    if h is None or comp_q not in qtables:
        raise ValueError("missing SOF0 or quantization table")
    dc_tab = htables.get((0, dc_id))
    ac_tab = htables.get((1, ac_id))
    if dc_tab is None or ac_tab is None:
        raise ValueError("missing Huffman tables for scan")
    q = qtables[comp_q]
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    img = np.zeros((bh * 8, bw_ * 8), dtype=np.uint8)
    br = _BitReader(content, pos)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw_):
            zz = np.zeros(64, dtype=np.int64)
            cat = _read_symbol(br, dc_tab)
            prev_dc += _extend(br.bits(cat), cat)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _read_symbol(br, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(br.bits(size), size)
                k += 1
            coef = np.zeros(64, dtype=np.int64)
            coef[_ZIGZAG] = zz
            block = coef.reshape(8, 8) * q
            px = _DCT8.T @ block.astype(np.float64) @ _DCT8 + 128.0
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(px), 0, 255
            ).astype(np.uint8)
    return img[:h, :w]


def synth_jpeg_bytes(seed: int, w: int = IMG_W, h: int = IMG_H) -> bytes:
    """A real baseline JFIF file whose 8x8 blocks are CONSTANT:
    block(bx, by) = (17*bx + 29*by^2 + 5*seed + 13) % 256. Flat blocks
    with all-ones quantization make the codec exactly lossless (the
    only nonzero coefficient is the integer DC; IDCT reproduces the
    constant to <1e-12 before rounding), so the analytic oracle
    predicts every decoded pixel while the full real decode path —
    Huffman DC categories up to 11, byte unstuffing, dequantize,
    IDCT — still executes. The formula is block-grained (the JPEG
    block grid is load-bearing) and distinct from the PGM/PNG lanes."""
    bxs = np.arange(w // 8, dtype=np.int64)[None, :]
    bys = np.arange(h // 8, dtype=np.int64)[:, None]
    blocks = (17 * bxs + 29 * bys * bys + 5 * int(seed) + 13) % 256
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint8)
    return encode_jpeg_gray(img)


def attach_jpeg_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table with a REAL baseline JPEG per row
    (seeded block formula). Synthesis runs executor-side in Arrow
    batches; bytes never shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image/jpeg",
                    "content": [synth_jpeg_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )


# ---------------------------------------------------------------------------
# REAL MP4 / ISO BMFF container (round 5): box-structured parse + frame
# extraction. Zero dependencies. The CONTAINER layer is the real thing —
# nested box walk, stsd/stts/stsz/stsc/stco sample tables driving frame
# boundaries exactly as a demuxer does; the video ESSENCE inside the
# samples is either uncompressed grayscale (a 'raw ' sample entry) or —
# since round 5's second half — REAL Motion-JPEG ('mjpg'): every sample
# is a complete baseline JFIF file decoded by this module's own
# zero-dependency JPEG parser, with per-frame-varying sample sizes
# driving the variable stsz/chunk-offset arithmetic. Inter-frame
# codecs (H.264/H.265 transform + motion compensation) remain out of
# scope for a zero-dependency container (that slot stays behind
# REAL_DECODERS_AVAILABLE). Frame sampling over these paths is real
# demuxing + real essence decode, not the sha stub.
# ---------------------------------------------------------------------------

VID_W, VID_H, VID_FRAMES = 16, 16, 6


def _box(btype: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + btype + payload


def synth_mp4_bytes(
    seed: int,
    n_frames: int = VID_FRAMES,
    w: int = VID_W,
    h: int = VID_H,
    codec: str = "raw ",
) -> bytes:
    """A real ISO BMFF file: ftyp + mdat of grayscale frames +
    moov/trak/mdia/minf/stbl with genuine sample tables. Samples are
    split across TWO chunks (stsc with two entries, two stco offsets)
    so the chunk-mapping logic is exercised, not just the trivial
    one-chunk layout.

    ``codec="raw "``: uncompressed samples, frame f's pixel(x, y) =
    (11x + 5y + 19f + 7*seed) % 256 — frame-dependent so a demuxer
    that mis-slices frame boundaries changes the answer.

    ``codec="mjpg"``: Motion-JPEG essence — every sample is a REAL
    baseline JFIF file produced by :func:`encode_jpeg_gray` over
    block-constant pixels block(bx, by) = (13bx + 31by + 23f + 7*seed
    + 11) % 256 (all-ones quantization keeps the codec exactly
    lossless, so the analytic oracle still predicts every decoded
    pixel). Sample sizes VARY per frame, exercising the
    variable-size stsz path and cumulative chunk-offset arithmetic
    that constant-size raw frames cannot."""
    frames = []
    if codec == "raw ":
        xs = np.arange(w, dtype=np.int64)[None, :]
        ys = np.arange(h, dtype=np.int64)[:, None]
        for f in range(n_frames):
            px = ((11 * xs + 5 * ys + 19 * f + 7 * int(seed)) % 256).astype(np.uint8)
            frames.append(px.tobytes())
    elif codec == "mjpg":
        bxs = np.arange(w // 8, dtype=np.int64)[None, :]
        bys = np.arange(h // 8, dtype=np.int64)[:, None]
        for f in range(n_frames):
            blocks = (13 * bxs + 31 * bys + 23 * f + 7 * int(seed) + 11) % 256
            img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint8)
            frames.append(encode_jpeg_gray(img))
    else:
        raise ValueError(f"unknown synth codec {codec!r}")
    sizes = [len(fb) for fb in frames]
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(frames)
    # chunk 1 = first half of the samples, chunk 2 = the rest
    c1_n = max(1, n_frames // 2)
    mdat = _box(b"mdat", mdat_payload)
    mdat_off = len(ftyp) + 8  # absolute offset of first sample
    c2_off = mdat_off + sum(sizes[:c1_n])

    stsd_entry = (
        (86).to_bytes(4, "big") + codec.encode("ascii") + bytes(6)
        + (1).to_bytes(2, "big")
        + bytes(16)
        + w.to_bytes(2, "big") + h.to_bytes(2, "big")
        + (0x480000).to_bytes(4, "big") * 2 + bytes(4)
        + (1).to_bytes(2, "big") + bytes(32)
        + (8).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
    )
    stsd = _box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + stsd_entry)
    stts = _box(
        b"stts",
        bytes(4) + (1).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big") + (1).to_bytes(4, "big"),
    )
    stsz = _box(
        b"stsz",
        bytes(4) + bytes(4) + n_frames.to_bytes(4, "big")
        + b"".join(sz.to_bytes(4, "big") for sz in sizes),
    )
    stsc = _box(
        b"stsc",
        bytes(4) + (2).to_bytes(4, "big")
        + (1).to_bytes(4, "big") + c1_n.to_bytes(4, "big") + (1).to_bytes(4, "big")
        + (2).to_bytes(4, "big") + (n_frames - c1_n).to_bytes(4, "big")
        + (1).to_bytes(4, "big"),
    )
    stco = _box(
        b"stco",
        bytes(4) + (2).to_bytes(4, "big")
        + mdat_off.to_bytes(4, "big") + c2_off.to_bytes(4, "big"),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _box(
        b"dref", bytes(4) + (1).to_bytes(4, "big")
        + _box(b"url ", b"\x00\x00\x00\x01")
    )
    dinf = _box(b"dinf", dref)
    vmhd = _box(b"vmhd", b"\x00\x00\x00\x01" + bytes(8))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(12) + b"VideoHandler\x00")
    mdhd = _box(
        b"mdhd",
        bytes(4) + bytes(8) + (1).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big") + (0x55C4).to_bytes(2, "big") + bytes(2),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + bytes(8) + (1).to_bytes(4, "big") + bytes(4)
        + n_frames.to_bytes(4, "big") + bytes(52)
        + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(
        b"mvhd",
        bytes(4) + bytes(8) + (1).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big") + bytes(80),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in a range;
    validates sizes (including 64-bit largesize boxes)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, *path: bytes):
    for btype, ps, pe in _walk_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find_box(data, ps, pe, *path[1:])
    raise ValueError(f"missing box {path[0]!r}")


def parse_mp4_frames(content: bytes) -> list[np.ndarray]:
    """REAL ISO BMFF demux: box walk, sample-table interpretation
    (stsd for dimensions, stsz for sample sizes, stsc for the
    sample→chunk mapping with arbitrary entries, stco for chunk
    offsets), then frame extraction by ABSOLUTE file offset — the same
    logic any MP4 demuxer runs. Supports the uncompressed grayscale
    'raw ' sample entry this repo synthesizes; compressed codecs raise
    (that is the documented essence-decoder stub)."""
    if len(content) < 12:
        raise ValueError("not an MP4: too short")
    top = list(_walk_boxes(content, 0, len(content)))
    types = [t for t, _, _ in top]
    if b"ftyp" not in types or b"moov" not in types:
        raise ValueError("not an MP4: missing ftyp/moov")
    moov_s, moov_e = next((s, e) for t, s, e in top if t == b"moov")
    stbl_s, stbl_e = _find_box(
        content, moov_s, moov_e, b"trak", b"mdia", b"minf", b"stbl"
    )
    boxes = {t: (s, e) for t, s, e in _walk_boxes(content, stbl_s, stbl_e)}
    for req in (b"stsd", b"stsz", b"stsc", b"stco"):
        if req not in boxes:
            raise ValueError(f"missing sample table {req!r}")
    # stsd: first sample entry → format + dimensions
    s, e = boxes[b"stsd"]
    n_entries = int.from_bytes(content[s + 4 : s + 8], "big")
    if n_entries < 1:
        raise ValueError("empty stsd")
    entry_fmt = content[s + 12 : s + 16]
    if entry_fmt not in (b"raw ", b"mjpg"):
        raise ValueError(
            f"video essence {entry_fmt!r} unsupported: 'raw ' and 'mjpg' "
            "(Motion-JPEG via the baseline decoder) decode for real; "
            "inter-frame codecs (H.264-class) are the documented stub"
        )
    w = int.from_bytes(content[s + 40 : s + 42], "big")
    h = int.from_bytes(content[s + 42 : s + 44], "big")
    # stsz: per-sample sizes
    s, e = boxes[b"stsz"]
    fixed = int.from_bytes(content[s + 4 : s + 8], "big")
    n_samples = int.from_bytes(content[s + 8 : s + 12], "big")
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = [
            int.from_bytes(content[s + 12 + 4 * i : s + 16 + 4 * i], "big")
            for i in range(n_samples)
        ]
    # stco: chunk offsets
    s, e = boxes[b"stco"]
    n_chunks = int.from_bytes(content[s + 4 : s + 8], "big")
    offsets = [
        int.from_bytes(content[s + 8 + 4 * i : s + 12 + 4 * i], "big")
        for i in range(n_chunks)
    ]
    # stsc: (first_chunk, samples_per_chunk) runs → per-chunk counts
    s, e = boxes[b"stsc"]
    n_runs = int.from_bytes(content[s + 4 : s + 8], "big")
    runs = [
        (
            int.from_bytes(content[s + 8 + 12 * i : s + 12 + 12 * i], "big"),
            int.from_bytes(content[s + 12 + 12 * i : s + 16 + 12 * i], "big"),
        )
        for i in range(n_runs)
    ]
    per_chunk = []
    for ri, (first, spc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        per_chunk += [spc] * (last - first + 1)
    if len(per_chunk) != n_chunks or sum(per_chunk) != n_samples:
        raise ValueError("inconsistent stsc/stco/stsz sample mapping")
    frames = []
    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(per_chunk[ci]):
            sz = sizes[si]
            if pos + sz > len(content):
                raise ValueError(f"sample {si} runs past end of file")
            if entry_fmt == b"raw ":
                if sz != w * h:
                    raise ValueError(f"sample {si} size {sz} != {w}x{h}")
                frame = np.frombuffer(
                    content, dtype=np.uint8, count=sz, offset=pos
                ).reshape(h, w)
            else:  # mjpg: each sample is a complete baseline JFIF file
                frame = decode_jpeg(content[pos : pos + sz])
                if frame.shape != (h, w):
                    raise ValueError(
                        f"sample {si} decodes to {frame.shape}, stsd says {h}x{w}"
                    )
            frames.append(frame)
            pos += sz
            si += 1
    return frames


def attach_mp4_payload(docs: DataFrame, *, codec: str = "raw ") -> DataFrame:
    """documents -> media table with a REAL ISO BMFF file per row
    (seeded frame formula; ``codec="mjpg"`` packs Motion-JPEG essence).
    Synthesis runs executor-side in Arrow batches; bytes never
    shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "video/mp4",
                    "content": [
                        synth_mp4_bytes(int(d), codec=codec)
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )


def video_frame_stats(
    media: DataFrame, *, every_n: int = 2, parser=None
) -> DataFrame:
    """REAL frame sampling: demux the container, keep every n-th frame,
    emit per-frame statistics — the video twin of image_decode_stats.
    Only (id, frame_idx, 4 scalars) leave the executor; the frame
    bytes never shuffle.

    ``parser`` is any bytes -> list-of-2D-uint8-arrays decoder (default
    :func:`parse_mp4_frames`; pass ``mpeg1.decode_mpeg1`` for MPEG-1
    elementary streams)."""
    parser = parser or parse_mp4_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, means, corners = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                frames = parser(bytes(c))
                for fi in range(0, len(frames), every_n):
                    px = frames[fi].astype(np.int64)
                    ids.append(mid)
                    idxs.append(fi)
                    means.append(round(int(px.sum()) / px.size, 6))
                    corners.append(int(px[0, 0]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "mean_px": means,
                    "corner_px": pd.Series(corners, dtype="int32"),
                }
            )

    return media.mapInPandas(
        batches,
        schema="media_id BIGINT, frame_idx INT, mean_px DOUBLE, corner_px INT",
    )


def attach_png_payload_corrupt(docs: DataFrame) -> DataFrame:
    """Like :func:`attach_png_payload` but with DETERMINISTIC planted
    corruption — the realistic ingest mix a 100 TB media crawl always
    contains: doc_id % 7 == 3 gets one flipped byte mid-file (an
    in-chunk bit error the CRC check must catch), doc_id % 7 == 5 is
    truncated to its first 40 bytes (a partial download). Everything
    else is a valid file."""

    def corrupt(seed: int) -> bytes:
        raw = synth_png_bytes(seed)
        if seed % 7 == 3:
            b = bytearray(raw)
            b[len(b) // 2] ^= 0xFF
            return bytes(b)
        if seed % 7 == 5:
            return raw[:40]
        return raw

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "content": [corrupt(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="media_id BIGINT, media_type STRING, content BINARY"
    )


def image_decode_quarantine(media: DataFrame, *, decoder=None) -> DataFrame:
    """Corrupt-tolerant decode — the PERMISSIVE lane for media (the
    json_quarantine discipline applied to binary decoders): every row
    decodes under try/except; good rows carry exact stats, bad rows
    survive with ``ok = false`` and NULL stats instead of killing the
    job. At 100 TB a single corrupt file MUST NOT fail a task — Spark
    retries the whole partition, and a poison file would retry
    forever; quarantining turns it into data.

    Emits (media_id, ok, width, height, mean_px).

    Scale: identical Arrow-batched mapInPandas shape as
    :func:`image_decode_stats`; the except path costs only the failed
    parse. Downstream: good lane proceeds, quarantine lane
    (``ok = false``) lands in a dead-letter table for re-fetch."""
    decoder = decoder or decode_pgm

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, oks, ws, hs, means = [], [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                mids.append(int(mid))
                try:
                    px = decoder(bytes(c)).astype(np.int64)
                    h, w = px.shape
                    n = h * w
                    oks.append(True)
                    ws.append(w)
                    hs.append(h)
                    means.append(round(int(px.sum()) / n, 6))
                except Exception:
                    oks.append(False)
                    ws.append(None)
                    hs.append(None)
                    means.append(None)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "ok": oks,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "mean_px": pd.array(means, dtype="Float64"),
                }
            )

    return media.mapInPandas(
        batches,
        schema="media_id BIGINT, ok BOOLEAN, width INT, height INT, mean_px DOUBLE",
    )
