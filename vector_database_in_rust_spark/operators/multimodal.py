"""Multimodal column operators (north-star extension).

Treats image/audio/video as opaque ``BINARY`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas``.

Two decode paths coexist:

- **Real decoders, zero dependencies** (bottom of this module): netpbm
  PGM images via a hand parser (``decode_pgm``), RIFF/WAV audio via
  the stdlib ``wave`` module (``decode_wav``), and COMPRESSED PNG via
  a hand chunk/CRC/defilter parser over stdlib zlib (``decode_png``),
  with real synthesized files and analytically-verified oracles —
  actual byte-level media decoding, hash-checked by the driver.
- **Stub path for remaining compressed formats** (``decode_media``
  below): JPEG/MP4 need PIL/pyav, which this container does not ship; the stub
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

    Real implementation slot: PIL.Image.open for images, librosa.load
    for audio, frame sampling for video — NotImplementedError until the
    libraries exist in the runtime.
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
# is hash-checked, not assumed. PIL/pyav slots for compressed formats
# (JPEG/MP4) remain behind REAL_DECODERS_AVAILABLE above.
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


def audio_decode_stats(media: DataFrame) -> DataFrame:
    """REAL WAV decode -> (sample_rate, n_samples, rms, n_sign_flips):
    rms from integer-exact sum of squares; a sign flip counts adjacent
    samples with strictly opposite signs (zero is neither)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, ns, rms, flips = [], [], [], []
            for c in pdf["content"]:
                rate, s = decode_wav(bytes(c))
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
