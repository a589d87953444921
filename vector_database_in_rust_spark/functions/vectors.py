"""Vector distance/similarity expressions — the engine's scalar-function
library, replacing the reference's two distance functions.

Reference parity:
- ``l2_squared`` == ``l2_squared_distance`` (``src/lib.rs:28-30``), the only
  metric used by both the exact and ANN search paths.
- ``cosine_similarity`` == ``cosine_similarity`` (``src/lib.rs:32-47``),
  including the explicit zero-norm -> 0.0 guard (``src/lib.rs:43-45``).

All of these are native higher-order-function column expressions
(``zip_with`` + ``aggregate``): they run JVM-side inside whole-stage
codegen, benefit from column pruning/pushdown around them, and never cross
the Python boundary. That is the Spark analogue of the reference's
"heavy math in compiled code behind FFI" (readme.md:18).

Arithmetic is performed in DOUBLE (the float32 inputs are upcast first) so
results are stable across partitioning choices to far more digits than the
4-6 decimals the correctness harness rounds to.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_D = "array<double>"


def query_vector_literal(vec: Sequence[float]) -> Column:
    """A query vector as a Catalyst array literal (broadcast to every task
    as part of the plan — zero data movement at query time)."""
    return F.array(*[F.lit(float(x)) for x in vec]).cast(_D)


def _fold_sum(arr: Column) -> Column:
    # Sequential left fold, like the reference's accumulation loop.
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def l2_squared(a: Column, b: Column) -> Column:
    """Squared Euclidean distance: sum((a_i - b_i)^2).

    Matches ``l2_squared_distance`` (src/lib.rs:28-30). No sqrt — the
    reference never takes one, and rank order is identical without it.
    """
    return _fold_sum(
        F.zip_with(a.cast(_D), b.cast(_D), lambda x, y: (x - y) * (x - y))
    )


def dot_product(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a.cast(_D), b.cast(_D), lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a.cast(_D), lambda x: x * x)))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (||a|| * ||b||), 0.0 when either norm is zero.

    The zero-norm guard mirrors src/lib.rs:43-45 exactly (the reference
    returns 0.0 rather than NaN for degenerate vectors).
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)


def sq8_scale(a: Column) -> Column:
    """Per-vector symmetric int8 scale: max(|v_i|) (the classic SQ8
    codec — Faiss ScalarQuantizer QT_8bit-style, symmetric around 0).
    Zero vectors get scale 0 and quantize to all-zero codes."""
    return F.array_max(F.transform(a.cast(_D), F.abs))


def sq8_codes(a: Column) -> Column:
    """int8 codes: floor(v_i * 127 / scale) — floor, not round, so the
    arithmetic is portable bit-for-bit to any engine with IEEE doubles
    (round() ties differ across engines; floor of identical doubles
    cannot). Every code lands in [-127, 127]; dequantization error is
    bounded by one step (scale/127), pinned in tests."""
    s = sq8_scale(a)
    return F.when(s == 0.0, F.transform(a, lambda _: F.lit(0))).otherwise(
        F.transform(a.cast(_D), lambda x: F.floor(x * F.lit(127.0) / s).cast("int"))
    )


def sq8_dequantize(codes: Column, scale: Column) -> Column:
    """Reconstruct: c_i * scale / 127 (+ half a step would re-center the
    floor bias; kept as the plain inverse so quantize->dequantize is the
    exact arithmetic adjoint of ``sq8_codes``)."""
    return F.transform(
        codes, lambda c: c.cast("double") * scale / F.lit(127.0)
    )


WORD_BITS = 32


def sign_pack_words(a: Column) -> Column:
    """Binary quantization: pack the SIGN of each dimension into 32-bit
    words — ``ARRAY<BIGINT>`` of ``ceil(dim/32)`` words, bit ``j`` of
    word ``w`` set iff ``v[w*32+j] > 0``. One bit per dimension is the
    strongest compression a float column admits (256x vs float64 math,
    32x vs the raw float32 store) and the modern vector-db fast path
    (binary quantization in Qdrant/Weaviate/Milvus; rank order under
    Hamming distance approximates angular order, Charikar 2002).

    32-bit words (not 64) keep every word value exact, positive, and
    engine-portable inside a BIGINT: no sign-bit ambiguity, and
    ``pow(2, j)`` stays integral in an IEEE double, so the SAME
    arithmetic is expressible in the DuckDB oracle. Pure Catalyst —
    codegen'd, no UDF.

    NaN is EXPLICITLY non-positive (bit 0) via an isnan guard — Spark
    and DuckDB disagree on ``NaN > 0`` (Spark orders NaN above all
    values; so do DuckDB's comparisons, but not identically through
    lambda rewrites), so without the guard a NaN dimension would
    silently diverge from the oracle's arithmetic. The oracle SQL
    carries the same ``NOT isnan(x)`` guard."""
    wb = F.lit(WORD_BITS)
    bits = F.zip_with(
        a.cast(_D),
        F.sequence(F.lit(0), F.size(a) - 1),
        lambda x, i: F.when(
            (~F.isnan(x)) & (x > 0),
            F.pow(F.lit(2.0), F.pmod(i, wb)).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    n_words = F.ceil(F.size(a) / WORD_BITS).cast("int")
    packed = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda w: F.aggregate(
            F.slice(bits, w * WORD_BITS + 1, WORD_BITS),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    # sequence(0, -1) DESCENDS in Spark (auto step -1), so an empty
    # input would otherwise yield two garbage words instead of [].
    return F.when(
        F.size(a) == 0, F.array().cast("array<bigint>")
    ).otherwise(packed)


def hamming_distance(a_words: Column, b_words: Column) -> Column:
    """Hamming distance between two sign-packed word arrays:
    popcount(xor) per word, summed — `bit_count` and `^` are JVM
    intrinsics, so a full-corpus Hamming scan is bandwidth-bound, not
    compute-bound."""
    return F.aggregate(
        F.zip_with(a_words, b_words, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sign_pack_literal(vec: Sequence[float]) -> Column:
    """Driver-side sign-pack of a query vector into the same word layout
    as :func:`sign_pack_words`, embedded as a plan literal. Python's
    ``nan > 0`` is already False, matching the isnan-guarded column
    form: NaN packs as bit 0 everywhere."""
    words = [0] * ((len(vec) + WORD_BITS - 1) // WORD_BITS)
    for i, x in enumerate(vec):
        if float(x) > 0:
            words[i // WORD_BITS] |= 1 << (i % WORD_BITS)
    return F.array(*[F.lit(w).cast("long") for w in words])
