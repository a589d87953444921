"""Skew mitigation utilities.

AQE's skew-join handling (enabled in the session defaults) covers
sort-merge joins; this module provides explicit SALTING for the cases
AQE cannot rewrite — e.g. a shuffled hash join against a hot key where
one reducer would receive a large fraction of all rows.

``salted_join`` replicates the small side ``salt_factor`` times and
scatters the big side uniformly across the replicas, so a key holding
X rows lands on ``salt_factor`` reducers at X/salt_factor each. Join
semantics are unchanged (verified by equality tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_salt(columns: list[str], salt_factor: int):
    """Salt column in [0, salt_factor): ``pmod(xxhash64(<columns>), f)``.

    A pure function of row content — a task retry re-derives the same
    salt for the same row, so partial stage recompute cannot drop or
    duplicate rows (unlike ``monotonically_increasing_id`` / unseeded
    ``rand`` salts, which are nondeterministic across retries).
    """
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in columns]), F.lit(salt_factor)
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side's
    hot keys spread over ``salt_factor`` reducers.

    The salt is ``pmod(xxhash64(<all big-side columns>), salt_factor)``
    — a pure function of row CONTENT, so a task retry re-derives the
    same salt for the same row. (A salt from
    ``monotonically_increasing_id`` or an unseeded ``rand`` is
    nondeterministic across task retries: a shuffle-map retry can
    re-salt rows and drop/duplicate them under partial stage recompute —
    the classic nondeterministic-repartition hazard.) Identical
    duplicate rows share a salt bucket; that only matters if one key is
    hot *because* of exact duplicate rows, in which case dedup first.
    The small side is exploded ``salt_factor``-fold — acceptable because
    the small side is small by contract (else broadcast it instead and
    skip salting entirely).
    """
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    salted_big = big.withColumn("_salt", content_salt(big.columns, salt_factor))
    replicas = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<int>")),
    )
    return salted_big.join(replicas, on=[on, "_salt"], how=how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    *,
    salt_factor: int = 8,
    salt_source_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys: partial
    aggregate on (key, salt), then final aggregate on key — a hot key
    whose rows would all land on one reducer instead spreads across
    ``salt_factor`` reducers, and only ``keys x salt_factor`` partial
    rows reach the second (tiny) exchange.

    NB: Spark's hash aggregate already does map-side partial
    aggregation, which usually defuses key skew for algebraic
    aggregates — salting matters when partial aggregation is
    ineffective: high-cardinality DISTINCT-style state per key, or
    collect_list/percentile-shaped aggregates whose partial state is
    as big as the data. The mechanics here demonstrate the pattern
    with re-aggregable (sum/count/min/max) functions, where the
    two-phase rewrite is exact.

    ``aggs`` maps column -> one of sum/count/min/max. The salt is
    content-derived (``content_salt``) — retry-deterministic, like
    ``salted_join``.
    """
    _FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for c, fn in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(
                f"unsupported agg {fn!r} for {c!r} (use sum/count/min/max)"
            )
    salt_cols = salt_source_cols or list(aggs)
    salted = df.withColumn(
        "_salt", content_salt(salt_cols, salt_factor)
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[
            _PARTIAL[fn](F.col(c)).alias(f"_p_{c}_{fn}")
            for c, fn in aggs.items()
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            _FINAL[fn](F.col(f"_p_{c}_{fn}")).alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
