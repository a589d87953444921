"""Approximate (sketch-backed) aggregates: HyperLogLog++ distinct
counts and quantile sketches.

At 100 TB, exact COUNT(DISTINCT) materializes the full key set through
a shuffle and exact percentiles need a global sort; both are
non-starters. Spark's `approx_count_distinct` (HLL++, Heule et al.
2013) and `percentile_approx` (a KLL/GK-family rank sketch) are
MERGEABLE partial aggregates: each task folds its partition into a
fixed-size sketch, only sketch bytes cross the exchange, and accuracy
is a knob (`rsd`, `accuracy`) — the standard trade at scale.

These are approximate by design, so the driver records a rows-only
check; tests/test_sketches.py holds the real bars (HLL relative error
within 3*rsd, quantile rank error within the sketch's guarantee)
against exact answers computed at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_event_stats(
    events: DataFrame,
    *,
    rsd: float = 0.05,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-event-type rollup of sketch aggregates: HLL++ distinct users
    and approximate value percentiles, alongside the exact row count
    (one pass, one shuffle of sketches + counters)."""
    pct = F.percentile_approx(
        "value", [float(p) for p in percentiles], accuracy
    )
    cols = [
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        pct.alias("_pct"),
    ]
    out = events.groupBy("event_type").agg(*cols)
    for i, p in enumerate(percentiles):
        out = out.withColumn(
            f"p{int(p * 100)}", F.round(F.col("_pct")[i], 4)
        )
    return out.drop("_pct")
