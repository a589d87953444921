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

    The salt derives from a hash of the big side's full row (via
    ``monotonically_increasing_id``), so it is uniform and needs no RNG;
    the small side is exploded ``salt_factor``-fold — acceptable because
    the small side is small by contract (else broadcast it instead and
    skip salting entirely).
    """
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    salted_big = big.withColumn(
        "_salt",
        (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_factor))).cast(
            "int"
        ),
    )
    replicas = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<int>")),
    )
    return salted_big.join(replicas, on=[on, "_salt"], how=how).drop("_salt")
