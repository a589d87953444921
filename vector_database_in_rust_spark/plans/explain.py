"""Physical-plan audit helpers.

``audit(df)`` extracts the scale-relevant facts from a formatted plan:
scans (with pushed filters), exchanges (shuffles vs broadcasts), join
strategies, top-k operators, and pre-shuffle group-limit optimization.
Used by tests/test_plans.py to pin the *shape* of each operator's plan —
a correctness-style guard for performance properties (a regression that
un-broadcasts a join, drops a pushed filter, or loses the two-phase
top-k fails the suite, not just the benchmark).

Notable: for ``row_number() OVER (PARTITION BY ... ORDER BY ...) <= k``
Spark 4 inserts ``WindowGroupLimit(..., Partial)`` BEFORE the exchange —
a map-side bounded top-k per group, so the ranking shuffle carries at
most partitions x groups x k rows. That optimizer rule is what makes the
declarative batch-kNN shape scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    formatted: str
    n_shuffle_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    has_take_ordered: bool = False
    has_partial_window_group_limit: bool = False
    n_hash_aggregates: int = 0
    broadcast_joins: list[str] = field(default_factory=list)
    sort_merge_joins: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def audit(df: DataFrame) -> PlanAudit:
    txt = formatted_plan(df)
    a = PlanAudit(formatted=txt)
    # formatted mode: operators appear as "(N) <Name>" with an Arguments
    # block; plain "Exchange" nodes are shuffles, BroadcastExchange is not.
    a.n_shuffle_exchanges = len(re.findall(r"\(\d+\) Exchange\b", txt))
    a.n_broadcast_exchanges = len(re.findall(r"\(\d+\) BroadcastExchange\b", txt))
    a.has_take_ordered = "TakeOrderedAndProject" in txt
    a.has_partial_window_group_limit = bool(
        re.search(r"WindowGroupLimit[\s\S]{0,400}?Partial", txt)
    )
    a.n_hash_aggregates = len(re.findall(r"\(\d+\) HashAggregate\b", txt))
    a.broadcast_joins = re.findall(r"Broadcast(?:Hash|NestedLoop)Join", txt)
    a.sort_merge_joins = re.findall(r"SortMergeJoin", txt)
    a.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", txt)
    return a
