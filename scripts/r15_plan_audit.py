"""Round-15 plan-shape audit over EVERY registered query (guide §7.2):
construct each lane's DataFrame at $SPARK_GRAFT_SF_DIR (default sf0.01)
and scan its FORMATTED physical plan for anti-patterns and shape stats:

- CartesianProduct / BroadcastNestedLoopJoin nodes (accidental cross
  products — broadcast 1-row scalar folds are expected and whitelisted
  by checking the build side is a 1-row aggregate is NOT attempted here;
  hits are listed for manual adjudication);
- BatchEvalPython (row-at-a-time Python UDF — the package contract is
  Arrow-only Python boundaries, so any hit is a regression);
- counts of Exchange / BroadcastExchange / SortMergeJoin /
  ShuffledHashJoin / BroadcastHashJoin / ArrowEvalPython / MapInPandas /
  WindowGroupLimit, and whether any parquet scan shows PushedFilters.

Eager lanes (work at construction) still yield their final plan; the
audit is plan-only — no lane is executed beyond what its constructor
runs. Output: JSON on stdout; human summary on stderr.

Usage: python scripts/r15_plan_audit.py [out.json]
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_in_rust_spark import harness  # noqa: E402
from vector_database_in_rust_spark.session import get_spark  # noqa: E402

NODE_COUNTS = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "WindowGroupLimit",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="r15-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name in sorted(harness.QUERIES):
        spark.sparkContext.setJobDescription(f"audit:{name}")
        t0 = time.perf_counter()
        try:
            df = harness.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # audit must cover every lane
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"{name}: ERROR {exc}", file=sys.stderr)
            continue
        row: dict = {"construct_s": round(time.perf_counter() - t0, 2)}
        for node in NODE_COUNTS:
            c = len(re.findall(rf"^\(\d+\) {node}\b", plan, re.MULTILINE))
            if c:
                row[node] = c
        row["pushed_filters"] = len(
            re.findall(r"^PushedFilters: \[(?!\])", plan, re.MULTILINE)
        )
        flags = []
        if row.get("BatchEvalPython"):
            flags.append("ROW_UDF")
        if row.get("CartesianProduct"):
            flags.append("CARTESIAN")
        if row.get("BroadcastNestedLoopJoin"):
            flags.append("BNLJ")
        if flags:
            row["flags"] = flags
        results[name] = row
        print(f"{name}: {json.dumps(row)}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    text = json.dumps(results, indent=0, sort_keys=True)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text)
    else:
        print(text)
    flagged = {k: v for k, v in results.items() if v.get("flags") or v.get("error")}
    print(f"\n=== flagged: {len(flagged)} ===", file=sys.stderr)
    for k, v in flagged.items():
        print(f"  {k}: {v.get('flags') or v.get('error')}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
