"""Round-15 scratch profiler: run one bench lane with event logging on,
then print per-job wall and the DRIVER GAPS between jobs (planning /
analysis / py4j time the job timeline cannot see).

Usage: python scripts/r15_jobtrace.py <query> [repeats]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _RESET_BEFORE  # noqa: E402
from vector_database_in_rust_spark import harness  # noqa: E402
from vector_database_in_rust_spark.session import get_spark  # noqa: E402


def _iter_lines(paths):
    for p in paths:
        with open(p) as fh:
            yield from fh


def main() -> None:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import shutil

    log_dir = "/tmp/r15_eventlog"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"r15-trace-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()  # warm-up
    walls = []
    marks = []
    for i in range(repeats):
        spark.catalog.clearCache()
        reset = _RESET_BEFORE.get(name)
        if reset:
            reset()
        spark.sparkContext.setJobDescription(f"run{i}:{name}")
        t0 = time.perf_counter()
        df = harness.QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        walls.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        marks.append((t0, t2))
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    # parse the event log (Spark 4 may write a rolling eventlog_v2 dir)
    paths = sorted(
        p
        for p in glob.glob(f"{log_dir}/*") + glob.glob(f"{log_dir}/*/events_*")
        if os.path.isfile(p)
    )
    jobs = {}
    stages = {}
    for line in _iter_lines(paths):
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "t0": ev["Submission Time"],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "stages": [
                    s.get("Stage ID", s.get("Stage Id"))
                    for s in ev.get("Stage Infos", [])
                ],
            }
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si.get("Stage ID", si.get("Stage Id"))] = {
                "name": si["Stage Name"].split(" at ")[0],
                "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
                "tasks": si["Number of Tasks"],
            }
    for i in range(repeats):
        sel = sorted(
            (j for j in jobs.values() if j["desc"] == f"run{i}:{name}" and "t1" in j),
            key=lambda j: j["t0"],
        )
        print(f"--- run {i}: plan={walls[i][0]}s exec={walls[i][1]}s jobs={len(sel)}")
        prev_end = None
        for j in sel:
            gap = (j["t0"] - prev_end) / 1000.0 if prev_end else 0.0
            prev_end = j["t1"]
            dur = (j["t1"] - j["t0"]) / 1000.0
            st = [
                f"{stages[s]['name']}({stages[s]['ms']}ms/{stages[s]['tasks']}t)"
                for s in j["stages"]
                if s in stages
            ]
            print(f"  gap={gap:6.3f}s job={dur:6.3f}s  {'; '.join(st)[:140]}")


if __name__ == "__main__":
    main()
