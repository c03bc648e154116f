#!/usr/bin/env python
"""Per-key Spark JOB/STAGE count probe (guide §1: measure first).

Usage: python scripts/qjobs.py key1 key2 ... [--sf DIR] [--no-warm]

The iterative faces are job-count-bound, not data-bound (VERDICT r14):
this prints, per key, the number of Spark jobs and stages one full
execution (construction + collect) launches, plus the wall time. Job
counts are load-insensitive, so this probe is valid even on a busy
host; use scripts/qtime.py for timing floors.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from vedb_gaze_spark.plans.queries import QUERIES
    from vedb_gaze_spark.session import get_spark

    spark = get_spark("vgs-qjobs")
    sc = spark.sparkContext

    def run(name: str, sf: str) -> None:
        QUERIES[name](spark, sf).collect()

    for name in args.keys:
        if name not in QUERIES:
            print(f"{name}: NOT A REGISTRY KEY", flush=True)
            continue
        if not args.no_warm and os.path.isdir(args.warm_dir):
            run(name, args.warm_dir)
        group = f"probe:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        run(name, args.sf)
        wall = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle")
        st = sc.statusTracker()
        jids = st.getJobIdsForGroup(group)
        nstages = 0
        for j in jids:
            info = st.getJobInfo(j)
            if info is not None:
                nstages += len(info.stageIds)
        print(
            f"{name}: jobs={len(jids)} stages={nstages} wall={wall:.2f}s",
            flush=True,
        )
        spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
