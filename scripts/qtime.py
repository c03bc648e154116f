#!/usr/bin/env python
"""Isolated per-key timing: warm pass + best-of-N full executions.

Usage: python scripts/qtime.py key1 key2 ... [--sf DIR] [--n 3] [--noop]

--noop times `df.write.format("noop")` (guide §1.4: computes every
column of every row, no collect-to-driver cost) instead of collect();
bench.py's official methodology stays collect(), so use --noop only to
decompose where time goes, not for floor bookkeeping.
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
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from vedb_gaze_spark.plans.queries import QUERIES
    from vedb_gaze_spark.session import get_spark

    spark = get_spark("vgs-qtime")

    def run(name: str, sf: str) -> None:
        df = QUERIES[name](spark, sf)
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    for name in args.keys:
        if name not in QUERIES:
            print(f"{name}: NOT A REGISTRY KEY", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        # same-shape warm at the tiny SF (codegen compile) + one
        # untimed full-SF pass (JIT steady state) per bench.py
        if os.path.isdir(args.warm_dir):
            run(name, args.warm_dir)
        run(name, args.sf)
        spark._jvm.System.gc()
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            run(name, args.sf)
            times.append(round(time.perf_counter() - t0, 3))
            spark._jvm.System.gc()
        print(f"{name}: best={min(times)} passes={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
