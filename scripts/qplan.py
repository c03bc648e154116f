#!/usr/bin/env python
"""Dump .explain("formatted") for registry keys to files.

Usage: python scripts/qplan.py key1 key2 ... [--sf DIR] [--out DIR]
                               [--suffix _before]

Writes <out>/<key><suffix>.txt per key. Used to commit the judge-facing
plan evidence under plans/r14/.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r14"))
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from vedb_gaze_spark.plans.queries import QUERIES
    from vedb_gaze_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("vgs-qplan")
    for name in args.keys:
        if name not in QUERIES:
            print(f"{name}: NOT A REGISTRY KEY", flush=True)
            continue
        df = QUERIES[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
