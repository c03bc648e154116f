#!/usr/bin/env python
"""All-keys engine-vs-oracle sweep at an arbitrary SF dir.

The per-round driver gate compares 50 keys at sf0.01; this sweep runs
EVERY registry key against its DuckDB oracle at any SF — the deeper net
that catches divergences only larger data exposes. Two real bugs found
on its first runs (r14, PERF_NOTES): text_quality's round(x,6)
HALF_UP-vs-DuckDB tie at sf0.1, and odometry_speed's mins_per_mile tie
— both invisible at sf0.01, both fixed with the engine-portable
floor(x*1e6+0.5)/1e6 convention.

Usage: python scripts/oracle_sweep.py [--sf /root/testdata/sf0.1]
Prints one line per key; exits non-zero if any oracle'd key mismatches.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from vedb_gaze_spark.session import get_spark

    spark = get_spark("oracle-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )
    qs, os_ = mod.queries(), mod.oracle_sql()
    bad = 0
    for name in sorted(qs):
        try:
            s = qs[name](spark, args.sf).collect()
        except Exception as e:  # noqa: BLE001 — record and continue
            print(name, "SPARK_ERROR", str(e)[:150], flush=True)
            bad += 1
            continue
        if name not in os_:
            print(name, "rows-only:", len(s), flush=True)
            continue
        try:
            d = con.execute(os_[name]).fetchall()
        except Exception as e:  # noqa: BLE001
            print(name, "DUCK_ERROR", str(e)[:150], flush=True)
            bad += 1
            continue
        ok = sorted(map(repr, map(tuple, s))) == sorted(map(repr, d))
        bad += not ok
        print(name, len(s), len(d), ok, flush=True)
    spark.stop()
    print("SWEEP_DONE bad=", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
