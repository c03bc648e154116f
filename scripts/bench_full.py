#!/usr/bin/env python
"""FULL-REGISTRY timing pass (r13 verdict #5): time EVERY key in
``queries()`` — not just bench.py's 124-query headline set — once per
pass, best-of-2, at $SPARK_GRAFT_SF_DIR (default sf0.1).

Purpose: the headline set covers every heavy family, but ~87 registry
keys had never appeared in an official timing artifact, so a regression
on an untimed face was invisible until it drifted into the timed set.
This face records a quiet floor for all of them.

Prints ONE JSON line {"metric": "full_registry_wall", "value": total,
"unit": "sec", "queries": {...}, "sf": ...} and writes the full pass
detail to bench_full_detail.json beside this script's repo root. Run
on a quiet window (loadavg < ~0.3) like bench.py; same warmup + GC
discipline so the numbers are comparable with the headline artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from vedb_gaze_spark.plans.queries import QUERIES
    from vedb_gaze_spark.session import get_spark

    spark = get_spark("vgs-bench-full")
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    names = list(QUERIES)

    # Same warm discipline as bench.py: one full-SF query to warm the
    # JVM + parquet footers, tiny-SF same-shape passes for the
    # iterative/codegen-heavy shapes, untimed full-SF passes for the
    # documented phantom-load watch rows.
    QUERIES[names[0]](spark, SF_DIR).collect()
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"
    )
    if os.path.isdir(warm_dir):
        for wname in (
            "dedup_clusters", "dedup_agreement", "semdedup",
            "dedup_minhash_lsh", "trade_pagerank", "semdedup_trained",
            "ann_pq", "ann_ivfpq", "ann_ivfpq_trained", "bpe_stats",
        ):
            if wname in QUERIES:
                QUERIES[wname](spark, warm_dir).collect()
        spark._jvm.System.gc()
    for wname in ("dedup_agreement", "dedup_clusters", "cross_source_dedup"):
        if wname in QUERIES:
            QUERIES[wname](spark, SF_DIR).collect()
    spark._jvm.System.gc()

    per_query: dict[str, float] = {}
    errors: dict[str, str] = {}
    pass_detail: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(2):
        for name in names:
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, SF_DIR).collect()
            except Exception as exc:  # a face that breaks at this SF is
                # the finding, not a reason to lose the artifact
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"[bench_full] ERROR {name}: {errors[name]}",
                      file=sys.stderr, flush=True)
                continue
            dt = round(time.perf_counter() - t0, 3)
            pass_detail[name].append(dt)
            per_query[name] = min(per_query.get(name, dt), dt)
            spark._jvm.System.gc()

    # adaptive third pass for episodic-stall rows (bench.py's rule)
    for name in names:
        d = pass_detail[name]
        if len(d) == 2 and min(d) > 1.0 and max(d) > 2.0 * min(d):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).collect()
            dt = round(time.perf_counter() - t0, 3)
            pass_detail[name].append(dt)
            per_query[name] = min(per_query[name], dt)
            spark._jvm.System.gc()

    out = {
        "metric": "full_registry_wall",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "errors": errors,
        "passes": 2,
        "queue_rev": format(zlib.crc32(",".join(names).encode()), "08x"),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    with open(os.path.join(REPO, "bench_full_detail.json"), "w") as fh:
        json.dump(
            {"pass_detail": pass_detail, "summary": out}, fh, indent=1
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
