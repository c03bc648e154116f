#!/usr/bin/env python
"""10x scaling slopes: dedup kernels, miners, capture ingest, error surfaces.

Dedup: rebuilds the r3 measurement on the CURRENT kernels (r10 verdict #6):
two synthetic 50k-doc corpora derived from the sf0.1 documents table
(written under /tmp — testdata untouched), then base-vs-10x wall times
for the near-dup kernels plus the sampled gates, and LSH recall against
the exact PPJoin pair set computed from the collected pair tables (the
pair tables are near-dup-sized, so the driver-side set arithmetic is
cheap — no second exact run).

Instances (deterministic, md5-derived — no RNG):
- light: every doc gains 9 near-dup copies (one token swapped per copy,
  per-doc junk) — copy-correlated content, every shingle's df ~10x.
  This is what repetitive web-scale corpora look like.
- heavy: the 9 extra copies replace half their tokens with junk SHARED
  by copy index — same-index copies of base near-dup pairs stay
  near-dups (density preserved ~10x the base pair count) while
  cross-index pairs fall below the threshold.

r12 additions (r11 verdict #9):
- miners: the three hard-negative miners at 1x and 10x the embeddings
  CORPUS (probe count fixed — the production shape: corpus grows,
  probe batch doesn't). Expected: ~linear for the flat-scan miners,
  ~linear with a 1/n_cells constant for the cell-pruned one.
- ingest: pldata and Y4M capture ingest at 1x and 10x the FILE count —
  one task per capture file is the parallelism unit, so wall time
  should scale with files/cores, not file count (the file-count
  scaling pin; the per-file task shape itself is pytest-pinned in
  tests/test_sources.py).

Usage: python scripts/slope_bench.py [--passes 2] [--out slope_r12.json]
  [--families dedup,miners,ingest,errors]
Writes one JSON with per-instance per-kernel seconds + pair counts +
recall, and prints it.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
TMP = "/tmp/slope_r12"

# timed kernels: registered faces only, so the measurement is exactly
# what the per-round gate runs. (key, passes_at_10x)
KERNELS = [
    ("dedup_ngram_jaccard", 1),  # the exact kernel: minutes at 10x
    ("dedup_minhash_lsh", 2),
    ("dedup_simhash", 2),
    ("dedup_recall", 2),  # r12: the registered face IS the sampled gate
    ("dedup_agreement", 2),  # the r11 sampled face
]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def build_instances() -> dict[str, str]:
    import pandas as pd

    base = pd.read_parquet(os.path.join(BASE, "documents.parquet"))
    paths = {}
    for inst in ("light", "heavy"):
        out_dir = os.path.join(TMP, inst)
        out_path = os.path.join(out_dir, "documents.parquet")
        if os.path.exists(out_path):
            paths[inst] = out_dir
            continue
        os.makedirs(out_dir, exist_ok=True)
        rows = []
        for doc_id, text, lang, source in zip(
            base["doc_id"], base["text"], base["lang"], base["source"]
        ):
            toks = text.split(" ")
            n = len(toks)
            for k in range(10):
                if k == 0:
                    t = text
                elif inst == "light":
                    # one per-(doc,copy) junk token: char-5 Jaccard
                    # stays ~0.9 inside the copy group
                    tt = list(toks)
                    pos = _h(f"L{doc_id}:{k}") % n
                    tt[pos] = f"zz{doc_id}c{k}"
                    t = " ".join(tt)
                else:
                    # half the tokens -> junk SHARED by copy index:
                    # same-index copies of near-dup pairs stay
                    # near-dups; cross-index pairs drop out
                    tt = list(toks)
                    for j in range(n // 2):
                        pos = _h(f"H{k}:{j}") % n
                        tt[pos] = f"qq{k}j{j}"
                    t = " ".join(tt)
                rows.append(
                    (doc_id * 10 + k, t, lang, source, len(t))
                )
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ).to_parquet(out_path, index=False)
        paths[inst] = out_dir
    return paths


def build_embeddings_10x() -> str:
    """10x the sf0.1 embeddings CORPUS (vec_id >= n_queries rows
    replicated with fresh ids), probe rows kept once — the production
    mining shape where the corpus grows but the probe batch doesn't."""
    import pandas as pd

    from vedb_gaze_spark.plans import params as P

    out_dir = os.path.join(TMP, "emb10x")
    out_path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(out_path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    base = pd.read_parquet(os.path.join(BASE, "embeddings.parquet"))
    q = base[base["vec_id"] < P.ANN_N_QUERIES]
    c = base[base["vec_id"] >= P.ANN_N_QUERIES]
    reps = []
    n_corpus = len(c)
    for k in range(10):
        r = c.copy()
        r["vec_id"] = P.ANN_N_QUERIES + (
            (r["vec_id"] - P.ANN_N_QUERIES) + k * n_corpus
        )
        reps.append(r)
    pd.concat([q, *reps], ignore_index=True).to_parquet(
        out_path, index=False
    )
    return out_dir


MINER_KEYS = [
    "mine_hard_negatives",
    "mine_hard_negatives_sq8",
    "mine_hard_negatives_ivfsq8",
]


def build_events_10x() -> str:
    """10x the sf0.1 events table by USER count (1,500 -> 15,000
    users): replicas shift user_id and event_id together, so every
    replica user carries a distinct deterministic gaze signal (the
    signal view derives positions from event_id). This scales the
    GROUP COUNT of the per-user applyInPandas error-surface kernels —
    the declared residual cost of the §2.E family (PERF_NOTES r12)."""
    import pandas as pd

    out_dir = os.path.join(TMP, "events10x")
    out_path = os.path.join(out_dir, "events.parquet")
    if os.path.exists(out_path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    base = pd.read_parquet(os.path.join(BASE, "events.parquet"))
    n_users = int(base["user_id"].max()) + 1
    n_events = int(base["event_id"].max()) + 1
    reps = []
    for k in range(10):
        r = base.copy()
        r["user_id"] = r["user_id"] + k * n_users
        r["event_id"] = r["event_id"] + k * n_events
        reps.append(r)
    pd.concat(reps, ignore_index=True).to_parquet(out_path, index=False)
    return out_dir


ERROR_KEYS = [
    "error_surface_grid",
    "error_surface_tps_cv",
    "error_grid_qc",
]


def run_errors(spark, passes: int) -> dict:
    """The §2.E surface family at 1x and 10x the USER count (r12
    verdict #8): cluster-reduce + per-user numpy kernels, so wall
    should grow ~linearly in groups (with the fixed distributed-spine
    cost amortized); a superlinear slope would mean the per-group
    overhead compounds and users-per-task batching needs work."""
    from vedb_gaze_spark.plans.queries import QUERIES

    dirs = {"base": BASE, "x10": build_events_10x()}
    for key in ERROR_KEYS:
        QUERIES[key](spark, WARM).collect()  # plan-shape warmup
    spark._jvm.System.gc()
    res: dict[str, dict] = {}
    for inst, d in dirs.items():
        res[inst] = {}
        for key in ERROR_KEYS:
            best, n_rows = None, None
            for _ in range(passes):
                t0 = time.perf_counter()
                n_rows = len(QUERIES[key](spark, d).collect())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark._jvm.System.gc()
            res[inst][key] = {"sec": round(best, 3), "rows": n_rows}
            print(
                f"[slope] {inst:5s} {key:28s} {best:8.2f} s rows={n_rows}",
                file=sys.stderr, flush=True,
            )
    for key in ERROR_KEYS:
        b = res["base"][key]["sec"]
        res["x10"][f"{key}_slope"] = (
            round(res["x10"][key]["sec"] / b, 2) if b else None
        )
    return res


def run_miners(spark, passes: int) -> dict:
    from vedb_gaze_spark.plans.queries import QUERIES

    dirs = {"base": BASE, "x10": build_embeddings_10x()}
    for key in MINER_KEYS:
        QUERIES[key](spark, WARM).collect()  # plan-shape warmup
    spark._jvm.System.gc()
    res: dict[str, dict] = {}
    for inst, d in dirs.items():
        res[inst] = {}
        for key in MINER_KEYS:
            best, n_rows = None, None
            for _ in range(passes):
                t0 = time.perf_counter()
                n_rows = len(QUERIES[key](spark, d).collect())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark._jvm.System.gc()
            res[inst][key] = {"sec": round(best, 3), "rows": n_rows}
            print(
                f"[slope] {inst:5s} {key:28s} {best:8.2f} s rows={n_rows}",
                file=sys.stderr, flush=True,
            )
    for key in MINER_KEYS:
        b = res["base"][key]["sec"]
        res["x10"][f"{key}_slope"] = (
            round(res["x10"][key]["sec"] / b, 2) if b else None
        )
    return res


def run_fullgrid(spark, passes: int) -> dict:
    """error_grid_qc at the reference's full-image (300, 400) grid vs
    the 8×6 bench grid (r13 verdict #7): 48 → 120,000 nodes per user
    (2,500×). The per-user numpy Clough-Tocher evaluation is the
    expected cost (nodes × users, embarrassingly parallel over user
    groups); the QC join must NOT broadcast the user×120k surface —
    past the node budget error_grid_qc falls back to the shuffle
    equi-join (operators/error.py). One pass at the full grid (the
    kernel is minutes-scale); best-of-``passes`` at the bench grid."""
    from vedb_gaze_spark.operators import error as E
    from vedb_gaze_spark.sources.tables import load_table

    ev = load_table(spark, "events", BASE)
    E.error_grid_qc(ev.where("user_id < 3")).collect()  # shape warmup
    spark._jvm.System.gc()
    res: dict = {}
    for tag, kw, np_ in (
        ("bench48", {}, passes),
        ("ref300x400", {"resolution": E.REFERENCE_RESOLUTION}, 1),
    ):
        best, n = None, None
        for _ in range(np_):
            t0 = time.perf_counter()
            n = len(E.error_grid_qc(ev, **kw).collect())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark._jvm.System.gc()
        res[tag] = {"sec": round(best, 3), "rows": n}
        print(
            f"[slope] fullgrid {tag:12s} {best:8.2f} s rows={n}",
            file=sys.stderr, flush=True,
        )
    res["nodes_ratio"] = 2500.0
    res["wall_ratio"] = round(
        res["ref300x400"]["sec"] / res["bench48"]["sec"], 2
    )
    return res


def run_ingest(spark, passes: int) -> dict:
    """pldata + Y4M capture ingest at 1x and 10x the FILE count —
    per-file task parallelism means wall should grow ~files/cores."""
    import numpy as np

    from vedb_gaze_spark.sources.pldata import (
        GAZE_FIELDS, read_pldata, write_pldata,
    )
    from vedb_gaze_spark.sources.y4m import encode_y4m, read_y4m_frames

    res: dict[str, dict] = {}
    n_datums, n_frames = 2000, 48
    frames = [
        (np.arange(64 * 64, dtype=np.uint8) + i).reshape(64, 64)
        for i in range(n_frames)
    ]
    y4m_bytes = encode_y4m(frames)
    for inst, n_files in (("base", 16), ("x10", 160)):
        pl_root = os.path.join(TMP, f"pl_{inst}")
        y4m_root = os.path.join(TMP, f"y4m_{inst}")
        if not os.path.exists(pl_root):
            for i in range(n_files):
                write_pldata(
                    os.path.join(pl_root, f"rec_{i:04d}"), "gaze",
                    [
                        {"topic": "gaze.3d.0", "timestamp": j * 0.01,
                         "confidence": 0.9, "norm_pos": [0.5, 0.5]}
                        for j in range(n_datums)
                    ],
                )
        if not os.path.exists(y4m_root):
            os.makedirs(y4m_root)
            for i in range(n_files):
                with open(
                    os.path.join(y4m_root, f"seg_{i:04d}.y4m"), "wb"
                ) as fh:
                    fh.write(y4m_bytes)
        res[inst] = {"n_files": n_files}
        for name, job in (
            (
                "read_pldata",
                lambda: read_pldata(
                    spark, os.path.join(pl_root, "*"), "gaze",
                    fields=GAZE_FIELDS,
                ).count(),
            ),
            (
                "read_y4m_frames",
                lambda: read_y4m_frames(spark, y4m_root).count(),
            ),
        ):
            best, n_rows = None, None
            for _ in range(passes):
                t0 = time.perf_counter()
                n_rows = job()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark._jvm.System.gc()
            res[inst][name] = {"sec": round(best, 3), "rows": n_rows}
            print(
                f"[slope] {inst:5s} {name:28s} {best:8.2f} s rows={n_rows}",
                file=sys.stderr, flush=True,
            )
    for name in ("read_pldata", "read_y4m_frames"):
        b = res["base"][name]["sec"]
        res["x10"][f"{name}_slope"] = (
            round(res["x10"][name]["sec"] / b, 2) if b else None
        )
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(TMP, "slope_r12.json"))
    ap.add_argument("--families", default="dedup,miners,ingest,errors,fullgrid")
    args = ap.parse_args()

    from vedb_gaze_spark.plans.queries import QUERIES
    from vedb_gaze_spark.session import get_spark

    spark = get_spark("slope-bench")
    families = set(args.families.split(","))
    if "dedup" not in families:
        inst_dirs = {}
        results: dict[str, dict] = {}
        out = {"sf_base": BASE, "instances": results}
        if "miners" in families:
            out["miners"] = run_miners(spark, args.passes)
        if "ingest" in families:
            out["ingest"] = run_ingest(spark, args.passes)
        if "errors" in families:
            out["errors"] = run_errors(spark, args.passes)
        if "fullgrid" in families:
            out["fullgrid"] = run_fullgrid(spark, args.passes)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        spark.stop()
        print(json.dumps(out))
        return
    inst_dirs = {"base": BASE, **build_instances()}

    # plan-shape warmup at the tiny SF (the bench.py discipline)
    for key, _ in KERNELS:
        QUERIES[key](spark, WARM).collect()
    spark._jvm.System.gc()

    results: dict[str, dict] = {}
    pair_sets: dict[tuple[str, str], set] = {}
    for inst, d in inst_dirs.items():
        results[inst] = {}
        for key, passes_10x in KERNELS:
            n_passes = args.passes if inst == "base" else min(
                args.passes, passes_10x
            )
            best, n_rows = None, None
            for _ in range(n_passes):
                t0 = time.perf_counter()
                rows = QUERIES[key](spark, d).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                n_rows = len(rows)
                spark._jvm.System.gc()
            results[inst][key] = {
                "sec": round(best, 3),
                "rows": n_rows,
            }
            if key in ("dedup_ngram_jaccard", "dedup_minhash_lsh"):
                pair_sets[(inst, key)] = {
                    (r.doc_a, r.doc_b) for r in rows
                }
            print(
                f"[slope] {inst:5s} {key:28s} {best:8.2f} s"
                f"  rows={n_rows}",
                file=sys.stderr,
                flush=True,
            )
        exact = pair_sets.get((inst, "dedup_ngram_jaccard"))
        lsh = pair_sets.get((inst, "dedup_minhash_lsh"))
        if exact is not None and lsh is not None:
            results[inst]["true_pairs"] = len(exact)
            results[inst]["lsh_recall"] = round(
                len(exact & lsh) / len(exact), 4
            ) if exact else 1.0

    out = {"sf_base": BASE, "instances": results}
    for key, _ in KERNELS:
        for inst in ("light", "heavy"):
            b = results["base"][key]["sec"]
            results[inst][f"{key}_slope"] = (
                round(results[inst][key]["sec"] / b, 2) if b else None
            )
    if "miners" in families:
        out["miners"] = run_miners(spark, args.passes)
    if "ingest" in families:
        out["ingest"] = run_ingest(spark, args.passes)
    if "errors" in families:
        out["errors"] = run_errors(spark, args.passes)
    if "fullgrid" in families:
        out["fullgrid"] = run_fullgrid(spark, args.passes)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
