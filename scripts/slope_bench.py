#!/usr/bin/env python
"""10x-corpus scaling slopes for the dedup family (PERF_NOTES table).

Rebuilds the r3 measurement on the CURRENT kernels (r10 verdict #6):
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

Usage: python scripts/slope_bench.py [--passes 2] [--out slope_r11.json]
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
TMP = "/tmp/slope_r11"

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(TMP, "slope_r11.json"))
    args = ap.parse_args()

    from vedb_gaze_spark.plans.queries import QUERIES
    from vedb_gaze_spark.session import get_spark

    spark = get_spark("slope-bench")
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
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
