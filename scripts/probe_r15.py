#!/usr/bin/env python
"""r15 probe script (VERDICT r14 #5/#6): decompositions recorded in PERF_NOTES.md "r15 probes": where does time go in knn_label_accuracy,
sq8_recall, quality_classifier_sampled, incident_window_stats?
Noop-sink decompositions of each face's stages (guide §1.4)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from vedb_gaze_spark.operators import filtering, similarity, temporal
from vedb_gaze_spark.operators.similarity import (
    _vecs,
    ann_cosine_topk,
    sq8_encode,
    sq8_stats,
)
from vedb_gaze_spark.plans import params as P
from vedb_gaze_spark.session import get_spark
from vedb_gaze_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"


def main():
    spark = get_spark("proto-probe")
    sc = spark.sparkContext

    def t(label, fn, n=3, warm=True):
        if warm:
            try:
                fn(WARM)
            except Exception as e:
                print(label, "WARM_ERR", str(e)[:80])
        walls = []
        for _ in range(n):
            g = f"{label}:{time.time()}"
            sc.setJobGroup(g, label)
            t0 = time.perf_counter()
            fn(SF)
            walls.append(round(time.perf_counter() - t0, 3))
            sc.setJobGroup("idle", "idle")
        jids = sc.statusTracker().getJobIdsForGroup(g)
        print(f"{label}: best={min(walls):.3f} passes={walls} jobs_last={len(jids)}", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # --- knn_label_accuracy decomposition
    t("knn_full", lambda sf: noop(similarity.knn_label_accuracy(load_table(spark, "embeddings", sf))))
    t("knn_topk_only", lambda sf: noop(ann_cosine_topk(load_table(spark, "embeddings", sf), k=P.KNN_K, n_queries=P.KNN_N_QUERIES)))
    t("vecs_only", lambda sf: noop(_vecs(load_table(spark, "embeddings", sf))))

    # --- sq8_recall decomposition
    t("sq8_recall_full", lambda sf: noop(similarity.sq8_recall(load_table(spark, "embeddings", sf))))
    t("sq8_exact_side", lambda sf: noop(ann_cosine_topk(load_table(spark, "embeddings", sf))))
    t("sq8_stats_only", lambda sf: sq8_stats(load_table(spark, "embeddings", sf)))

    # --- quality_classifier_sampled decomposition
    t("qcs_full", lambda sf: noop(filtering.quality_classifier_sampled(load_table(spark, "documents", sf))))
    t("gopher_only", lambda sf: noop(filtering.gopher_rules(load_table(spark, "documents", sf))))

    # --- incident_window_stats + 10x-density slope
    t("iws_full", lambda sf: noop(temporal.incident_window_stats(load_table(spark, "events", sf))))

    ev = load_table(spark, "events", SF)
    # 10x DENSITY instance: same time span, 10x users — each error
    # window catches ~10x points and there are ~10x windows (the
    # realistic growth direction for pair volume)
    copies = ev.withColumn("c", F.explode(F.array(*[F.lit(i) for i in range(10)]))).select(
        (F.col("event_id") * 10 + F.col("c")).alias("event_id"),
        (F.col("user_id") * 10 + F.col("c")).alias("user_id"),
        "event_type",
        "ts",
        *[c for c in ev.columns if c not in ("event_id", "user_id", "event_type", "ts")],
    )
    n1 = ev.count()
    n10 = copies.count()
    pairs1 = temporal.interval_join(
        ev,
        ev.where(F.col("event_type") == "error").select(
            F.col("event_id").alias("incident_id"), F.unix_micros("ts").alias("t0_us")
        ),
    ).count()
    pairs10 = temporal.interval_join(
        copies,
        copies.where(F.col("event_type") == "error").select(
            F.col("event_id").alias("incident_id"), F.unix_micros("ts").alias("t0_us")
        ),
    ).count()
    print(f"iws rows: base={n1} dense10={n10} pairs: base={pairs1} dense10={pairs10} ratio={pairs10/max(pairs1,1):.1f}", flush=True)

    def run10():
        t0 = time.perf_counter()
        noop(
            copies.groupBy().agg(F.count(F.lit(1))).crossJoin(
                temporal.incident_window_stats(copies).groupBy().agg(
                    F.count(F.lit(1)).alias("n_inc"),
                    F.sum("n_events").alias("s"),
                )
            )
        )
        return round(time.perf_counter() - t0, 3)

    walls = [run10() for _ in range(2)]
    print(f"iws_dense10_stats: passes={walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
