"""Semantic tests for the quality-filter family (operators/filtering.py):
planted documents exercising each Gopher rule, C4 line predicates with
order-preserving rebuild, classifier determinism against an independent
hashlib recompute, and CCNet tertile balance."""

import hashlib

import pytest
from pyspark.sql import Row

from vedb_gaze_spark.operators import filtering
from vedb_gaze_spark.plans import params as P


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s0", n_chars=len(t or ""))
         for i, t in enumerate(texts)]
    )


# calibrated to pass every Gopher gate: 36 words, mean word length 4.72,
# top-word fraction 0.056, dup-2gram fraction 0.057, 3 stopwords
GOOD = ("the customer window stream vector column filter merge batch query "
        "table spark value group order scan join hash small slow fast "
        "data line part key big sort the aggs rows a stream window "
        "vector column filter")


class TestGopherRules:
    def test_each_rule_fires_on_its_planted_doc(self, spark):
        texts = [
            GOOD,                                   # 0: passes everything
            "tiny doc only",                        # 1: n_words
            "ab " * 40,                             # 2: word_len (mean 2.0)
            ("the a and of to " * 8)[:-1],          # 3: top_word (0.2 each)
            GOOD.replace("the", "xx"),              # 4: stopwords (<2)
        ]
        rows = {r["doc_id"]: r for r in
                filtering.gopher_rules(_docs(spark, texts)).collect()}
        assert rows[0]["keep"] and rows[0]["fail_reason"] is None
        assert rows[1]["fail_reason"] == "n_words"
        assert rows[2]["fail_reason"] == "word_len"
        # doc 3 trips the word-count/word-len gates first? no: 40 words of
        # the 5 stopwords -> n_words=40 ok, mean len (3+1+3+2+2)/5=2.2 -> word_len
        assert rows[3]["fail_reason"] in ("word_len", "top_word")
        assert not rows[4]["keep"]

    def test_rule_order_first_fail_wins(self, spark):
        # 10 words AND terrible word length: n_words is checked first
        df = filtering.gopher_rules(_docs(spark, ["ab cd ef gh ij"]))
        assert df.collect()[0]["fail_reason"] == "n_words"

    def test_live_on_real_corpus(self, spark, sf_dir):
        from vedb_gaze_spark.sources.tables import load_table
        agg = filtering.gopher_rules(
            load_table(spark, "documents", sf_dir)
        ).groupBy("keep").count().collect()
        counts = {r["keep"]: r["count"] for r in agg}
        assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0

    def test_null_and_empty_text_absent(self, spark):
        df = filtering.gopher_rules(_docs(spark, [None, "", GOOD]))
        assert [r["doc_id"] for r in df.collect()] == [2]


class TestC4Clean:
    def test_boilerplate_line_dropped_order_preserved(self, spark):
        w = P.LINE_DEDUP_WORDS
        line_a = " ".join(f"a{i}" for i in range(w))
        line_b = " ".join([P.C4_BOILERPLATE] + [f"b{i}" for i in range(w - 1)])
        line_c = " ".join(f"c{i}" for i in range(w))
        line_d = " ".join(f"d{i}" for i in range(w))
        text = " ".join([line_a, line_b, line_c, line_d])
        r = filtering.c4_clean(_docs(spark, [text])).collect()[0]
        assert r["n_lines"] == 4 and r["n_lines_kept"] == 3
        assert r["clean_text"] == " ".join([line_a, line_c, line_d])
        assert r["n_words_clean"] == 3 * w
        assert r["kept"]  # 3 >= C4_MIN_LINES

    def test_short_trailing_line_dropped(self, spark):
        w = P.LINE_DEDUP_WORDS
        full = " ".join(f"w{i}" for i in range(2 * w))
        tail = "x y"  # < C4_MIN_LINE_WORDS
        r = filtering.c4_clean(_docs(spark, [full + " " + tail])).collect()[0]
        assert r["n_lines"] == 3 and r["n_lines_kept"] == 2
        assert not r["kept"]  # 2 < C4_MIN_LINES

    def test_all_lines_dropped_null_text(self, spark):
        r = filtering.c4_clean(
            _docs(spark, [f"{P.C4_BOILERPLATE} b c"])
        ).collect()[0]
        assert r["n_lines_kept"] == 0 and r["clean_text"] is None
        assert r["n_words_clean"] == 0


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestQualityClassifier:
    def test_score_matches_hashlib_recompute(self, spark):
        text = "spark join filter merge the batch window scan"
        r = filtering.quality_classifier(_docs(spark, [text])).collect()[0]
        units = 0
        for t in text.split():
            b = _h60(t) % P.QC_BUCKETS
            units += _h60(f"qcw:{b}") % (2 * P.QC_SCALE + 1) - P.QC_SCALE
        assert r["score_units"] == units
        assert r["n_tokens"] == 8
        import math
        assert r["score"] == math.floor(
            units / (P.QC_SCALE * 8.0) * 1e6 + 0.5) / 1e6
        assert r["label"] == (r["score"] > 0.0)

    def test_score_bounded(self, spark, sf_dir):
        from vedb_gaze_spark.sources.tables import load_table
        from pyspark.sql import functions as F
        bad = (
            filtering.quality_classifier(load_table(spark, "documents", sf_dir))
            .where((F.col("score") < -1.0) | (F.col("score") > 1.0))
            .count()
        )
        assert bad == 0


class TestCcnetBuckets:
    def test_tertiles_balanced_within_lang(self, spark, sf_dir):
        from vedb_gaze_spark.sources.tables import load_table
        rows = filtering.ccnet_ppl_buckets(
            load_table(spark, "documents", sf_dir)
        ).collect()
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r)
        for lang, rs in by_lang.items():
            sizes = [sum(1 for r in rs if r["tertile"] == t) for t in (1, 2, 3)]
            assert max(sizes) - min(sizes) <= 1, (lang, sizes)
            # head has the lowest cross-entropy (most LM-typical) docs
            head_max = max(r["cross_entropy"] for r in rs if r["tertile"] == 1)
            tail_min = min(r["cross_entropy"] for r in rs if r["tertile"] == 3)
            assert head_max <= tail_min + 1e-9, lang

    def test_bucket_labels(self, spark, sf_dir):
        from vedb_gaze_spark.sources.tables import load_table
        got = {
            (r["tertile"], r["bucket"])
            for r in filtering.ccnet_ppl_buckets(
                load_table(spark, "documents", sf_dir)
            ).collect()
        }
        assert got == {(1, "head"), (2, "middle"), (3, "tail")}

    def test_threshold_variant_equals_ntile_up_to_tie_groups(
        self, spark, sf_dir
    ):
        """ccnet_ppl_threshold (the documented scale path) must assign
        every doc the MINIMUM NTILE tertile of its (lang, cross_entropy)
        tie group: on distinct cross-entropies that is row-identical to
        ccnet_ppl_buckets; where NTILE splits equal-CE docs by doc_id
        across a boundary, the value-determined threshold form sends the
        whole tie group to the lower bucket."""
        from vedb_gaze_spark.sources.tables import load_table

        docs = load_table(spark, "documents", sf_dir)
        ntile = filtering.ccnet_ppl_buckets(docs).collect()
        thr = filtering.ccnet_ppl_threshold(docs).collect()
        assert len(ntile) == len(thr)
        min_tile = {}
        for r in ntile:
            k = (r["lang"], r["cross_entropy"])
            min_tile[k] = min(min_tile.get(k, 4), r["tertile"])
        names = {1: "head", 2: "middle", 3: "tail"}
        for r in thr:
            want = min_tile[(r["lang"], r["cross_entropy"])]
            assert r["tertile"] == want, r
            assert r["bucket"] == names[want], r

    def test_threshold_variant_plan_has_no_per_language_full_sort(
        self, spark, sf_dir
    ):
        """The scale property being bought: no NTILE (whose window ranks
        every doc of a language on one task chain) in the executed plan —
        the only windows run over the (lang, cross_entropy) histogram."""
        from vedb_gaze_spark.sources.tables import load_table

        df = filtering.ccnet_ppl_threshold(load_table(spark, "documents", sf_dir))
        df.collect()
        s = df._jdf.queryExecution().executedPlan().toString()
        assert "ntile" not in s
        assert "row_number" not in s


class TestHashEmbed:
    def test_unit_norm_and_determinism(self, spark, sf_dir):
        import math

        from vedb_gaze_spark.operators.text import hash_embed
        from vedb_gaze_spark.sources.tables import load_table

        rows = hash_embed(load_table(spark, "documents", sf_dir)).collect()
        assert len(rows) > 0
        for r in rows[:20]:
            n = math.sqrt(sum(x * x for x in r["embedding"]))
            assert abs(n - 1.0) < 1e-3  # rounded components, near-unit
        # identical docs embed identically
        a = {r["doc_id"]: tuple(r["embedding"]) for r in rows}
        b = {
            r["doc_id"]: tuple(r["embedding"])
            for r in hash_embed(load_table(spark, "documents", sf_dir)).collect()
        }
        assert a == b

    def test_composes_with_embedding_operators(self, spark, sf_dir):
        """hash_embed output drives the embedding family unchanged:
        brute-force ANN runs on it and returns a full top-k per query
        with sane cosine bounds."""
        from pyspark.sql import functions as F
        from vedb_gaze_spark.operators.similarity import ann_cosine_topk
        from vedb_gaze_spark.operators.text import hash_embed
        from vedb_gaze_spark.sources.tables import load_table

        emb = hash_embed(load_table(spark, "documents", sf_dir)).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        got = ann_cosine_topk(emb).collect()
        assert len(got) == 50  # n_queries * k
        assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in got)


def test_quality_classifier_trained_deterministic_and_learns(spark, sf_dir):
    """Distilled-classifier pins: (a) the integer-exact gradient loop is
    bit-reproducible — two trainings, identical weights and identical
    micro-nat loss traces; (b) the quantized training loss strictly
    decreases every epoch (full-batch GD on a convex objective with
    standardized features); (c) the trained scorer beats the majority
    baseline by a margin on the rule labels (acc ≥ 0.65; a LINEAR model
    cannot express the rules' 7-way AND — measured ceiling ≈ 0.71, the
    honest distillation gap documented in the operator); (d) the face
    emits one row per gopher-labeled doc with the agreement flag."""
    from vedb_gaze_spark.operators import filtering
    from vedb_gaze_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    w1, mu1, sd1, losses1 = filtering.quality_classifier_train(docs, epochs=6)
    w2, mu2, sd2, losses2 = filtering.quality_classifier_train(docs, epochs=6)
    assert w1 == w2 and mu1 == mu2 and sd1 == sd2 and losses1 == losses2
    assert all(a > b for a, b in zip(losses1, losses1[1:])), losses1

    out = filtering.quality_classifier_trained(docs).collect()
    n_rules = filtering.gopher_rules(docs).count()
    assert len(out) == n_rules
    acc = sum(r.agrees for r in out) / len(out)
    assert acc >= 0.65, acc


def test_quality_classifier_sampled_matches_full_batch_accuracy(spark, sf_dir):
    """Sampled-GD distillation pins (r8 verdict #6 — the 100 TB
    training-cost answer): (a) the salted-hash training sample is
    deterministic, so two runs produce identical scored outputs; (b)
    the sample holds ~1/mod of the corpus (binomial band); (c) scoring
    still covers EVERY gopher-labeled doc (training sampled, scoring
    full); (d) accuracy on the full corpus is within 0.05 of the
    full-batch trainer's — the quarter-corpus gradient estimates land
    the same distillation, at ~4 full-corpus passes of I/O instead
    of 13."""
    from vedb_gaze_spark.functions.core import portable_hash60
    from vedb_gaze_spark.operators import filtering
    from vedb_gaze_spark.plans import params as P
    from vedb_gaze_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    docs = load_table(spark, "documents", sf_dir)
    n = docs.count()
    n_sample = docs.where(
        portable_hash60(
            F.concat(F.lit(P.QC_SAMPLE_SALT + ":"), F.col("doc_id").cast("string"))
        )
        % P.QC_SAMPLE_MOD
        == 0
    ).count()
    import math

    p = 1.0 / P.QC_SAMPLE_MOD
    tol = 4 * math.sqrt(n * p * (1 - p))
    assert abs(n_sample - n * p) <= tol, (n_sample, n * p, tol)

    out1 = {r.doc_id: tuple(r) for r in filtering.quality_classifier_sampled(docs).collect()}
    out2 = {r.doc_id: tuple(r) for r in filtering.quality_classifier_sampled(docs).collect()}
    assert out1 == out2

    n_rules = filtering.gopher_rules(docs).count()
    assert len(out1) == n_rules

    acc_sampled = sum(t[-1] for t in out1.values()) / len(out1)
    full = filtering.quality_classifier_trained(docs).collect()
    acc_full = sum(r.agrees for r in full) / len(full)
    assert abs(acc_sampled - acc_full) <= 0.05, (acc_sampled, acc_full)
    assert acc_sampled >= 0.60, acc_sampled
