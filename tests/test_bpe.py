"""BPE trainer/encoder tests: the distributed trainer must reproduce an
independent pure-python reference on the classic Sennrich corpus, and
encoding must losslessly partition every word."""

from collections import Counter

from pyspark.sql import Row

from vedb_gaze_spark.operators import bpe


def _ref_bpe_train(word_counts: dict[str, int], n_merges: int):
    """Independent reference: dict-based pair counting, same tie-break
    (count desc, then (a, b) lexicographic)."""
    vocab = {w: list(w) + [bpe.END] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


CLASSIC = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_trainer_matches_reference_on_classic_corpus(spark):
    text = " ".join(w for w, n in CLASSIC.items() for _ in range(n))
    docs = spark.createDataFrame([Row(doc_id=0, text=text)])
    got = bpe.bpe_train(docs, n_merges=10)
    assert got == _ref_bpe_train(CLASSIC, 10)


def test_encode_word_partitions_losslessly(spark, sf_dir):
    from vedb_gaze_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    merges = bpe.bpe_train(docs, n_merges=12)
    assert len(merges) == 12
    types = bpe.bpe_encode_types(docs, merges).collect()
    assert len(types) > 0
    for r in types:
        joined = "".join(r["pieces"])
        assert joined == r["word"] + bpe.END, r["word"]
        # encoder UDF output == driver kernel output
        assert r["pieces"] == bpe.encode_word(r["word"], merges)


def test_bpe_stats_consistency(spark, sf_dir):
    from pyspark.sql import functions as F
    from vedb_gaze_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    stats = bpe.bpe_stats(docs, n_merges=8)
    rows = stats.collect()
    assert all(r["n_pieces"] >= r["n_words"] for r in rows)
    total_words = sum(r["n_words"] for r in rows)
    expect = docs.select(
        F.expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))").alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total_words == expect
