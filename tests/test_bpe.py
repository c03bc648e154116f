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


def test_unigram_lm_train_deterministic_lossless_and_stats(spark, sf_dir):
    """Unigram-LM tokenizer pins (Kudo 2018 hard-EM variant): (a) exact
    integer Viterbi counts make training bit-reproducible — identical
    scores and code-length traces across runs; (b) the trace improves
    from the seed model to the converged model (corpus code length in
    micro-nats, exact longs); (c) segmentation is LOSSLESS (pieces
    concatenate back to every word type) and compresses (pieces <
    characters); (d) every single char stays in the vocab (the
    segmentability guarantee); (e) the stats face emits one row per doc
    with exact integer counts."""
    from vedb_gaze_spark.operators import unigram
    from vedb_gaze_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    s1, t1 = unigram.unigram_train(docs)
    s2, t2 = unigram.unigram_train(docs)
    assert s1 == s2 and t1 == t2
    assert t1[-1] < t1[0]

    enc = unigram.unigram_encode_types(docs, s1).collect()
    assert all("".join(r.pieces) == r.word for r in enc)
    n_pieces = sum(len(r.pieces) * r.cnt for r in enc)
    n_chars = sum(len(r.word) * r.cnt for r in enc)
    assert n_pieces < n_chars
    chars = {c for r in enc for c in r.word}
    assert chars <= set(s1)

    out = unigram.unigram_lm_stats(docs).collect()
    assert len(out) == docs.where("text IS NOT NULL").count()
    for r in out[:50]:
        assert r.n_pieces >= r.n_words > 0


def test_unigram_lm_learns_compositional_pieces(spark):
    """Planted compositional corpus: words are built from the morphemes
    ab/cd/xy (e.g. 'abxy', 'cdab') plus rare full words; with the piece
    length capped below word length, the trained vocabulary must keep
    the frequent morphemes and segment every word into them — the
    behavior that distinguishes a trained unigram model from character
    fallback."""
    from vedb_gaze_spark.operators import unigram

    words = ["abxy", "abcd", "cdxy", "cdab", "xyab", "xycd"]
    rows = []
    for i in range(120):
        rows.append((i, " ".join(words[(i + j) % len(words)] for j in range(8))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    old_len = unigram.MAX_PIECE_LEN
    unigram.MAX_PIECE_LEN = 2
    try:
        scores, _ = unigram.unigram_train(
            docs, seed_vocab=64, target_vocab=12, em_iters=3
        )
        enc = unigram.unigram_encode_types(docs, scores).collect()
    finally:
        unigram.MAX_PIECE_LEN = old_len
    assert {"ab", "cd", "xy"} <= set(scores)
    for r in enc:
        assert r.pieces == [r.word[:2], r.word[2:]], r
