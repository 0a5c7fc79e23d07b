"""BPE training + segmentation (distributed count, driver merges,
Arrow-batched apply)."""

from pyspark.sql import functions as F

from promi_spark.operators.bpe import END, apply_bpe_word, bpe_segment, train_bpe


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_classic_corpus_merges(spark):
    """The Sennrich walk-through: on {low, lower, newest, widest} with
    'est' heavy, the first merges build 'est</w>' — hand-checkable
    determinism of the merge loop."""
    docs = _docs(
        spark,
        ["low low low low low", "lower lower", "newest newest newest newest newest newest", "widest widest widest"],
    )
    merges = train_bpe(docs, num_merges=10, min_freq=2)
    assert merges[0] == ("e", "s")  # 9 'es' pairs beat everything
    assert ("es", "t") in merges[:3]
    # determinism: retraining yields the identical table
    assert merges == train_bpe(docs, num_merges=10, min_freq=2)


def test_segment_round_trips_text(spark):
    """Concatenating a word's pieces (minus the end marker) restores the
    word — segmentation never loses characters."""
    docs = _docs(
        spark,
        ["the quick brown fox", "the lazy dog", "the the the quick quick"],
    )
    merges = train_bpe(docs, num_merges=50, min_freq=1)
    out = bpe_segment(docs, merges).collect()
    for r in out:
        rebuilt = "".join(r["bpe_tokens"]).replace(END, " ").strip()
        assert rebuilt == r["text"].lower()


def test_frequent_words_become_single_tokens(spark):
    """Enough merges fuse the corpus's frequent words into one piece;
    unseen words fall back to finer pieces, never fail."""
    docs = _docs(spark, ["spark " * 30 + "engine " * 20])
    merges = train_bpe(docs, num_merges=30, min_freq=1)
    ranks = {p: i for i, p in enumerate(merges)}
    assert apply_bpe_word("spark", ranks) == ["spark" + END]
    unseen = apply_bpe_word("sparkle", ranks)
    assert "".join(unseen) == "sparkle" + END and len(unseen) > 1


def test_learned_token_counts_query_shape(spark):
    """End-to-end on the sf documents table: train on the corpus,
    count learned tokens per doc; every count >= 1 piece per word."""
    from promi_spark.io import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    merges = train_bpe(docs, num_merges=200, min_freq=2)
    assert len(merges) > 50
    out = (
        bpe_segment(docs, merges)
        .select("doc_id", F.size("bpe_tokens").alias("n_bpe"))
        .collect()
    )
    assert len(out) == docs.count()
    assert all(r["n_bpe"] >= 0 for r in out)
