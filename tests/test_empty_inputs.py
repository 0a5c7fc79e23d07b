"""Empty-input hardening: every operator family must return an empty
(or correctly-degenerate) result on an empty corpus instead of
raising — the first thing that breaks when a filter chain drops
everything mid-pipeline at scale."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, lang string, source string, n_chars long")


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>, label int")


def test_text_family_empty(spark, empty_docs):
    from promi_spark.operators.text import (
        cross_doc_substrings,
        length_quantiles,
        quality_scores,
        repetition_stats,
        source_mix,
        winnow_fingerprints,
    )

    assert quality_scores(empty_docs).count() == 0
    assert repetition_stats(empty_docs).count() == 0
    assert winnow_fingerprints(empty_docs).count() == 0
    assert cross_doc_substrings(empty_docs).count() == 0
    assert source_mix(empty_docs).count() == 0
    assert length_quantiles(empty_docs).count() == 0


def test_dedup_family_empty(spark, empty_docs):
    from promi_spark.operators.dedup import (
        dedup_components,
        dedup_exact,
        leakage_safe_split,
        minhash_dedup,
    )

    assert dedup_exact(empty_docs).count() == 0
    pairs = minhash_dedup(empty_docs, threshold=0.5)
    assert pairs.count() == 0
    assert dedup_components(pairs).count() == 0
    out = leakage_safe_split(empty_docs, pairs, ratio=0.5)
    assert out.count() == 0 and "split" in out.columns


def test_sampling_and_ml_empty(spark, empty_docs):
    from promi_spark.operators.ml import weak_quality_labels
    from promi_spark.operators.scale import mixture_sample

    assert mixture_sample(empty_docs, {"src0": 1.0}).count() == 0
    assert weak_quality_labels(empty_docs).count() == 0


def test_similarity_family_empty(spark, empty_emb):
    from promi_spark.operators.similarity import cosine_near_dups, l2_norm

    norms = empty_emb.select(
        "vec_id", l2_norm(F.col("embedding").cast("array<double>")).alias("l2")
    )
    assert norms.count() == 0
    assert cosine_near_dups(empty_emb, threshold=0.9).count() == 0


def test_asof_join_empty_sides(spark):
    import datetime as dt

    from promi_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 1, 1))], "id long, key string, ts timestamp"
    )
    empty_right = spark.createDataFrame([], "key string, ts timestamp, v string")
    out = asof_join(left, empty_right, on="key", left_ts="ts").collect()
    assert len(out) == 1 and out[0]["v_r"] is None  # left survives unmatched
    empty_left = spark.createDataFrame([], "id long, key string, ts timestamp")
    right = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), "x")], "key string, ts timestamp, v string"
    )
    assert asof_join(empty_left, right, on="key", left_ts="ts").count() == 0


def test_bpe_empty_corpus(spark, empty_docs):
    from promi_spark.operators.bpe import bpe_segment, train_bpe

    merges = train_bpe(empty_docs, num_merges=10)
    assert merges == []
    assert bpe_segment(empty_docs, merges).count() == 0


def test_line_dedup_and_windows_empty(spark, empty_docs):
    from promi_spark.operators.text import line_dedup

    assert line_dedup(empty_docs).count() == 0
    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    assert empty_ev.select(F.count(F.lit(1)).over(w).alias("n")).count() == 0


def test_round5_new_operators_empty(spark, empty_docs, empty_emb):
    import datetime as dt

    from pyspark.sql import functions as F

    from promi_spark.log import EventLog
    from promi_spark.operators.joins import interval_overlap_join
    from promi_spark.operators.mining import trace_clustering
    from promi_spark.operators.similarity import knn_classify
    from promi_spark.operators.split import per_key_cap, weighted_sample
    from promi_spark.operators.stats import value_outliers
    from promi_spark.operators.text import chunk_docs, corpus_cardinality

    assert chunk_docs(empty_docs).count() == 0
    assert corpus_cardinality(empty_docs).count() == 0
    assert corpus_cardinality(empty_docs, approx=True).count() == 0
    assert per_key_cap(empty_docs, "source", 5, "doc_id").count() == 0
    assert weighted_sample(empty_docs, 5, F.lit(1.0), "doc_id").count() == 0
    assert weighted_sample(
        empty_docs, 5, F.lit(1.0), "doc_id", key_col="source"
    ).count() == 0

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    assert value_outliers(empty_ev).count() == 0
    log = EventLog.from_generic(empty_ev, "user_id", "event_type", "ts")
    assert trace_clustering(log, k=4).count() == 0

    iv = spark.createDataFrame([], "id long, start_ts timestamp, end_ts timestamp")
    one = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))],
        "id long, start_ts timestamp, end_ts timestamp",
    )
    assert interval_overlap_join(one, iv).count() == 0
    assert interval_overlap_join(iv, one).count() == 0

    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    assert knn_classify(empty_emb, q).count() == 0


def test_round5_batch3_operators_empty(spark, empty_docs):
    from pyspark.sql import functions as F

    from promi_spark.log import EventLog
    from promi_spark.operators.dfg import eventually_follows, handover_network
    from promi_spark.operators.text import phrase_search, tfidf_top_terms, top_ngrams
    from promi_spark.operators.scale import zorder_value

    assert top_ngrams(empty_docs).count() == 0
    assert tfidf_top_terms(empty_docs).count() == 0
    assert phrase_search(empty_docs, "a b").count() == 0

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, resource string"
    )
    log = EventLog.from_generic(
        empty_ev, "user_id", "event_type", "ts",
        keep=["event_id", "value", "resource"],
    )
    assert eventually_follows(log).count() == 0
    assert handover_network(log).count() == 0
    z = empty_ev.select(zorder_value([F.col("user_id")], bits=4).alias("z"))
    assert z.count() == 0


def test_r10_operators_empty(spark, empty_docs, empty_emb):
    from promi_spark.operators import dsir, pq
    from promi_spark.operators.similarity import cluster_prune
    from promi_spark.operators.sketch import heavy_hitters, mg_candidates

    # DSIR: empty target -> uniform weights over raw buckets; empty raw
    # -> empty weight/score/selection relations
    some = spark.createDataFrame(
        [(1, "s", "a b c")], "doc_id long, source string, text string"
    )
    w = dsir.dsir_weights(empty_docs, some)
    assert w.count() > 0  # raw buckets still present (ct = 0)
    assert dsir.dsir_weights(some, empty_docs).count() > 0
    assert dsir.dsir_scores(empty_docs, w).count() == 0
    assert dsir.dsir_select(empty_docs, some, 5).count() == 0

    # heavy hitters: no rows -> no candidates, no output
    assert mg_candidates(empty_docs, "text", 8).count() == 0
    assert heavy_hitters(empty_docs, "text", min_count=1).count() == 0
    assert heavy_hitters(empty_docs, "text", min_frac=0.5).count() == 0

    # PQ / pruning need a codebook: seeded books from a 1-row corpus
    one = spark.createDataFrame(
        [(0, [float(i) for i in range(64)])],
        "vec_id long, embedding array<double>",
    )
    books = pq.pq_codebooks(one, dim=64, m_subspaces=4, n_codes=1,
                            init="lowest_ids", n_iter=0)
    assert pq.pq_encode(empty_emb, books).count() == 0
    assert pq.pq_topk(empty_emb, books, [0.0] * 64, k=3).count() == 0
    cent = [[0.0] * 64]
    assert cluster_prune(empty_emb, 0.3, centroids=cent).count() == 0
