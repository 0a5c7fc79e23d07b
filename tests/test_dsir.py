"""DSIR importance-resampling operator (operators/dsir.py): weight
exactness, scoring semantics, selection laws, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from promi_spark.operators import dsir


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    target = _docs(
        spark,
        [(i, "tgt", "alpha beta gamma alpha beta") for i in range(10)],
    )
    raw = _docs(
        spark,
        [(100, "raw", "alpha beta gamma alpha"), (101, "raw", "zzz qqq yyy zzz qqq")]
        + [(102 + i, "raw", f"noise{i} filler{i} pad{i}") for i in range(8)],
    )
    return target, raw


def test_gram_stream_counts(spark):
    df = _docs(spark, [(1, "s", "a b c"), (2, "s", "solo"), (3, "s", "  ")])
    out = (
        dsir.gram_stream(df, ["doc_id"])
        .groupBy("doc_id")
        .count()
        .collect()
    )
    got = {r["doc_id"]: r["count"] for r in out}
    # t tokens -> t unigrams + (t-1) bigrams; empty text -> the single
    # '' token (both engines), so every doc emits >= 1 gram
    assert got == {1: 5, 2: 1, 3: 1}


def test_gram_stream_bigrams_are_space_joined(spark):
    df = _docs(spark, [(1, "s", "A  b\tC")])
    grams = {r["g"] for r in dsir.gram_stream(df, ["doc_id"]).collect()}
    assert grams == {"a", "b", "c", "a b", "b c"}


def test_weights_identity_when_target_equals_raw(spark, corpus):
    target, _ = corpus
    w = dsir.dsir_weights(target, target, buckets=64).collect()
    assert w, "non-empty corpus must produce buckets"
    assert all(r["ratio"] == 1.0 for r in w)
    assert all(r["ct"] == r["cr"] for r in w)


def test_weights_ratio_is_exact_smoothed_quotient(spark, corpus):
    target, raw = corpus
    B = 64
    rows = dsir.dsir_weights(target, raw, buckets=B).collect()
    nt = sum(r["ct"] for r in rows)
    nr = sum(r["cr"] for r in rows)
    for r in rows:
        expect = ((r["ct"] + 1.0) / (nt + float(B))) / (
            (r["cr"] + 1.0) / (nr + float(B))
        )
        assert r["ratio"] == expect  # bit-exact: only * and / of exact doubles


def test_scores_monotone_toward_target(spark, corpus):
    target, raw = corpus
    w = dsir.dsir_weights(target, raw, buckets=4096)
    sc = {
        r["doc_id"]: r["logw"]
        for r in dsir.dsir_scores(raw, w, buckets=4096).collect()
    }
    # the target-like doc must outscore the disjoint-vocabulary docs
    assert sc[100] > sc[101]
    assert sc[100] > max(sc[i] for i in range(102, 110))


def test_scores_gram_count_matches_stream(spark, corpus):
    target, raw = corpus
    w = dsir.dsir_weights(target, raw, buckets=4096)
    out = dsir.dsir_scores(raw, w, buckets=4096)
    got = {r["doc_id"]: r["n_grams"] for r in out.collect()}
    stream = (
        dsir.gram_stream(raw, ["doc_id"]).groupBy("doc_id").count().collect()
    )
    assert got == {r["doc_id"]: r["count"] for r in stream}
    # inner join lost nothing: every raw gram's bucket exists in the
    # weight table by construction (its own occurrence counted it)


def test_select_respects_k_and_is_deterministic(spark, corpus):
    target, raw = corpus
    a = dsir.dsir_select(raw, target, 3).collect()
    b = dsir.dsir_select(raw, target, 3).collect()
    assert len(a) == 3
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_select_prefers_target_like_docs(spark, corpus):
    target, raw = corpus
    picked = {r["doc_id"] for r in dsir.dsir_select(raw, target, 1).collect()}
    assert picked == {100}


def test_select_identity_law_reduces_to_gumbel_coin(spark, corpus):
    """target == raw -> logw ~ 0 for every doc, so selection must be
    the pure Gumbel coin order (uniform sampling without replacement),
    recomputable from the md5 coin alone."""
    from promi_spark.operators.split import coin_hex

    _, raw = corpus
    picked = [
        r["doc_id"] for r in dsir.dsir_select(raw, raw, 4, seed=7).collect()
    ]
    coins = raw.select(
        "doc_id",
        (
            (F.conv(coin_hex(F.col("doc_id"), 7, salt="dsirsel"), 16, 10)
             .cast("double") + 0.5) / F.lit(4294967296.0)
        ).alias("u"),
    ).collect()
    # key = logw - ln(-ln u); logw identical across docs up to float
    # noise, so order = descending -ln(-ln u) = ascending ln(-ln u)
    expect = [
        r["doc_id"]
        for r in sorted(coins, key=lambda r: (math.log(-math.log(r["u"]))))
    ][:4]
    assert set(picked) == set(expect)


def test_empty_raw_or_bad_params(spark, corpus):
    target, raw = corpus
    empty = raw.filter(F.lit(False))
    assert dsir.dsir_select(empty, target, 5).count() == 0
    with pytest.raises(ValueError):
        dsir.dsir_weights(target, raw, buckets=1)
    with pytest.raises(ValueError):
        dsir.dsir_weights(target, raw, smoothing=0.0)
    with pytest.raises(ValueError):
        dsir.dsir_select(raw, target, 0)


def test_plan_shape_jvm_side_broadcast(spark, corpus):
    """Scoring stays JVM-side (no Python eval nodes), the weight table
    joins as a broadcast, and the per-doc sum is the only aggregate
    exchange over the gram stream."""
    target, raw = corpus
    w = dsir.dsir_weights(target, raw, buckets=512)
    plan = (
        dsir.dsir_scores(raw, w, buckets=512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_gram_stream_null_text_scores_like_empty(spark):
    """NULL text coalesces to '' before tokenization: the doc emits the
    single empty-token gram instead of vanishing from the stream (and
    the DuckDB oracle coalesces identically)."""
    df = spark.createDataFrame(
        [(1, "s", None), (2, "s", "")],
        "doc_id int, source string, text string",
    )
    out = dsir.gram_stream(df, ["doc_id"]).collect()
    got = {(r["doc_id"], r["g"]) for r in out}
    assert got == {(1, ""), (2, "")}


def test_dsir_select_gumbel_hashes_full_key_tuple(spark):
    """Composite keys with a repeated first column draw DISTINCT Gumbel
    noise per row (the ADVICE r10 fix): selection over (doc_id, source)
    where every doc_id repeats must not collapse to per-doc_id ties —
    both (doc, src) rows of the same doc_id can never tie on the coin,
    and the selected set depends on source, not doc_id alone."""
    rows = [
        (i, src, f"w{i} common tok{i % 3}")
        for i in range(12)
        for src in ("a", "b")
    ]
    docs = spark.createDataFrame(
        rows, "doc_id int, source string, text string"
    )
    target = docs.filter(F.col("source") == "a")
    got = dsir.dsir_select(
        docs, target, 8, key_cols=["doc_id", "source"]
    ).collect()
    assert len(got) == 8
    picked = {(r["doc_id"], r["source"]) for r in got}
    # with per-first-key coins, each doc_id's two rows would share
    # identical noise AND identical logw (same text) -> the orderBy
    # tie-break would always pick source 'a' first; full-tuple coins
    # make a mixed selection overwhelmingly likely (deterministic here)
    assert {s for _, s in picked} == {"a", "b"}
