"""Two-pass exact heavy hitters (operators/sketch.py): the Misra-Gries
superset guarantee, exact-count equivalence with GROUP BY ... HAVING,
and the bounded-shuffle plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from promi_spark.operators.sketch import heavy_hitters, mg_candidates


def _stream(spark, items, partitions=8):
    return spark.createDataFrame(
        [(x,) for x in items], "token string"
    ).repartition(partitions)


def _exact(items, min_count):
    from collections import Counter

    return {
        k: v for k, v in Counter(items).items() if v >= min_count and k is not None
    }


@pytest.fixture(scope="module")
def zipf_items():
    rng = random.Random(42)
    items = []
    # skewed head + long singleton tail, shuffled across partitions
    for i in range(20):
        items += [f"hot{i}"] * (400 - 15 * i)
    items += [f"tail{j}" for j in range(5000)]
    rng.shuffle(items)
    return items


def test_mg_candidates_superset_guarantee(spark, zipf_items):
    n = len(zipf_items)
    min_count = 100
    capacity = n // min_count + 1
    cands = {
        r["item"]
        for r in mg_candidates(
            _stream(spark, zipf_items), "token", capacity
        ).collect()
    }
    truth = set(_exact(zipf_items, min_count))
    assert truth <= cands, truth - cands


def test_mg_candidates_est_lower_bounds_true_count(spark, zipf_items):
    from collections import Counter

    truth = Counter(zipf_items)
    rows = mg_candidates(_stream(spark, zipf_items), "token", 500).collect()
    # per-partition summaries union: summed est never exceeds truth
    agg = {}
    for r in rows:
        agg[r["item"]] = agg.get(r["item"], 0) + r["est"]
    assert all(est <= truth[item] for item, est in agg.items())


def test_heavy_hitters_equals_group_by_having(spark, zipf_items):
    out = heavy_hitters(_stream(spark, zipf_items), "token", min_count=100)
    got = {r["token"]: r["n_occurrences"] for r in out.collect()}
    assert got == _exact(zipf_items, 100)


def test_heavy_hitters_min_frac_form(spark, zipf_items):
    import math

    n = len(zipf_items)
    frac = 0.005
    out = heavy_hitters(_stream(spark, zipf_items), "token", min_frac=frac)
    got = {r["token"]: r["n_occurrences"] for r in out.collect()}
    assert got == _exact(zipf_items, math.ceil(n * frac))


def test_heavy_hitters_tiny_capacity_still_exact(spark):
    """Adversarial: capacity barely above n/min_count, heavies split
    across every partition, equal-count ties at the threshold."""
    items = ["a"] * 50 + ["b"] * 50 + ["c"] * 49 + [f"t{i}" for i in range(851)]
    random.Random(7).shuffle(items)
    n = len(items)  # 1000
    out = heavy_hitters(
        _stream(spark, items, partitions=16),
        "token",
        min_count=50,
        capacity=n // 50 + 1,
    )
    got = {r["token"]: r["n_occurrences"] for r in out.collect()}
    assert got == {"a": 50, "b": 50}


def test_heavy_hitters_excludes_nulls(spark):
    df = spark.createDataFrame(
        [("x",)] * 10 + [(None,)] * 50, "token string"
    ).repartition(4)
    got = {
        r["token"]: r["n_occurrences"]
        for r in heavy_hitters(df, "token", min_count=5).collect()
    }
    assert got == {"x": 10}


def test_heavy_hitters_param_validation(spark):
    df = _stream(spark, ["a"], partitions=1)
    with pytest.raises(ValueError):
        heavy_hitters(df, "token")
    with pytest.raises(ValueError):
        heavy_hitters(df, "token", min_count=5, min_frac=0.1)
    with pytest.raises(ValueError):
        heavy_hitters(df, "token", min_frac=1.5)
    with pytest.raises(ValueError):
        heavy_hitters(df, "token", min_count=0)
    with pytest.raises(ValueError):
        mg_candidates(df, "token", 0)


def test_heavy_hitters_long_items(spark):
    """Non-string key type: heavy hitters over a long column."""
    items = [1] * 30 + [2] * 20 + list(range(100, 400))
    df = spark.createDataFrame([(x,) for x in items], "k long").repartition(6)
    got = {
        r["k"]: r["n_occurrences"]
        for r in heavy_hitters(df, "k", min_count=20).collect()
    }
    assert got == {1: 30, 2: 20}


def test_plan_candidate_filter_before_exchange(spark, zipf_items):
    """The verify pass broadcast-semi-joins the candidate set BELOW the
    count aggregate: only candidate rows reach the exchange."""
    plan = (
        heavy_hitters(_stream(spark, zipf_items), "token", min_count=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the sketch pass is the only Python node
    assert plan.count("MapInPandas") == 1


# ---- pure-Python property tests of the MG guarantee (no Spark) -------------


def test_mg_update_guarantee_property():
    """Hypothesis-style sweep without Spark: over random streams,
    batch splits, and capacities, every item's summary undercount is
    bounded by n / capacity — the inequality the two-pass exactness
    rests on — and the summary never exceeds capacity entries."""
    from collections import Counter

    from promi_spark.operators.sketch import mg_update

    rng = random.Random(123)
    for trial in range(200):
        alphabet = rng.randint(1, 30)
        n = rng.randint(1, 400)
        stream = [f"i{rng.randint(0, alphabet)}" for _ in range(n)]
        capacity = rng.randint(1, 12)
        counts = {}
        i = 0
        while i < len(stream):
            j = i + rng.randint(1, 50)
            counts = mg_update(
                counts, Counter(stream[i:j]).items(), capacity
            )
            i = j
        assert len(counts) <= capacity
        truth = Counter(stream)
        bound = n / capacity
        for item, true_c in truth.items():
            est = counts.get(item, 0)
            assert est <= true_c
            assert true_c - est <= bound, (
                f"trial {trial}: {item} true={true_c} est={est} "
                f"bound={bound}"
            )


def test_mg_update_hypothesis():
    """The same invariant under hypothesis' adversarial generation."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from promi_spark.operators.sketch import mg_update

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(0, 9), min_size=1, max_size=300),
        st.integers(1, 8),
        st.integers(1, 40),
    )
    def run(stream, capacity, batch_size):
        counts = {}
        for i in range(0, len(stream), batch_size):
            counts = mg_update(
                counts, Counter(stream[i : i + batch_size]).items(), capacity
            )
        assert len(counts) <= capacity
        truth = Counter(stream)
        for item, true_c in truth.items():
            est = counts.get(item, 0)
            assert est <= true_c
            assert true_c - est <= len(stream) / capacity

    run()


def test_heavy_hitters_min_count_validated_on_both_paths(spark, zipf_items):
    """min_count < 1 raises whether or not the caller supplies an
    explicit capacity (the capacity branch used to skip validation and
    silently return every candidate)."""
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(zipf_items, "item", min_count=0)
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(zipf_items, "item", min_count=0, capacity=64)
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(zipf_items, "item", min_count=-3, capacity=64)


def test_mg_summary_sentinel_rows_carry_exact_stream_size(spark):
    """r15: the min_frac path derives the exact stream size from the
    sketch pass's per-partition NULL-sentinel rows instead of a
    separate full count() scan — the sum of sentinel counts must equal
    the exact non-null row count, candidates must be unchanged, and
    the heavy_hitters output must still equal GROUP BY ... HAVING."""
    from pyspark.sql import functions as F

    from promi_spark.operators.sketch import _mg_summaries, heavy_hitters

    df = spark.range(3000).select(
        F.when(F.col("id") % 17 == 0, None)
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 23).cast("string")))
        .alias("item")
    ).repartition(5)
    exact_n = df.filter(F.col("item").isNotNull()).count()

    rows = _mg_summaries(df, "item", capacity=8, with_rows=True).collect()
    assert sum(r["est"] for r in rows if r["item"] is None) == exact_n
    # sentinel rows do not change the candidate summaries
    plain = _mg_summaries(df, "item", capacity=8, with_rows=False).collect()
    assert sorted(
        (r["item"], r["est"]) for r in rows if r["item"] is not None
    ) == sorted((r["item"], r["est"]) for r in plain)

    got = {
        (r["item"], r["n_occurrences"])
        for r in heavy_hitters(df, "item", min_frac=0.03).collect()
    }
    want = {
        (r["item"], r["n"])
        for r in df.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= exact_n * 0.03)
        .collect()
    }
    assert got == want and got
