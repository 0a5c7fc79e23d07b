"""Bucketed-table storage (operators/scale.py): the prepaid-shuffle
layout. Correctness is row equality with the plain-parquet path;
the SCALE claims (join, agg, and sequence-window on the bucket key
plan NO Exchange) are asserted against the physical plan, the same
way test_plan_shapes.py pins the query registry. Complements
test_scale.py::test_bucketed_join_elides_exchanges with the events
layout, the bucket-count-mismatch caveat, spec introspection, and
the one-file-per-bucket write shape."""

import pytest
from pyspark.sql import functions as F

from promi_spark.io import load_event_log
from promi_spark.operators.scale import (
    bucket_spec,
    write_bucketed,
    write_events_bucketed,
)


def explain(df) -> str:
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return je.explainString(mode.fromString("formatted"))


@pytest.fixture(scope="module")
def events_table(spark, sf_dir, tmp_path_factory):
    log = load_event_log(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("bkt") / "events_bucketed")
    write_events_bucketed(log, "t_events_bkt", n_buckets=8, path=path)
    yield "t_events_bkt"
    spark.sql("DROP TABLE IF EXISTS t_events_bkt")


@pytest.fixture(scope="module")
def orders_tables(spark, sf_dir, tmp_path_factory):
    """orders + lineitem co-bucketed on the join key."""
    base = tmp_path_factory.mktemp("bkt2")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "t_orders_bkt", "o_orderkey", 8, path=str(base / "o"))
    write_bucketed(
        lineitem, "t_lineitem_bkt", "l_orderkey", 8, path=str(base / "l")
    )
    yield "t_orders_bkt", "t_lineitem_bkt"
    spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def test_roundtrip_and_spec(spark, sf_dir, events_table):
    log = load_event_log(spark, sf_dir)
    back = spark.table(events_table)
    assert back.count() == log.df.count()
    # exact row multiset on the key columns
    a = log.df.groupBy("case_id").agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    )
    b = back.groupBy("case_id").agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    spec = bucket_spec(spark, events_table)
    assert spec == {
        "n_buckets": 8,
        "bucket_cols": ["case_id"],
        "sort_cols": ["case_id", "seq"],
    }


def test_groupby_on_bucket_key_plans_no_exchange(spark, events_table):
    df = spark.table(events_table).groupBy("case_id").count()
    plan = explain(df)
    assert "Exchange" not in plan, plan
    assert "Scan" in plan and "Bucketed: true" in plan


def test_window_on_bucket_key_plans_no_exchange(spark, events_table):
    """The W-family shape: a sequence window partitioned by case_id
    rides the bucketed scan — no Exchange; the in-bucket (case_id,
    seq) sort order also satisfies the window's required ordering."""
    from pyspark.sql import Window

    w = Window.partitionBy("case_id").orderBy("seq")
    df = spark.table(events_table).select(
        "case_id", "seq", F.lag("activity").over(w).alias("prev")
    )
    plan = explain(df)
    # the decisive claim is no shuffle; in-bucket sort elision is not
    # pinned because file-splitting can legitimately reintroduce a
    # local (non-exchange) sort on some layouts
    assert "Exchange" not in plan, plan


def test_cobucketed_join_plans_no_exchange_and_matches(
    spark, sf_dir, orders_tables
):
    t_orders, t_lineitem = orders_tables
    o = spark.table(t_orders)
    l = spark.table(t_lineitem)
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    # At test scale orders fits the broadcast threshold and Catalyst
    # (correctly) broadcasts — which hides the co-location this layout
    # buys. Plan with broadcast off to see the at-scale shape, where
    # neither fact table broadcasts and co-bucketing is what removes
    # the two join exchanges.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join itself is exchange-free; the only exchange allowed in
    # the whole plan is the final small groupBy on o_orderpriority
    import re

    exchanges = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(exchanges) == 1, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    # equality with the plain-parquet path (which pays 2 join shuffles)
    plain = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_mismatched_bucket_counts_reintroduce_shuffle(
    spark, sf_dir, orders_tables, tmp_path_factory
):
    """The operational caveat bucket_spec exists for: a 4-bucket table
    joined to an 8-bucket table cannot co-locate — Spark shuffles (at
    least one side) again. Pinned so the docstring's rule stays true
    on Spark upgrades."""
    t_orders, _ = orders_tables
    path = str(tmp_path_factory.mktemp("bkt3") / "l4")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(lineitem, "t_lineitem_bkt4", "l_orderkey", 4, path=path)
    try:
        o = spark.table(t_orders)
        l4 = spark.table("t_lineitem_bkt4")
        plan = explain(l4.join(o, l4.l_orderkey == o.o_orderkey))
        assert "Exchange" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt4")


def test_one_file_per_bucket(spark, events_table):
    """write_bucketed's repartition-before-write claim: at most one
    data file per bucket, not n_buckets x write-tasks."""
    import os

    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {events_table}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]
        .data_type
    )
    path = loc.removeprefix("file:")
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    # bucket id is the _000NN suffix; an empty bucket writes no file,
    # so the claim is one-file-per-NON-EMPTY-bucket, never multiple
    # writer files landing in the same bucket
    buckets = [f.rsplit("_", 1)[1].split(".")[0] for f in files]
    assert len(buckets) == len(set(buckets)) and 0 < len(files) <= 8, files
