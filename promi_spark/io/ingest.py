"""Parquet ingest for the driver's synthetic tables.

The scan is the cheapest operator we have — keep it declarative so
Catalyst pushes filters/projection into the parquet reader (check
``PushedFilters`` / ``ReadSchema`` in ``.explain("formatted")``). At
100 TB these tables would be partitioned (events by date, lineitem by
ship date) and the same code path picks up partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from promi_spark.log import EventLog
from promi_spark.schema import Meta

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # Set on the *caller's* session, not just our builder: a vanilla
    # SparkSession rejects parquet TIMESTAMP(NANOS) columns with
    # PARQUET_TYPE_ILLEGAL unless this runtime SQL conf is on. The column
    # then arrives as LongType and _convert_nanos restores timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _convert_nanos(df, f"{sf_dir}/{name}.parquet")


def _convert_nanos(df: DataFrame, path: str) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as LongType under
    ``spark.sql.legacy.parquet.nanosAsLong``; truncate ns -> us like
    DuckDB/Arrow do so both engines see identical values."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    try:
        arrow_schema = pq.read_schema(path)
    except Exception:
        return df
    for field in arrow_schema:
        if str(field.type) == "timestamp[ns]" and field.name in df.columns:
            # integer `div`, NOT `/`: ns-since-epoch (~1.7e18) exceeds the
            # 2^53 double mantissa, so float division is off by ±1us
            df = df.withColumn(
                field.name, F.expr(f"timestamp_micros(`{field.name}` div 1000)")
            )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def load_event_log(
    spark: SparkSession, sf_dir: str | None = None, meta: Meta | None = None
) -> EventLog:
    """Read the driver's ``events`` table through the event-log lens:
    user_id -> case_id, event_type -> activity, ts -> ts; ``seq`` by
    ``(ts, event_id)`` within each case. ``event_id/value/props`` are
    carried as extra columns for filter/agg operators."""
    df = load_table(spark, "events", sf_dir)
    return EventLog.from_generic(
        df,
        case_col="user_id",
        activity_col="event_type",
        ts_col="ts",
        order_cols=["event_id"],
        keep=["event_id", "value", "props"],
        meta=meta,
    )
