"""Statistics aggregation (reference ``src/stream/stats.rs:64-141``).

The reference's ``StatsCollector`` streams once over the log keeping a
per-trace event-count vector plus a total event counter, and releases a
``Statistics`` artifact with ``counts() = [n_traces, n_events_in_traces,
n_events_total]`` at end-of-stream (standalone events = total − in-trace,
``stats.rs:104``).

Spark-first: both products are single hash aggregations — partial
(map-side) + final, one shuffle. The per-trace vector stays distributed
(a DataFrame keyed by case_id); only the 3-counter summary is collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from promi_spark.log import EventLog


@dataclass
class Statistics:
    """The artifact (reference ``stats.rs:24-62``)."""

    n_traces: int
    n_events_in_traces: int
    n_events_total: int

    def counts(self) -> list[int]:
        return [self.n_traces, self.n_events_in_traces, self.n_events_total]

    @property
    def n_standalone_events(self) -> int:
        return self.n_events_total - self.n_events_in_traces


def stats_df(log: EventLog) -> DataFrame:
    """The counts as a 1-row DataFrame (keeps the pipeline lazy)."""
    return log.df.agg(
        F.count_distinct(F.col("case_id")).alias("n_traces"),
        F.count(F.col("case_id")).alias("n_events_in_traces"),
        F.count(F.lit(1)).alias("n_events_total"),
    )


def per_trace_counts(log: EventLog) -> DataFrame:
    """Per-trace event-count vector (reference keeps Vec<usize>;
    distributed here)."""
    return (
        log.trace_events()
        .groupBy("case_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def collect_statistics(log: EventLog) -> Statistics:
    """Run the aggregation (the artifact-release action,
    reference ``observer.rs:44-47``)."""
    row = stats_df(log).collect()[0]
    return Statistics(
        n_traces=row["n_traces"],
        n_events_in_traces=row["n_events_in_traces"],
        n_events_total=row["n_events_total"],
    )


def activity_dow_cube(log: EventLog) -> DataFrame:
    """CUBE aggregation over (activity, day-of-week): counts + distinct
    cases at every grouping-set level (per cell, per activity, per dow,
    grand total). The reference has no grouping-sets surface (SURVEY
    §2.4 note) — Spark's ``cube`` gives it for free, with partial
    aggregation per grouping set map-side, one exchange.

    NULL dims mark rolled-up levels (both engines use the same
    convention); input rows with NULL activity/ts are excluded so a
    NULL dim is unambiguously a subtotal marker.
    """
    ev = log.trace_events().filter(
        F.col("activity").isNotNull() & F.col("ts").isNotNull()
    )
    return (
        ev.withColumn("dow", F.dayofweek("ts"))
        .cube("activity", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("case_id").alias("n_cases"),
        )
    )


def value_outliers(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    z: float = 2.0,
    min_events: int = 3,
) -> DataFrame:
    """Per-key z-score outliers: events whose value sits more than
    ``z`` population standard deviations from their key's mean.
    Anomaly surface over the raw events table (the reference's
    statistics artifact family, ``observer.rs:44-47``, extended to
    per-entity dispersion).

    Engine-portable float discipline: mean and variance derive from
    DECIMAL-EXACT window sums (n, sum v, sum v^2 over the 2-dp cast),
    cast to double only for the final IEEE-deterministic arithmetic —
    so Spark and any ANSI engine compute bit-identical z-scores
    regardless of aggregation order. ONE shuffle: all three sums share
    the same unbounded per-key window; no join-back of a separate
    aggregate. Keys with fewer than ``min_events`` rows or zero
    variance emit nothing.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col)
    v = F.col(value_col).cast("decimal(18,2)")
    base = (
        events.filter(F.col(value_col).isNotNull())
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s1", F.sum(v).over(w).cast("double"))
        .withColumn("s2", F.sum(v * v).over(w).cast("double"))
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")
    zscore = (F.col(value_col).cast("decimal(18,2)").cast("double") - mean) / F.sqrt(var)
    return (
        base.withColumn("zscore", zscore)
        .filter(
            (F.col("n") >= min_events)
            & (F.col("s2") * F.col("n") > F.col("s1") * F.col("s1"))
            & (F.abs(F.col("zscore")) > z)
        )
        .select(
            "event_id",
            F.col(key_col),
            F.round(F.col(value_col).cast("decimal(18,2)").cast("double"), 2).alias("value"),
            F.round("zscore", 6).alias("zscore"),
        )
    )


def value_histogram(
    events: DataFrame,
    bin_width: float = 10.0,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Fixed-width value histogram per group: (group, bin, lo, n) with
    ``bin = floor(value / bin_width)`` — the profile behind dashboards
    and outlier thresholds. One map-side-combining aggregate on
    (group, bin); bin edges computed from the 2-dp decimal cast so
    boundary values land in the same bin in every engine.
    """
    v = F.col(value_col).cast("decimal(18,2)")
    b = F.floor(v / F.lit(bin_width)).cast("bigint")
    return (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("grp").alias(group_col),
            "bin",
            F.round((F.col("bin") * bin_width).cast("double"), 2).alias("lo"),
            "n",
        )
    )


def value_hour_correlation(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group Pearson correlation between hour-of-day and value —
    daily-seasonality detection. Returns (group, n, corr).

    Engine-portable float discipline (same contract as
    ``value_outliers``): the six sufficient statistics (n, Σx, Σy,
    Σxy, Σx², Σy²) accumulate as EXACT integers/decimals — so shuffle
    and combine order cannot perturb them — and the correlation is one
    IEEE double expression over those exact inputs, bit-identical in
    any ANSI engine. A built-in ``corr`` aggregate would stream float
    co-moments in partition order and hash-mismatch across engines.
    One map-side-combining aggregate; zero-variance groups yield NULL.
    """
    x = F.hour(F.col(ts_col).cast("timestamp")).cast("long")
    y = F.col(value_col).cast("decimal(18,2)")
    agg = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(x * x).alias("sxx"),
            F.sum(y).alias("sy"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = n * F.col("sxy").cast("double") - sx * sy
    vx = n * F.col("sxx").cast("double") - sx * sx
    vy = n * F.col("syy").cast("double") - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy))
    )
    return agg.select(group_col, "n", F.round(corr, 6).alias("corr"))
