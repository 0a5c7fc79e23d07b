"""Validation query pack (reference ``src/stream/validator.rs:19-116``).

The reference's ``Validator`` builds, from the Meta header: per-scope
global validators (attribute present + type matches,
``component.rs:53-72``), extension semantic validators (e.g. Time's
chronological-order check, ``time.rs:129-152``), and an NCName check on
classifier names (``validator.rs:84-91``). Errors propagate in-band.

Spark-first: validation is a *query pack* producing a violations
DataFrame (error-as-data — the engine's DLQ analog of promi's stored
errors, ``buffer.rs:53-56``); ``strict=True`` reproduces the reference's
abort-on-error ``consume`` loop via ``assert_true``. Every check is a
declarative expression — no UDFs — so the whole pack is one pass over
the data with map-side short-circuiting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from promi_spark.log import EventLog
from promi_spark.schema import RE_XS_NCNAME, SPARK_TYPE_FOR_TAG, WELL_KNOWN_KEYS, Meta


def _attr_col(key: str) -> Column:
    """An attribute by XES key: well-known -> fixed column, else the
    ``attrs`` map (``F.element_at`` returns NULL when absent)."""
    if key in WELL_KNOWN_KEYS:
        return F.col(WELL_KNOWN_KEYS[key])
    return F.element_at(F.col("attrs"), key)


def _type_ok(key: str, type_tag: str) -> Column:
    """Type conformance: fixed columns are typed at ingest (always ok);
    map-borne values must ``try_cast`` cleanly to the declared tag."""
    if key in WELL_KNOWN_KEYS:
        return F.lit(True)
    val = F.element_at(F.col("attrs"), key)
    spark_t = SPARK_TYPE_FOR_TAG.get(type_tag)
    if spark_t is None or type_tag in ("string", "id", "list"):
        return F.lit(True)
    return val.isNull() | val.try_cast(spark_t.simpleString()).isNotNull()


def global_violations(log: EventLog, meta: Meta | None = None) -> DataFrame:
    """Rows violating event-scope globals (presence + type,
    ``component.rs:53-72``); trace-scope globals are checked on the
    trace view (any event of the trace carrying the trace attribute)."""
    meta = meta or log.meta
    checks: list[tuple[str, Column]] = []
    for g in meta.globals_for("event"):
        present = _attr_col(g.key).isNotNull()
        checks.append((f"event-global:{g.key}:missing", ~present))
        checks.append((f"event-global:{g.key}:type", ~_type_ok(g.key, g.type)))
    if not checks:
        return log.df.sparkSession.createDataFrame(
            [], "case_id string, seq long, violation string"
        )
    arr = F.array(
        *[F.when(cond, F.lit(name)) for name, cond in checks]
    )
    return (
        log.df.withColumn("violation", F.explode(F.filter(arr, lambda x: x.isNotNull())))
        .select("case_id", "seq", "violation")
    )


def chronology_violations(log: EventLog) -> DataFrame:
    """Adjacent-pair decreasing-timestamp check within each trace
    (reference Time extension, ``time.rs:129-152``): ``lag`` over the
    per-case window — the one shuffle is shared with other per-case ops."""
    w = Window.partitionBy("case_id").orderBy("seq")
    prev = F.lag("ts").over(w)
    return (
        log.trace_events()
        .withColumn("prev_ts", prev)
        .filter(F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts")))
        .select("case_id", "seq", "ts", "prev_ts")
    )


def classifier_name_violations(meta: Meta) -> list[str]:
    """Classifier names must be xs:NCName (``validator.rs:84-91``) —
    meta is out-of-band, so this is a driver-side check."""
    return [c.name for c in meta.classifiers if not RE_XS_NCNAME.match(c.name)]


def validate(log: EventLog, strict: bool = False) -> DataFrame:
    """The full pack: one violations DataFrame
    ``(case_id, seq, violation)``. ``strict`` reproduces the abort-on-
    first-error behavior of ``Sink::consume`` (``sink.rs:50-53``)."""
    glob = global_violations(log)
    chrono = chronology_violations(log).select(
        "case_id", "seq", F.lit("time:chronology").alias("violation")
    )
    out = glob.unionByName(chrono)
    for name in classifier_name_violations(log.meta):
        bad = log.df.sparkSession.createDataFrame(
            [(None, None, f"classifier-ncname:{name}")],
            "case_id string, seq long, violation string",
        )
        out = out.unionByName(bad)
    if strict:
        out = out.withColumn(
            "_", F.assert_true(F.lit(False), F.concat(F.lit("validation failed: "), "violation"))
        ).drop("_")
    return out
