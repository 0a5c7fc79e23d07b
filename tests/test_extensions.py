"""Pluggable extension registry (reference extension/mod.rs:59-115):
user-registered extensions contribute typed views, value vocabularies,
and semantic validators that validate() picks up from the log header."""

import pytest
from pyspark.sql import functions as F

from promi_spark import extensions as X
from promi_spark.log import EventLog
from promi_spark.operators.validate import validate
from promi_spark.schema import Meta


@pytest.fixture
def cost_spec():
    spec = X.ExtensionSpec(
        name="Cost",
        prefix="cost",
        uri="http://example.org/cost.xesext",
        keys={"total": "float", "currency": "string"},
        allowed={"currency": ("EUR", "USD")},
    )
    X.register_extension(spec, replace=True)
    yield spec
    X._REGISTRY.pop("cost", None)


def _cost_log(spark, meta):
    rows = [
        ("c1", 0, "a", {"cost:total": "12.5", "cost:currency": "EUR"}),
        ("c1", 1, "b", {"cost:total": "oops", "cost:currency": "USD"}),
        ("c2", 0, "a", {"cost:total": "3.0", "cost:currency": "DOGE"}),
    ]
    df = spark.createDataFrame(
        rows, "case_id string, seq long, activity string, attrs map<string,string>"
    )
    return EventLog.from_events(df, meta=meta)


def test_register_rejects_duplicate_prefix(cost_spec):
    with pytest.raises(ValueError):
        X.register_extension(cost_spec)


def test_extension_view_typed_columns(spark, cost_spec):
    log = _cost_log(spark, Meta())
    view = X.extension_view(log, "cost")
    assert "cost_total" in view.columns and "cost_currency" in view.columns
    rows = {
        (r["case_id"], r["seq"]): (r["cost_total"], r["cost_currency"])
        for r in view.collect()
    }
    assert rows[("c1", 0)] == (12.5, "EUR")
    assert rows[("c1", 1)] == (None, "USD")  # uncastable -> NULL, typed
    assert dict(view.dtypes)["cost_total"] == "double"


def test_extension_violations_lexical_and_vocabulary(spark, cost_spec):
    log = _cost_log(spark, Meta())
    v = {
        (r["case_id"], r["seq"], r["violation"])
        for r in X.extension_violations(log, cost_spec).collect()
    }
    assert ("c1", 1, "ext:cost:total:lexical") in v
    assert ("c2", 0, "ext:cost:currency:vocabulary") in v
    assert not any(c == "c1" and s == 0 for c, s, _ in v)


def test_validate_picks_up_declared_registered_extension(spark, cost_spec):
    meta = Meta(extensions=[cost_spec.decl()])
    log = _cost_log(spark, meta)
    got = {r["violation"] for r in validate(log).collect()}
    assert "ext:cost:total:lexical" in got
    assert "ext:cost:currency:vocabulary" in got
    # undeclared in meta -> not checked
    silent = validate(_cost_log(spark, Meta()))
    assert not any(
        r["violation"].startswith("ext:cost") for r in silent.collect()
    )


def test_lifecycle_vocabulary_is_registered(spark):
    spec = X.get_extension("lifecycle")
    rows = [
        ("c1", 0, "a", "complete"),
        ("c1", 1, "b", "weird-state"),
    ]
    df = spark.createDataFrame(
        rows, "case_id string, seq long, activity string, lifecycle string"
    )
    log = EventLog.from_events(df, meta=Meta(extensions=[spec.decl()]))
    got = {
        (r["seq"], r["violation"])
        for r in validate(log).collect()
        if r["violation"].startswith("ext:lifecycle")
    }
    assert got == {(1, "ext:lifecycle:transition:vocabulary")}


def test_custom_semantic_validator_runs(spark):
    def no_negative_totals(log):
        return (
            log.df.filter(
                F.element_at("attrs", "cost:total").cast("double") < 0
            )
            .select(
                "case_id", "seq", F.lit("cost:negative-total").alias("violation")
            )
        )

    spec = X.register_extension(
        X.ExtensionSpec(
            name="Cost2",
            prefix="cost2",
            uri="http://example.org/cost2.xesext",
            keys={},
            validator=no_negative_totals,
        ),
        replace=True,
    )
    try:
        rows = [("c1", 0, "a", {"cost:total": "-4"})]
        df = spark.createDataFrame(
            rows,
            "case_id string, seq long, activity string, attrs map<string,string>",
        )
        log = EventLog.from_events(df, meta=Meta(extensions=[spec.decl()]))
        got = {r["violation"] for r in validate(log).collect()}
        assert "cost:negative-total" in got
    finally:
        X._REGISTRY.pop("cost2", None)
