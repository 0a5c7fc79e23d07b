"""Validator parity with the reference's validation tests
(validator.rs:118-149, observer.rs:350-375): the three fixtures the
reference actively rejects must be flagged, and the correct corpus must
validate clean."""

import glob
import os

import pytest

CORPUS = "/root/reference/static/xes"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not available"
)


def _validate(spark, path):
    from promi_spark.io.xes import read_xes
    from promi_spark.operators.validate import validate

    log = read_xes(spark, path)
    return [r["violation"] for r in validate(log).collect()]


def test_globals_presence_violation(spark):
    """reference validator.rs:131-137: event missing
    lifecycle:transition required by the event global."""
    v = _validate(spark, f"{CORPUS}/non_validating/globals_violation_type.xes")
    assert any("lifecycle:transition:missing" in x for x in v)


def test_globals_type_violation(spark):
    """reference validator.rs:140-147: org:resource declared String,
    event carries it as Int."""
    v = _validate(spark, f"{CORPUS}/non_validating/event_incorrect_type.xes")
    assert any("org:resource:type" in x for x in v)


def test_misplaced_trace_event_order(spark):
    """reference observer.rs:361: trace after a standalone event
    violates the Meta<Trace<Event state machine."""
    v = _validate(spark, f"{CORPUS}/non_validating/misplaced_trace_event.xes")
    assert any(x.startswith("order:") for x in v)


def test_incorrect_classifier_name_flagged(spark):
    v = _validate(
        spark, f"{CORPUS}/non_validating/classifier_incorrect_names.xes"
    )
    assert "classifier-ncname:Invalid Name" in v


def test_chronology_violation_flagged(spark):
    v = _validate(spark, f"{CORPUS}/non_validating/event_incorrect_order.xes")
    assert "time:chronology" in v


def test_extension_full_validates_clean(spark):
    """The one fixture the reference's validator test requires to pass
    (validator.rs:126-128). 'correct/' only guarantees PARSE
    correctness — e.g. trace_correct_attributes declares event globals
    its events don't satisfy."""
    assert _validate(spark, f"{CORPUS}/test/extension_full.xes") == []


def test_correct_corpus_parses_with_bounded_violations(spark):
    """Every correct/ fixture validates without crashing; violations
    (if any) are only the declared-global kind the reference would also
    report."""
    for path in sorted(glob.glob(f"{CORPUS}/correct/*.xes")):
        for v in _validate(spark, path):
            assert v.split(":")[0] in ("event-global", "trace-global"), (
                path, v,
            )


@pytest.mark.parametrize("name", ["L1.xes", "L2.xes", "L3.xes", "L4.xes", "L5.xes"])
def test_book_logs_validate_clean(spark, name):
    assert _validate(spark, f"{CORPUS}/book/{name}") == []


def test_bigger_example_needs_repair(spark):
    """bigger-example's classifier name has spaces — invalid NCName
    until Repair runs (the reference's own flow pipeline repairs it
    first, flow/mod.rs:12-60)."""
    from promi_spark.io.xes import read_xes
    from promi_spark.operators.repair import repair_meta
    from promi_spark.operators.validate import classifier_name_violations

    log = read_xes(spark, f"{CORPUS}/book/bigger-example.xes")
    assert classifier_name_violations(log.meta) == [
        "MXML Legacy Classifier",
        "Event Name",
    ]
    assert classifier_name_violations(repair_meta(log.meta)) == []
