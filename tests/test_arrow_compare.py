"""The soak harness's Arrow compare path (tools/soak.py).

Results at or above ARROW_COMPARE_ROWS skip the tuple
fetchall/collect + per-cell Python hashing (tens of single-threaded
interpreter minutes at ~20M rows — the r8 full-data session_overlaps
run hit the DuckDB interrupt inside fetchall) and are hash-compared
from canonicalized Arrow tables instead. These tests pin that the
Arrow witness agrees with reality: identical results from both
engines hash equal across representative schema shapes (ints,
rounded floats, timestamps, strings), and the hash is sensitive to
value changes but insensitive to row/column order — the same
contract as tools/check_oracle.table_hash.
"""

from __future__ import annotations

import pytest

from tools.soak import arrow_hash


@pytest.fixture(scope="module")
def pa():
    import pyarrow

    return pyarrow


def test_cross_engine_agreement_on_registry_shapes(spark, duck):
    """Spark toArrow and DuckDB fetch_arrow_table of the same oracled
    queries hash equal — int-only (session_overlaps' shape), rounded
    floats (cosine pairs), timestamps and strings all covered."""
    from tools.soak import duck_arrow_with_budget

    from promi_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    for name in (
        "session_overlaps",
        "cosine_near_dups_exact",
        "filter_concept_in",
        "per_trace_counts",
    ):
        fn, sql = QUERIES[name]
        stbl = fn(spark, SF_DIR).toArrow()
        dcols, dtbl = duck_arrow_with_budget(duck, sql, 300)
        assert stbl.num_rows == dtbl.num_rows, name
        assert arrow_hash(stbl) == arrow_hash(dtbl), name


def test_hash_contract(pa):
    t1 = pa.table({"a": [1, 2, 3], "b": [1.0, 2.0, 3.0]})
    # sub-1e-6 float noise collapses under round(', 6) — same contract
    # as norm_cell in the tuple path
    t2 = pa.table({"a": [1, 2, 3], "b": [1.0, 2.0000001, 3.0]})
    # a real value change must flip the hash
    t3 = pa.table({"a": [1, 2, 3], "b": [1.0, 2.1, 3.0]})
    # row order and column order are canonicalized away
    t4 = pa.table({"b": [3.0, 1.0, 2.0], "a": [3, 1, 2]})
    assert arrow_hash(t1) == arrow_hash(t2)
    assert arrow_hash(t1) != arrow_hash(t3)
    assert arrow_hash(t1) == arrow_hash(t4)
    # int widths widen to int64 before hashing
    t5 = pa.table(
        {"a": pa.array([1, 2, 3], pa.int32()), "b": [1.0, 2.0, 3.0]}
    )
    assert arrow_hash(t1) == arrow_hash(t5)


def test_nulls_are_rejected_not_miswitnessed(pa):
    with pytest.raises(ValueError, match="nulls"):
        arrow_hash(pa.table({"a": [1, None, 3]}))
