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


def test_nullable_columns_witness_correctly(pa):
    """r8 advice: nulls used to raise — and the soak loop's generic
    except turned a legitimately-nullable 2M-row result into a false
    failure with no fallback. arrow_hash now canonicalizes nulls via
    an explicit indicator companion column: equal multisets (nulls
    included) hash equal regardless of row order, a null never
    collides with the fill sentinel, and null-pattern differences are
    detected."""
    t1 = pa.table({"a": [1, None, 3], "s": ["x", None, "z"]})
    t2 = pa.table({"a": [3, 1, None], "s": ["z", "x", None]})
    assert arrow_hash(t1) == arrow_hash(t2)
    # null must NOT hash like the sentinel (0 / "")
    t3 = pa.table({"a": [1, 0, 3], "s": ["x", "", "z"]})
    assert arrow_hash(t1) != arrow_hash(t3)
    # a changed null pattern is a real difference
    t4 = pa.table({"a": [1, None, 3], "s": ["x", "y", None]})
    assert arrow_hash(t1) != arrow_hash(t4)
    # null timestamps and floats canonicalize too
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    t5 = pa.table({"t": [ts, None], "f": [1.5, None]})
    t6 = pa.table({"t": [None, ts], "f": [None, 1.5]})
    assert arrow_hash(t5) == arrow_hash(t6)


def test_unsupported_types_still_raise(pa):
    """Nested types stay on the tuple path (the caller catches
    ValueError and falls back instead of failing the witness)."""
    with pytest.raises(ValueError, match="unsupported"):
        arrow_hash(pa.table({"a": [[1, 2], [3]]}))


def test_negative_zero_canonicalized(pa):
    """r8 advice: two engines producing +/-epsilon around zero round to
    -0.0 vs 0.0 — equal values, different byte patterns (and unstable
    sort order among ties). Both must hash identically."""
    t1 = pa.table({"f": [-1e-9, 1.0], "k": [1, 2]})
    t2 = pa.table({"f": [1e-9, 1.0], "k": [1, 2]})
    assert arrow_hash(t1) == arrow_hash(t2)
    # literal -0.0 vs 0.0 as well
    t3 = pa.table({"f": [-0.0, 1.0], "k": [1, 2]})
    t4 = pa.table({"f": [0.0, 1.0], "k": [1, 2]})
    assert arrow_hash(t3) == arrow_hash(t4)


def test_decimal_hashes_like_float_never_like_int(pa):
    """r9 post-mortem, driver-faithful semantics: the driver converts
    DuckDB decimals to FLOAT before hashing (evidence from
    CORRECTNESS_r09: value_histogram's decimal(22,1) vs Spark double
    was green; temperature_rates' decimal(38,0) vs Spark bigint was
    red). So a decimal column must hash EQUAL to a float64 column of
    the same values, and DIFFERENT from an int64 column — which is
    exactly how an un-cast DuckDB integer SUM (HUGEINT) gets caught
    without false-alarming on legitimate decimal-vs-double oracles."""
    import decimal

    d = [decimal.Decimal(1), decimal.Decimal(2)]
    td = pa.table({"n": pa.array(d, pa.decimal128(38, 0)), "k": [1, 2]})
    ti = pa.table({"n": pa.array([1, 2], pa.int64()), "k": [1, 2]})
    tf = pa.table({"n": pa.array([1.0, 2.0], pa.float64()), "k": [1, 2]})
    assert arrow_hash(td) != arrow_hash(ti)
    assert arrow_hash(td) == arrow_hash(tf)
    td2 = pa.table(
        {"k": [2, 1], "n": pa.array(list(reversed(d)), pa.decimal128(38, 0))}
    )
    assert arrow_hash(td) == arrow_hash(td2)


def test_norm_cell_decimal_is_float_not_int():
    """Tuple-path twin: Decimal('123') normalizes to the float line
    ('123.0'), never the int line ('123') — the r9 red-row axis —
    while matching a genuine float of the same value."""
    import decimal

    from tools.check_oracle import norm_cell

    assert norm_cell(decimal.Decimal(123)) != norm_cell(123)
    assert norm_cell(decimal.Decimal(123)) == norm_cell(123.0)
    assert norm_cell(decimal.Decimal("1.5")) == norm_cell(1.5)


def test_uncast_sum_oracle_is_caught(duck):
    """End-to-end audit witness: an oracle written as a bare integer
    SUM (DuckDB -> HUGEINT, decimal128 through Arrow) against a Spark
    bigint result must FAIL the local hash, and the documented fix
    (CAST ... AS BIGINT) must pass it. Rows are fetched exactly the way
    tools/check_oracle now fetches them — through Arrow, because
    DuckDB's Python fetchall() converts HUGEINT to plain int and made
    this class of bug structurally invisible to the old tuple path
    (the r9 temperature_rates red row)."""
    from tools.check_oracle import table_hash

    def duck_rows(sql):
        res = duck.execute(sql)
        cols = [d[0] for d in res.description]
        tbl = res.fetch_arrow_table()
        return list(zip(*(tbl[c].to_pylist() for c in cols)))

    spark_rows = [(6,)]  # what Spark's F.sum over ints collects: int
    bad_rows = duck_rows("SELECT SUM(x) AS s FROM (VALUES (1),(2),(3)) t(x)")
    good_rows = duck_rows(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1),(2),(3)) t(x)"
    )
    assert table_hash(["s"], spark_rows) != table_hash(["s"], bad_rows)
    assert table_hash(["s"], spark_rows) == table_hash(["s"], good_rows)


def test_arrow_rows_fallback_matches_tuple_witness(pa):
    """_arrow_rows feeds the tuple-compare fallback: same hash as the
    engine-native tuple materialization, column order respected."""
    from tools.check_oracle import table_hash
    from tools.soak import _arrow_rows

    cols = ["a", "s"]
    t = pa.table({"s": ["x", "y"], "a": [1, 2]})
    rows = _arrow_rows(t, cols)
    assert rows == [(1, "x"), (2, "y")]
    assert table_hash(cols, rows) == table_hash(cols, [(1, "x"), (2, "y")])
