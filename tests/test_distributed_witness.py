"""The distributed cross-engine value witness (tools/witness.py).

Big soak results never leave their engine: both sides aggregate
(count, sum(lo60(md5(canonical-row))), sum(hi60(...))) and the soak
compares three scalars — the r12 VERDICT demand after the 30.7M-row
``winnow_fingerprints`` Arrow collect blew ``maxResultSize`` while the
engine query itself was fine. These tests pin the witness contract:

- cross-engine agreement on every supported lane (ints, bools, floats
  incl. NaN/inf/-0.0/nulls, unicode + separator-byte strings,
  timestamps, dates, DuckDB decimals) and on real oracled registry
  queries;
- sensitivity to a single changed value and to row-count changes;
- order insensitivity (sum is commutative by construction);
- driver-faithful lane separation: an un-cast DuckDB integer SUM
  (HUGEINT -> float lane) can never silently match a Spark bigint —
  the r9 ``temperature_rates`` axis;
- unsupported types raise ValueError so the soak falls back to the
  collect paths instead of mis-witnessing.
"""

from __future__ import annotations

import pytest

from tools.witness import duck_witness, spark_witness


@pytest.fixture(scope="module")
def mixed_parquet(tmp_path_factory, duck):
    """A parquet file exercising every canonical lane, written by
    DuckDB and read by both engines."""
    path = str(tmp_path_factory.mktemp("witness") / "mixed.parquet")
    duck.execute(
        f"""
        COPY (SELECT * FROM (VALUES
          (1::BIGINT, 2.5::DOUBLE, 'héllo\x1fworld',
           TIMESTAMP '2021-03-04 05:06:07.123456', DATE '2020-01-02',
           true, 0.0000025::DOUBLE, 1.5e13::DOUBLE),
          (NULL, NULL, NULL, NULL, NULL, NULL,
           -0.0::DOUBLE, 'nan'::DOUBLE),
          (-42, -123456.789, '',
           TIMESTAMP '1969-12-31 23:59:59', DATE '1969-12-31',
           false, 'inf'::DOUBLE, -1.5e13::DOUBLE),
          (9007199254740993, 1e-7, 'tab\tand\nnewline',
           TIMESTAMP '2038-01-19 03:14:07', DATE '2100-06-15',
           true, '-inf'::DOUBLE, 123.4567894::DOUBLE),
          -- f:big beyond 2^53: the exact binary value is
          -- 1234567890123456768 while the shortest decimal repr is
          -- ...800 — the row that pins the BIGINT (not DECIMAL)
          -- rendering of the big lane (r14 ADVICE item)
          (7, 1.2345678901234568e18::DOUBLE, 'big',
           TIMESTAMP '2000-01-01 00:00:00', DATE '2000-01-01',
           false, 8.0::DOUBLE, -9.007199254740993e15::DOUBLE)
        ) v(a, b, c, d, e, f, g, h)) TO '{path}' (FORMAT PARQUET)
        """
    )
    return path


def test_cross_engine_agreement_all_lanes(spark, duck, mixed_parquet):
    sql = f"SELECT * FROM read_parquet('{mixed_parquet}')"
    dw = duck_witness(duck, sql, 60)
    sw = spark_witness(spark.read.parquet(mixed_parquet))
    assert dw == sw
    assert dw[0] == 5 and dw[1] is not None and dw[2] is not None


def test_cross_engine_agreement_on_registry_queries(spark, duck, sf_dir):
    """Real oracled queries: the same pairs the soak would route
    through the witness at scale — an int-heavy pair-join shape, a
    float aggregate shape, and a string/count shape."""
    from promi_spark.queries import QUERIES

    for name in ("session_overlaps", "per_trace_counts", "tpch_q1"):
        fn, sql = QUERIES[name]
        assert duck_witness(duck, sql, 300) == spark_witness(
            fn(spark, sf_dir)
        ), name
        spark.catalog.clearCache()


def test_sensitive_to_value_and_row_changes(duck):
    base = "SELECT * FROM (VALUES (1, 'x'), (2, 'y')) v(a, b)"
    changed = "SELECT * FROM (VALUES (1, 'x'), (2, 'z')) v(a, b)"
    fewer = "SELECT * FROM (VALUES (1, 'x')) v(a, b)"
    w0 = duck_witness(duck, base, 60)
    assert duck_witness(duck, changed, 60) != w0
    w1 = duck_witness(duck, fewer, 60)
    assert w1 != w0 and w1[0] == 1


def test_order_insensitive(spark, duck, mixed_parquet):
    sql = f"SELECT * FROM read_parquet('{mixed_parquet}')"
    shuffled = (
        f"SELECT * FROM read_parquet('{mixed_parquet}') "
        "ORDER BY md5(COALESCE(c, '')) DESC"
    )
    assert duck_witness(duck, sql, 60) == duck_witness(duck, shuffled, 60)
    sdf = spark.read.parquet(mixed_parquet)
    assert spark_witness(sdf) == spark_witness(sdf.repartition(7))


def test_int_vs_float_lane_separation(spark, duck):
    """Driver-faithful: DuckDB SUM(int) returns HUGEINT, which the
    driver (and this witness) puts on the float lane — it must NOT
    match a Spark bigint of equal value unless the oracle casts, and
    MUST match once cast (the r9 temperature_rates contract)."""
    from pyspark.sql import functions as F

    sdf = spark.range(1, 4).agg(F.sum("id").alias("s"))  # bigint 6
    assert spark_witness(sdf) != duck_witness(
        duck, "SELECT sum(x) AS s FROM (VALUES (1), (2), (3)) v(x)", 60
    )
    assert spark_witness(sdf) == duck_witness(
        duck,
        "SELECT CAST(sum(x) AS BIGINT) AS s "
        "FROM (VALUES (1), (2), (3)) v(x)",
        60,
    )


def test_decimal_matches_double(spark, duck):
    """DuckDB DECIMAL and Spark DOUBLE of equal values agree (both on
    the float lane) — the green half of the r9 evidence."""
    sdf = spark.createDataFrame([(1.5,), (2.25,)], "v double")
    assert spark_witness(sdf) == duck_witness(
        duck,
        "SELECT CAST(v AS DECIMAL(22,6)) AS v "
        "FROM (VALUES (1.5), (2.25)) t(v)",
        60,
    )


def test_unsupported_types_raise(spark, duck):
    with pytest.raises(ValueError):
        spark_witness(
            spark.createDataFrame([([1, 2],)], "v array<int>")
        )
    with pytest.raises(ValueError):
        duck_witness(duck, "SELECT [1, 2] AS v", 60)


def test_empty_result_matches(spark, duck):
    sdf = spark.range(1).filter("id < 0").select("id")
    dw = duck_witness(duck, "SELECT 1::BIGINT AS id WHERE false", 60)
    assert spark_witness(sdf) == dw == (0, None, None)
