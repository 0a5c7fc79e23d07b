"""Distributed cross-engine value witness (r12 VERDICT demand #2).

The soak harness used to COLLECT both engines' full result sets to the
driver (Arrow) and hash them there — a single-point 1.3 GiB collect at
30M rows that aborted on ``spark.driver.maxResultSize``
(r12 ``winnow_fingerprints`` on the boilerplate slice). The engine
query was innocent; the witness design was the scale-killer.

This module computes an order-insensitive value hash DISTRIBUTIVELY on
BOTH engines and compares three scalars:

    count(*), sum(lo60(md5(row))), sum(hi60(md5(row)))

where ``row`` is a canonical string both engines build identically:
cells in sorted-column-name order joined by ``\\x1f``, each cell
canonicalized by its type lane —

- ``i:`` integers/booleans (plain decimal digits)
- ``f:`` floats, decimals, and DuckDB HUGEINT (driver-faithful: the
  driver converts DuckDB decimals to float before hashing, so an
  un-cast DuckDB integer SUM can never silently match a Spark bigint
  — the r9 ``temperature_rates`` axis), scaled-integer at 1e-6
  precision via ``floor(v * 1e6 + 0.5)`` (floor is identical IEEE
  arithmetic on both engines, unlike round(), whose tie rule differs)
- ``t:`` timestamps as epoch microseconds (both engines run UTC)
- ``d:`` dates as days since epoch
- ``s:`` strings verbatim
- NULL -> ``∅`` (the same sentinel as check_oracle.norm_cell)

``lo60``/``hi60`` are ``int(hex[0:15], 16)`` / ``int(hex[16:31], 16)``
— 60-bit halves so they fit unsigned-64 paths on both engines (Spark
``conv(..., 16, 10)``, DuckDB ``('0x' || ...)::UBIGINT``). Sums ride
DECIMAL(38,0)/HUGEINT: 1e9 rows x 2^60 < 1.2e27, far inside both.

Nested/array/binary columns are unsupported — ``spark_witness_exprs``
raises ``ValueError`` and the caller falls back to the collect paths
(which those small/model-sized results can afford).
"""

from __future__ import annotations

NULL_SENTINEL = "∅"
SEP = "\x1f"
# floats at or beyond this magnitude exceed the scaled-int lane's
# exact range (floor on Spark returns BIGINT); canonicalize to the
# integer part only — 1e-6 absolute precision is already below one
# double ulp out there.
FLOAT_BIG = 1e12
# beyond this, the integer part no longer fits a BIGINT; keep the sign
# only (no registry query emits such values; this is an anti-divergence
# guard, not a precision promise). Deliberately BELOW 2^63-1: the big
# lane renders via int64 on BOTH engines because that conversion is an
# exact binary double->int64 on both — the previous DECIMAL(38,0)
# rendering diverged for integer-valued doubles above 2^53 (Spark's
# double->decimal cast stringifies through the shortest-repr
# Double.toString path, e.g. 1.2345678901234568e18 ->
# 1234567890123456800, while DuckDB converts the exact binary value ->
# 1234567890123456768), a false MISMATCH on any result carrying floats
# >9e15.
FLOAT_HUGE = 9e18


def spark_witness_exprs(schema):
    """Per-column canonical-string Columns for ``schema`` (sorted by
    column name), or raise ValueError on an unsupported type."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cells = []
    for field in sorted(schema.fields, key=lambda f: f.name):
        c = F.col(f"`{field.name}`")
        t = field.dataType
        if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            canon = F.concat(F.lit("i:"), c.cast("decimal(38,0)").cast("string"))
        elif isinstance(t, T.BooleanType):
            canon = F.concat(F.lit("i:"), c.cast("long").cast("string"))
        elif isinstance(t, (T.DoubleType, T.FloatType, T.DecimalType)):
            d = c.cast("double")
            scaled = F.floor(d * F.lit(1e6) + F.lit(0.5)).cast("string")
            # int64, not DECIMAL(38,0): exact binary conversion on both
            # engines up to FLOAT_HUGE (see the lane-constant comment)
            ipart = F.round(d, 0).cast("long").cast("string")
            canon = (
                F.when(F.isnan(d), F.lit("f:nan"))
                .when(d == F.lit(float("inf")), F.lit("f:inf"))
                .when(d == F.lit(float("-inf")), F.lit("f:-inf"))
                .when(F.abs(d) >= FLOAT_HUGE,
                      F.concat(F.lit("f:huge:"),
                               F.signum(d).cast("int").cast("string")))
                .when(F.abs(d) >= FLOAT_BIG, F.concat(F.lit("f:big:"), ipart))
                .otherwise(F.concat(F.lit("f:"), scaled))
            )
        elif isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            canon = F.concat(
                F.lit("t:"),
                F.unix_micros(c.cast("timestamp")).cast("string"),
            )
        elif isinstance(t, T.DateType):
            canon = F.concat(
                F.lit("d:"),
                F.datediff(c, F.lit("1970-01-01").cast("date")).cast("string"),
            )
        elif isinstance(t, T.StringType):
            canon = F.concat(F.lit("s:"), c)
        else:
            raise ValueError(
                f"distributed witness: unsupported Spark type {t} "
                f"in column {field.name!r}"
            )
        cells.append(F.coalesce(canon, F.lit(NULL_SENTINEL)))
    return cells


def spark_witness(df):
    """(count, sum_lo, sum_hi) of ``df`` computed engine-side; one
    aggregate job, nothing but three scalars reaches the driver."""
    from pyspark.sql import functions as F

    row = F.concat_ws(SEP, *spark_witness_exprs(df.schema))
    h = F.md5(row)

    def half(pos):
        return F.conv(F.substring(h, pos, 15), 16, 10).cast("decimal(38,0)")

    out = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(half(1)).alias("lo"),
        F.sum(half(17)).alias("hi"),
    ).first()
    return (
        int(out["n"]),
        int(out["lo"]) if out["lo"] is not None else None,
        int(out["hi"]) if out["hi"] is not None else None,
    )


def _duck_canon(name: str, type_str: str) -> str:
    """DuckDB canonical-cell SQL for one column, twin of the Spark
    lanes above. ``type_str`` is DuckDB's type rendering
    (``str(rel.types[i])``)."""
    t = type_str.upper()
    q = f'"{name}"'
    if t.startswith("DECIMAL") or t in ("DOUBLE", "FLOAT", "HUGEINT", "REAL"):
        # driver-faithful float lane (DuckDB decimals/HUGEINT -> float)
        d = f"CAST({q} AS DOUBLE)"
        return (
            f"CASE WHEN isnan({d}) THEN 'f:nan' "
            f"WHEN isinf({d}) AND {d} > 0 THEN 'f:inf' "
            f"WHEN isinf({d}) THEN 'f:-inf' "
            f"WHEN abs({d}) >= {FLOAT_HUGE:g} THEN 'f:huge:' || "
            f"CAST(CAST(sign({d}) AS INTEGER) AS VARCHAR) "
            f"WHEN abs({d}) >= {FLOAT_BIG:g} THEN 'f:big:' || "
            f"CAST(CAST(round({d}, 0) AS BIGINT) AS VARCHAR) "
            f"ELSE 'f:' || CAST(CAST(floor({d} * 1e6 + 0.5) AS BIGINT)"
            f" AS VARCHAR) END"
        )
    if t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return f"'i:' || CAST(CAST({q} AS HUGEINT) AS VARCHAR)"
    if t == "BOOLEAN":
        return f"'i:' || CAST(CAST({q} AS INTEGER) AS VARCHAR)"
    if t.startswith("TIMESTAMP"):
        return f"'t:' || CAST(epoch_us({q}) AS VARCHAR)"
    if t == "DATE":
        return f"'d:' || CAST({q} - DATE '1970-01-01' AS VARCHAR)"
    if t == "VARCHAR":
        return f"'s:' || {q}"
    raise ValueError(
        f"distributed witness: unsupported DuckDB type {type_str} "
        f"in column {name!r}"
    )


def duck_witness_sql(con, sql: str) -> str:
    """Wrap an oracle query in the witness aggregate. Schema comes
    from a lazy relation (no execution)."""
    rel = con.sql(sql)
    pairs = sorted(zip(rel.columns, (str(t) for t in rel.types)))
    cells = [
        f"COALESCE({_duck_canon(n, t)}, '{NULL_SENTINEL}')" for n, t in pairs
    ]
    row = "concat_ws(chr(31), " + ", ".join(cells) + ")"
    return (
        "SELECT count(*) AS n, "
        "sum(('0x' || substr(md5(__row), 1, 15))::UBIGINT::HUGEINT) AS lo, "
        "sum(('0x' || substr(md5(__row), 17, 15))::UBIGINT::HUGEINT) AS hi "
        f"FROM (SELECT {row} AS __row FROM ({sql}) __q) __w"
    )


def duck_witness(con, sql: str, budget: float):
    """(count, sum_lo, sum_hi) from DuckDB under an interrupt budget;
    None on timeout. Raises ValueError on unsupported result types
    (the caller falls back to the collect paths)."""
    import threading

    wsql = duck_witness_sql(con, sql)
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        n, lo, hi = con.execute(wsql).fetchone()
        return (
            int(n),
            int(lo) if lo is not None else None,
            int(hi) if hi is not None else None,
        )
    except Exception as e:
        if "INTERRUPT" in str(e).upper() or "interrupted" in str(e).lower():
            return None
        raise
    finally:
        timer.cancel()
