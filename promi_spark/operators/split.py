"""Seeded train/test split + Bernoulli sampling (reference
``src/stream/split.rs:18-144``).

The reference draws ``coin ~ Open01`` from a seeded PCG-64 *per
component* — one coin per trace, one per standalone event — and routes
``coin > ratio`` to the test sink (``split.rs:56-83``). ``Sample`` is a
split whose test side is discarded (``split.rs:121-144``).

PCG-64 bit-parity is not reproducible inside Spark's expression engine,
and the reference's own acceptance test is *statistical* (ratio within
1.5e-2 over seeds, ``split.rs:221-222``), so we adopt a stronger
property: a **cross-engine deterministic hash coin**. The coin is the
first 8 hex digits of ``md5(key || ':' || seed)`` compared against
``floor(ratio * 16^8)`` in hex — identical in any engine with a
standard md5 (Spark, DuckDB, Python), independent of row order and
partitioning, and stable under re-execution (crucial at 100 TB where
retried tasks must route rows identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from promi_spark.log import EventLog

HEX_SPACE = 16**8


def hex_threshold(ratio: float) -> str:
    """ratio in [0,1] -> 8-hex-digit threshold string.

    ratio >= 1 returns "g" (sorts after every hex digit) so the
    lexicographic compare keeps everything — format(16^8, 'x') would be
    9 chars and sort *before* "ffffffff".
    """
    t = max(int(ratio * HEX_SPACE), 0)
    if t >= HEX_SPACE:
        return "g"
    return format(t, "08x")


def coin_hex(key: Column, seed: int, salt: str = "") -> Column:
    """The deterministic 8-hex-digit coin for a component key.

    ``salt`` decorrelates chained operators that share a seed: the
    reference's sequential PCG draws decorrelate by stream *position*
    (a Sample followed by a Split with the same seed still draw
    different values, ``split.rs:56-83``); a position-independent hash
    coin needs an explicit per-operator namespace instead.
    """
    parts = [key, F.lit(str(seed))] + ([F.lit(salt)] if salt else [])
    return F.substring(F.md5(F.concat_ws(":", *parts)), 1, 8)


def _component_key() -> Column:
    """One coin per *component*: the trace key for in-trace events (so a
    whole trace lands on one side), the event itself when standalone —
    mirroring the reference's per-component draw (Meta goes to both
    sides, which here is the out-of-band meta object).

    The standalone key deliberately avoids ``seq``: referencing seq
    would pull the ingest-time row_number window (and its case_id
    shuffle) into an otherwise fully narrow split. Identity comes from
    the event's own content columns instead.
    """
    return F.coalesce(
        F.concat(F.lit("t:"), F.col("case_id")),
        F.concat(
            F.lit("e:"),
            F.xxhash64("ts", "activity", "instance", "resource").cast("string"),
        ),
    )


def split(
    log: EventLog,
    ratio: float,
    seed: int = 0,
    key: Column | None = None,
    salt: str = "",
) -> tuple[EventLog, EventLog]:
    """(train, test): coin <= ratio -> train, else test.

    Purely narrow (no shuffle): each row computes its own coin. The
    md5+compare runs in whole-stage codegen.
    """
    coin = coin_hex(key if key is not None else _component_key(), seed, salt)
    thresh = F.lit(hex_threshold(ratio))
    train = log.with_df(log.df.filter(coin < thresh))
    test = log.with_df(log.df.filter(coin >= thresh))
    return train, test


def sample(
    log: EventLog,
    ratio: float,
    seed: int = 0,
    key: Column | None = None,
    salt: str = "",
) -> EventLog:
    """Bernoulli keep-ratio sampling = split with the test side voided
    (reference ``split.rs:121-144``)."""
    train, _ = split(log, ratio, seed=seed, key=key, salt=salt)
    return train


def per_key_cap(
    df: DataFrame,
    key_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-key cap: keep at most ``n`` rows per key,
    selected by md5-coin order — the domain-cap step of C4/RefinedWeb-
    style corpus curation ("no domain contributes more than n docs"),
    with the same engine-portable coin family as :func:`split` so the
    kept set is stable across engines, row order, and partitioning.

    One shuffle on the key for the rank window. A pathologically hot
    key concentrates its rows in one task — the usual window-skew
    remedy applies (AQE skew handling; or pre-filter hot keys by an
    approximate count and cap them with a coin-threshold pass instead
    of a rank). Ties cannot occur: the coin is salted with the row id
    and the id itself breaks any residual equality.
    """
    if n < 1:
        raise ValueError("per_key_cap: n must be >= 1")
    w = Window.partitionBy(key_col).orderBy(
        coin_hex(F.col(id_col), seed, salt="cap"), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight,
    id_col: str,
    key_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis A-ES, public formulation): keep the ``k`` rows with the
    largest ``u^(1/w)``, where ``u`` is an engine-portable uniform
    derived from the md5 coin (first 8 hex digits -> (int + 0.5)/2^32)
    and ``w`` the row's positive weight — e.g. quality- or
    length-proportional inclusion for mixture building. Rows with
    ``w <= 0`` are excluded (A-ES precondition).

    Ranking uses the monotone-equivalent ``ln(u)/w`` (u < 1 so ln(u)
    is negative; larger w pulls the key toward 0 = better), computed
    from exact inputs with IEEE arithmetic — both engines order
    identically, and the row id breaks any residual tie.

    Scale shape: with ``key_col`` it is k-per-key via the rank window
    (one key shuffle); without, the global top-k plans as
    TakeOrdered — per-partition heaps merged once, never a full sort.
    Like :func:`split`, the kept set is invariant to row order and
    partitioning.
    """
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    u = (
        F.conv(coin_hex(F.col(id_col), seed, salt="ws"), 16, 10).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    base = df.filter(w > 0).withColumn("__rk", F.log(u) / w)
    if key_col is not None:
        win = Window.partitionBy(key_col).orderBy(
            F.desc("__rk"), F.col(id_col)
        )
        out = base.withColumn("__rn", F.row_number().over(win)).filter(
            F.col("__rn") <= k
        )
        return out.drop("__rk", "__rn")
    return base.orderBy(F.desc("__rk"), F.col(id_col)).limit(k).drop("__rk")
