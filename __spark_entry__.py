"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in :mod:`promi_spark.queries`; this file is
a thin adapter so the engine package stays self-contained.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the directly-follows graph of the sf0.001 event
    log — the core process-mining aggregation (SURVEY §2.4 A5)."""
    from promi_spark.io import load_event_log
    from promi_spark.operators.dfg import directly_follows

    log = load_event_log(spark, "/root/testdata/sf0.001")
    return directly_follows(log, with_endpoints=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from promi_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from promi_spark.queries import oracle_sql as _o

    return _o()
