"""Property test: asof_join against a pure-Python reference model.

Random small key/timestamp universes (deliberately collision-heavy so
ties and empty sides are common), checked for both directions and with
a tolerance bound. Mirrors the single-pass union-window implementation
with an O(n^2) obviously-correct scan.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from promi_spark.operators.joins import asof_join

BASE = dt.datetime(2024, 1, 1)

keys = st.sampled_from(["k1", "k2", "k3"])
# minutes offsets with heavy collision probability
ts_off = st.integers(min_value=0, max_value=12)

left_rows = st.lists(
    st.tuples(st.integers(0, 10**6), keys, ts_off), min_size=0, max_size=8,
    unique_by=lambda r: r[0],
)
right_rows = st.lists(
    st.tuples(keys, ts_off), min_size=0, max_size=8,
    # one right row per (key, ts): matched payload must be deterministic
    unique_by=lambda r: (r[0], r[1]),
)


def _model(left, right, direction, tol_minutes=None):
    out = {}
    for lid, k, lt in left:
        if direction == "backward":
            cand = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= lt]
            best = max(cand, default=None)
        else:
            cand = [(rt, v) for (rk, rt, v) in right if rk == k and rt >= lt]
            best = min(cand, default=None)
        if best is not None and tol_minutes is not None and abs(best[0] - lt) > tol_minutes:
            best = None
        out[lid] = best
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(left=left_rows, right=right_rows,
       direction=st.sampled_from(["backward", "forward"]),
       tol=st.sampled_from([None, 3]))
def test_asof_matches_reference_model(spark, left, right, direction, tol):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    rright = [(k, t, f"v{k}:{t}") for (k, t) in right]
    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=t)) for (i, k, t) in left],
        StructType([
            StructField("id", LongType()),
            StructField("key", StringType()),
            StructField("ts", TimestampType()),
        ]),
    )
    rdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=t), v) for (k, t, v) in rright],
        StructType([
            StructField("key", StringType()),
            StructField("ts", TimestampType()),
            StructField("val", StringType()),
        ]),
    )
    tol_col = F.expr(f"INTERVAL {tol} MINUTES") if tol is not None else None
    got = {
        r["id"]: (r["ts_r"], r["val_r"])
        for r in asof_join(
            ldf, rdf, on="key", left_ts="ts", direction=direction,
            tolerance=tol_col,
        ).collect()
    }
    want = _model(left, rright, direction, tol)
    assert set(got) == set(want)
    for lid, best in want.items():
        if best is None:
            assert got[lid] == (None, None), (lid, got[lid])
        else:
            rt, v = best
            assert got[lid] == (BASE + dt.timedelta(minutes=rt), v), (lid, got[lid], best)
