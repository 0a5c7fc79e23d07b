"""The session_overlaps oracle's bucketed rewrite stays the spec.

The registered oracle pre-filters candidate pairs with minute-bucket
equality + DISTINCT before the exact overlap predicate, because
DuckDB's IEJoin on the naive two-inequality interval self-join is
near-quadratic at ~1M sessions (>37 min at sf1 vs the 2400 s soak
budget). The rewrite is only a valid oracle while it stays
row-identical to the naive specification, so this test pins the
equivalence in DuckDB itself on an adversarial synthetic corpus:
sessions that touch exactly at an endpoint (overlap_us = 0 must be
emitted — the predicate is <=), single-event zero-length sessions,
gaps of exactly 1800 s (NOT a new session: the rule is > 1800000000
micros), 1800.000001 s (a new session), sessions spanning many minute
buckets (duplicate candidates that DISTINCT must collapse to the
naive join's single row), and sub-second jitter around bucket edges.

No Spark involved: this is a pure cross-form DuckDB check, so a
future edit to the registered SQL that breaks spec equivalence fails
here in milliseconds instead of as an opaque sweep hash mismatch.
"""

from __future__ import annotations

import random

import pytest


# The naive specification: the oracle's exact shape before the r8
# minute-bucket rewrite (promi_spark/queries.py session_overlaps).
NAIVE_TAIL = """
    SELECT a.user_id, a.session_id,
           b.user_id AS user_id_r, b.session_id AS session_id_r,
           CAST(epoch_us(least(a.session_end, b.session_end))
                - epoch_us(greatest(a.session_start, b.session_start))
                AS BIGINT) AS overlap_us
    FROM s a JOIN s b
      ON a.session_start <= b.session_end
     AND b.session_start <= a.session_end
     AND a.user_id < b.user_id
"""


def _events_rows():
    rng = random.Random(0x5E55)
    rows = []
    eid = 0

    def emit(user, base_us, offsets_us):
        nonlocal eid
        for off in offsets_us:
            rows.append((eid, user, base_us + off))
            eid += 1

    base = 1_700_000_000_000_000  # some epoch micros
    minute = 60_000_000
    half_hour = 1_800_000_000

    # exactly-touching sessions across two users: overlap_us == 0
    emit(1, base, [0, minute])
    emit(2, base + minute, [0, 5 * minute])
    # gap of exactly 1800 s inside one user: SAME session
    emit(3, base, [0, half_hour])
    # gap of 1800 s + 1 micro: NEW session
    emit(4, base, [0, half_hour + 1])
    # single-event zero-length sessions, some at identical instants
    for u in (5, 6, 7):
        emit(u, base + 3 * minute, [0])
    # a long session spanning ~90 minute-buckets vs many short ones
    emit(8, base, [i * minute for i in range(0, 90, 3)])
    for u in range(9, 29):
        start = rng.randrange(0, 85) * minute + rng.randrange(-999, 999)
        emit(u, base + start, [0, rng.randrange(1, 4 * minute)])
    # jitter right at minute-bucket edges: two-event sessions whose
    # endpoints straddle a bucket boundary by at most 1 us
    for u in range(29, 39):
        edge = rng.randrange(1, 88) * minute
        emit(u, base + edge + rng.choice([-1, 0, 1]), [0, rng.choice([1, minute])])
    return rows


@pytest.fixture(scope="module")
def duck_events():
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, make_timestamp(?))",
        _events_rows(),
    )
    return con


def _registered_sql():
    from promi_spark.queries import QUERIES

    return QUERIES["session_overlaps"][1]


def test_bucketed_oracle_matches_naive_spec(duck_events):
    bucketed = _registered_sql()
    # splice the naive tail onto the registered CTE prefix (everything
    # through the ``s AS (...)`` session build is shared spec)
    marker = "buck AS ("
    assert marker in bucketed, (
        "registered session_overlaps oracle no longer has the bucketed "
        "shape this test guards — update or retire the test"
    )
    prefix = bucketed[: bucketed.index(marker)].rstrip().rstrip(",")
    naive = prefix + "\n" + NAIVE_TAIL
    n_b = duck_events.execute(
        f"SELECT count(*) FROM ({bucketed})"
    ).fetchone()[0]
    n_n = duck_events.execute(f"SELECT count(*) FROM ({naive})").fetchone()[0]
    assert n_b == n_n and n_b > 0
    for a, b in ((bucketed, naive), (naive, bucketed)):
        diff = duck_events.execute(
            f"SELECT count(*) FROM (({a}) EXCEPT ({b}))"
        ).fetchone()[0]
        assert diff == 0


def test_corpus_exercises_the_edge_cases(duck_events):
    """The adversarial corpus actually contains the shapes the header
    claims: a zero-overlap touching pair, an exactly-1800 s gap kept
    in one session, an 1800 s + 1 us gap split into two."""
    bucketed = _registered_sql()
    rows = duck_events.execute(
        f"SELECT count(*) FROM ({bucketed}) WHERE overlap_us = 0"
    ).fetchone()[0]
    assert rows >= 1
    n_sess = dict(
        duck_events.execute(
            """
            WITH lagged AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, sum(new_s) FROM lagged
            WHERE user_id IN (3, 4) GROUP BY user_id
            """
        ).fetchall()
    )
    assert n_sess[3] == 1  # exactly 1800 s: same session
    assert n_sess[4] == 2  # 1800 s + 1 us: split
