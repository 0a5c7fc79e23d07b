"""The driver reads bench.py's FINAL stdout line through a 2000-char
tail window; r5/r6 shipped with ``"parsed": null`` because the detail
line outgrew it. Pin the contract: the line built from a
full-sized detail dict parses, carries the required fields, and stays
comfortably inside the window."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, HEADLINE2, stdout_line


def _fake_detail() -> dict:
    queries = {name: 123.456 for name in HEADLINE}
    queries2 = {name: 123.456 for name in HEADLINE2}
    return {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "queries_warm": queries,
        "queries_pass3": queries,
        "queries_min3": queries,
        "min3_total": round(sum(queries.values()), 3),
        "min3_compact": [123.456 for _ in HEADLINE],
        "canary": {
            "start": 123.456,
            "mid": 123.456,
            "end": 123.456,
            "steal_pct": 99.99,
        },
        "warm_total": round(sum(queries.values()), 3),
        "headline2": {
            "queries2": queries2,
            "queries2_warm": queries2,
            "queries2_rep3": queries2,
            "queries2_min3": queries2,
            "value2": round(sum(queries2.values()), 3),
            "warm2_total": round(sum(queries2.values()), 3),
            "min3_total2": round(sum(queries2.values()), 3),
        },
        "index_serving": {
            "ivf": {"build": 1234.567, "serve": 1234.567},
            "ivfpq": {"build": 1234.567, "serve": 1234.567},
        },
        "neardup_pipeline": {"x": 1.0},
        "streaming": {
            "sessionize_rows_per_sec": 165033,
            "stateful_dfg_rows_per_sec": 60592,
            "stateful_dfg_1batch_rows_per_sec": 192778,
        },
        "extras": {"y": 2.0},
        "sf": 0.1,
    }


def test_stdout_line_parses_and_fits_tail_window():
    line = stdout_line(_fake_detail())
    assert "\n" not in line
    # 1900 leaves headroom before the 2000-char driver tail window
    # truncates the head again (the r15 min3/canary additions spent
    # most of the old 1700 budget; real timings are shorter than the
    # 123.456 worst case used here)
    assert len(line) < 1900, len(line)
    obj = json.loads(line)
    assert obj["metric"] == "headline_queries_total"
    assert set(obj["queries"]) == set(HEADLINE)
    assert set(obj["queries2"]) == set(HEADLINE2)
    assert obj["value2"] == round(123.456 * len(HEADLINE2), 3)
    assert obj["unit"] == "sec"
    assert obj["detail"] == "BENCH_SELF.json"
    assert obj["streaming_rps"]["stateful_dfg"] == 60592
    # r15 noise-defense additions (r14 VERDICT item 1): min-of-3 totals,
    # the compact per-query min-of-3 array (HEADLINE order), canary
    assert obj["min3_total"] == round(123.456 * len(HEADLINE), 3)
    assert obj["min3"] == [123.456] * len(HEADLINE)
    assert obj["min3_total2"] == round(123.456 * len(HEADLINE2), 3)
    assert obj["canary"]["steal_pct"] == 99.99
    # ANN serving split: both phases of both index kinds ride the line
    assert obj["index_serving"]["ivf"]["serve"] == 1234.567
    assert obj["index_serving"]["ivfpq"]["build"] == 1234.567


def test_stdout_line_survives_missing_index_serving():
    d = _fake_detail()
    d.pop("index_serving")
    obj = json.loads(stdout_line(d))
    assert obj["index_serving"] is None


def test_stdout_line_survives_missing_streaming():
    d = _fake_detail()
    d.pop("streaming")
    d.pop("headline2")
    obj = json.loads(stdout_line(d))
    assert obj["streaming_rps"]["sessionize"] is None
    assert obj["value2"] is None
