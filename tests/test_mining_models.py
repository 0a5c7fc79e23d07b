"""Alpha miner / heuristic net / token replay tests — hand-checkable
tiny logs plus the reference's L1 book log."""

import pytest
from pyspark.sql import functions as F

from promi_spark.log import EventLog


def _mklog(spark, traces: list[list[str]]) -> EventLog:
    rows = []
    for i, acts in enumerate(traces):
        for s, a in enumerate(acts):
            rows.append((f"c{i}", s, a, None))
    df = spark.createDataFrame(
        rows, "case_id string, seq long, activity string, ts timestamp"
    )
    return EventLog.from_events(df)


def test_alpha_miner_textbook(spark):
    """L = {<a,b,d>, <a,c,d>}: alpha finds ({a},{b,c}), ({b,c},{d})
    plus source/sink."""
    from promi_spark.operators.mining import alpha_miner

    net = alpha_miner(_mklog(spark, [list("abd"), list("acd")] * 3))
    got = {(p.ins, p.outs) for p in net.places}
    assert ((), ("a",)) in got  # source
    assert (("d",), ()) in got  # sink
    assert (("a",), ("b", "c")) in got
    assert (("b", "c"), ("d",)) in got
    # maximality: the singleton sub-places must NOT appear
    assert (("a",), ("b",)) not in got
    assert (("b",), ("d",)) not in got
    assert net.transitions == ["a", "b", "c", "d"]


def test_alpha_miner_parallel(spark):
    """L = {<a,b,c,d>, <a,c,b,d>}: b || c so no place may contain both
    on one side."""
    from promi_spark.operators.mining import alpha_miner

    net = alpha_miner(_mklog(spark, [list("abcd"), list("acbd")] * 2))
    for p in net.places:
        assert not {"b", "c"} <= set(p.ins)
        assert not {"b", "c"} <= set(p.outs)
    got = {(p.ins, p.outs) for p in net.places}
    assert (("a",), ("b",)) in got
    assert (("a",), ("c",)) in got
    assert (("b",), ("d",)) in got
    assert (("c",), ("d",)) in got


def test_token_replay_perfect_fit(spark):
    from promi_spark.operators.mining import alpha_miner, fitness_summary, token_replay

    log = _mklog(spark, [list("abd"), list("acd")] * 3)
    net = alpha_miner(log)
    rep = token_replay(log, net)
    rows = rep.collect()
    assert len(rows) == 6
    assert all(r["fitness"] == 1.0 for r in rows)
    assert all(r["missing"] == 0 and r["remaining"] == 0 for r in rows)
    s = fitness_summary(rep).first()
    assert s["avg_fitness"] == 1.0 and s["frac_fitting"] == 1.0


def test_token_replay_detects_deviation(spark):
    from promi_spark.operators.mining import alpha_miner, token_replay

    train = _mklog(spark, [list("abd"), list("acd")] * 3)
    net = alpha_miner(train)
    # deviant traces: skipped b/c, repeated d, missing d
    bad = _mklog(spark, [list("ad"), list("abdd"), list("ab")])
    rows = {r["case_id"]: r for r in token_replay(bad, net).collect()}
    assert rows["c0"]["fitness"] < 1.0  # skipped activity -> missing tokens
    assert rows["c1"]["fitness"] < 1.0  # extra d -> missing token for 2nd d
    assert rows["c2"]["fitness"] < 1.0  # never reached the sink


def test_heuristic_net_thresholds(spark):
    from promi_spark.operators.mining import heuristic_net

    # a->b 10 times strongly, b->a once (noise)
    traces = [list("ab")] * 10 + [list("ba")]
    net = heuristic_net(
        _mklog(spark, traces), dependency_threshold=0.5, frequency_threshold=2
    )
    edges = {(r["a"], r["b"]) for r in net.collect()}
    assert ("a", "b") in edges
    assert ("b", "a") not in edges


def test_alpha_on_book_l1(spark):
    """Reference L1 book log parses and mines into a workflow net with
    one source, one sink, and a-initial / d-final structure."""
    import os

    path = "/root/reference/static/xes/book/L1.xes"
    if not os.path.isfile(path):
        pytest.skip("reference corpus unavailable")
    from promi_spark.io.xes import read_xes
    from promi_spark.operators.mining import alpha_miner, fitness_summary, token_replay

    log = read_xes(spark, path)
    net = alpha_miner(log)
    sources = [p for p in net.places if not p.ins]
    sinks = [p for p in net.places if not p.outs]
    assert len(sources) == 1 and len(sinks) == 1
    assert sources[0].outs == ("a",)
    assert sinks[0].ins == ("d",)
    s = fitness_summary(token_replay(log, net)).first()
    assert s["n_traces"] == 6
    assert s["avg_fitness"] > 0.9


# ---------------------------------------------------------------------------
# Inductive miner (IMd)
# ---------------------------------------------------------------------------


def _sexpr(t):
    """Canonical s-expression of a TreeNode for compact assertions."""
    if t.op == "act":
        return t.label
    if t.op == "tau":
        return "tau"
    return f"{t.op}({','.join(_sexpr(c) for c in t.children)})"


def test_inductive_seq_xor(spark):
    """L = {<a,b,d>, <a,c,d>} -> seq(a, xor(b,c), d)."""
    from promi_spark.operators.mining import inductive_miner

    t = inductive_miner(_mklog(spark, [list("abd"), list("acd")] * 3))
    assert _sexpr(t) == "seq(a,xor(b,c),d)"


def test_inductive_parallel(spark):
    """L = {<a,b,c,d>, <a,c,b,d>} -> seq(a, and(b,c), d)."""
    from promi_spark.operators.mining import inductive_miner

    t = inductive_miner(_mklog(spark, [list("abcd"), list("acbd")] * 2))
    assert _sexpr(t) == "seq(a,and(b,c),d)"


def test_inductive_loop(spark):
    """L = {<a>, <a,b,a>, <a,b,a,b,a>} -> loop(a, b)."""
    from promi_spark.operators.mining import inductive_miner

    t = inductive_miner(_mklog(spark, [["a"], list("aba"), list("ababa")]))
    assert _sexpr(t) == "loop(a,b)"


def test_inductive_tau_loop(spark):
    """L = {<a,b>, <a,b,a,b>}: direct end->start edge -> loop(seq(a,b), tau)."""
    from promi_spark.operators.mining import inductive_miner

    t = inductive_miner(_mklog(spark, [list("ab"), list("abab")]))
    assert _sexpr(t) == "loop(seq(a,b),tau)"


def test_inductive_self_loop_leaf(spark):
    """L = {<a,a,b>}: self-loop on a single activity."""
    from promi_spark.operators.mining import inductive_miner

    t = inductive_miner(_mklog(spark, [list("aab")]))
    assert _sexpr(t) == "seq(loop(a,tau),b)"


def test_inductive_on_book_l1(spark):
    """Reference L1 book log -> the textbook tree seq(a, xor(and(b,c), e), d)."""
    import os

    path = "/root/reference/static/xes/book/L1.xes"
    if not os.path.isfile(path):
        pytest.skip("reference corpus unavailable")
    from promi_spark.io.xes import read_xes
    from promi_spark.operators.mining import inductive_miner

    t = inductive_miner(read_xes(spark, path))
    assert _sexpr(t) == "seq(a,xor(and(b,c),e),d)"


def test_inductive_df_surface(spark):
    """tree_rows/DataFrame surface: ids DFS-preorder, parents consistent."""
    from promi_spark.operators.mining import inductive_miner_df

    rows = inductive_miner_df(
        _mklog(spark, [list("abd"), list("acd")])
    ).collect()
    assert [r["node_id"] for r in rows] == list(range(len(rows)))
    assert rows[0]["parent_id"] is None and rows[0]["op"] == "seq"
    for r in rows[1:]:
        assert 0 <= r["parent_id"] < r["node_id"]
    labels = {r["label"] for r in rows if r["op"] == "act"}
    assert labels == {"a", "b", "c", "d"}


def test_dfg_alignment_perfect_and_deviant(spark):
    """Model from {<a,b,d>, <a,c,d>}: conforming traces align at cost 0
    / fitness 1; hand-checkable deviations cost exactly their edit
    distance to the DFG language."""
    from promi_spark.operators.mining import dfg_alignment

    # model-building traces + deviants in one log: the DFG comes from
    # the log itself, so align the deviants against a model log
    model = _mklog(spark, [list("abd"), list("acd")] * 3)
    rows = {r["case_id"]: r for r in dfg_alignment(model).collect()}
    assert all(r["align_cost"] == 0 and r["fitness"] == 1.0 for r in rows.values())


def test_dfg_alignment_frozen_model_costs(spark):
    """Deviants aligned against a FROZEN model (the real usage — a DFG
    mined from the evaluated log legalizes its own traces by
    construction): model edges from clean {<a,b,d>, <a,c,d>}, then
    hand-checkable costs for skip / noise / reorder / empty traces."""
    from promi_spark.log import EventLog
    from promi_spark.operators.dfg import directly_follows
    from promi_spark.operators.mining import dfg_alignment

    model_log = _mklog(spark, [list("abd"), list("acd")] * 4)
    model = directly_follows(model_log, with_endpoints=True)

    rows = []
    for cid, acts in (
        ("clean", list("abd")),   # 0: legal walk
        ("skip", list("ad")),     # 1: insert b or c between a and d
        ("noise", list("abxd")),  # 1: log-move the unseen x
        ("reorder", list("da")),  # 3: log-move d, sync a, insert b,d
    ):
        for s_, a in enumerate(acts):
            rows.append((cid, s_, a, None))
    df = spark.createDataFrame(
        rows, "case_id string, seq long, activity string, ts timestamp"
    )
    marker = spark.createDataFrame(
        [("empty", None, None, None)],
        "case_id string, seq long, activity string, ts timestamp",
    )
    log = EventLog.from_events(df.unionByName(marker))
    out = {r["case_id"]: r for r in dfg_alignment(log, model_edges=model).collect()}

    assert out["clean"]["align_cost"] == 0 and out["clean"]["fitness"] == 1.0
    assert out["skip"]["align_cost"] == 1
    assert out["noise"]["align_cost"] == 1
    assert out["reorder"]["align_cost"] == 3
    # empty trace: the full shortest accepting path is inserted
    assert out["empty"]["n_events"] == 0
    assert out["empty"]["align_cost"] == 3  # >->a->{b|c}->d->#
    assert out["empty"]["fitness"] == 0.0
    # fitness normalization: cost / (n_events + model_len)
    assert out["skip"]["fitness"] == 1.0 - 1 / (2 + 3)
