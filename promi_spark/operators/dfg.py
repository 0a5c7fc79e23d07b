"""Process-discovery aggregations: directly-follows graph, footprint
matrix, heuristic/alpha-miner relations (reference capability roadmap,
``src/lib.rs:11-22`` — DFGGenerator/FootprintGenerator/HeuristicMiner/
AlphaMiner are declared consumers of the Log; no reference code exists,
so these are Spark-native designs).

Scale notes: the DFG is ONE window pass (shuffle on case_id) + one hash
aggregation whose output is |activities|^2-bounded — tiny regardless of
input scale. The footprint/alpha/heuristic layers operate on that tiny
edge relation, so they broadcast/self-join for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from promi_spark.log import EventLog

# Artificial endpoint activities (standard process-mining convention)
START = "__START__"
END = "__END__"


def directly_follows(log: EventLog, with_endpoints: bool = False) -> DataFrame:
    """DFG edge list: (activity, next_activity, n) per adjacent pair
    within each trace, ordered by ``seq``.

    ``lead`` over the per-case window; with_endpoints adds START->first
    and last->END edges (needed by alpha/heuristic miners).

    The endpoint variant emits all three edge kinds from ONE window
    pass (``lead`` + ``row_number`` over the same spec) as a 1-2
    element edge array per event, exploded and counted — the previous
    3-branch union re-ran the per-case sort + window per branch
    (measured: 6 Window/Sort nodes and 3 scans in the physical plan vs
    2 Window on one scan now; same edge multiset, so identical counts).
    """
    w = Window.partitionBy("case_id").orderBy("seq")
    # Empty traces are legal XES (log.rs:13-20) and surface as marker
    # rows with NULL seq/activity; they carry no DFG edges — without
    # this filter they'd inject (__START__, NULL)/(NULL, __END__) edges.
    real = log.trace_events().filter(F.col("seq").isNotNull())
    if with_endpoints:
        rows = real.select(
            "activity",
            F.lead("activity").over(w).alias("next_activity"),
            F.row_number().over(w).alias("rn"),
        )
        # per event: its outgoing edge (last event's successor is END),
        # plus the START edge when it opens the trace
        e_main = F.struct(
            F.col("activity").alias("a"),
            F.coalesce("next_activity", F.lit(END)).alias("b"),
        )
        e_start = F.struct(F.lit(START).alias("a"), F.col("activity").alias("b"))
        arr = F.when(F.col("rn") == 1, F.array(e_start, e_main)).otherwise(
            F.array(e_main)
        )
        edges = rows.select(F.explode(arr).alias("e")).select(
            F.col("e.a").alias("activity"), F.col("e.b").alias("next_activity")
        )
    else:
        pairs = real.withColumn("next_activity", F.lead("activity").over(w))
        edges = pairs.filter(F.col("next_activity").isNotNull()).select(
            "activity", "next_activity"
        )
    return edges.groupBy("activity", "next_activity").agg(
        F.count(F.lit(1)).alias("n")
    )


def footprint(log: EventLog) -> DataFrame:
    """Footprint matrix over the activity alphabet: for each (a, b)
    relation in {'->', '<-', '||', '#'} (van der Aalst footprint):
    a->b iff a directly-follows b and not b directly-follows a; '||' if
    both; '#' if neither. Full cross of the alphabet (tiny) left-joined
    against the DFG edge set.
    """
    dfg = directly_follows(log).select("activity", "next_activity")
    acts = (
        log.trace_events()
        .filter(F.col("activity").isNotNull())
        .select("activity")
        .distinct()
    )
    pairs = acts.select(F.col("activity").alias("a")).crossJoin(
        acts.select(F.col("activity").alias("b"))
    )
    ab = dfg.select(
        F.col("activity").alias("a"), F.col("next_activity").alias("b"),
        F.lit(True).alias("ab"),
    )
    ba = dfg.select(
        F.col("next_activity").alias("a"), F.col("activity").alias("b"),
        F.lit(True).alias("ba"),
    )
    m = (
        pairs.join(F.broadcast(ab), ["a", "b"], "left")
        .join(F.broadcast(ba), ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.when(F.col("ab").isNotNull() & F.col("ba").isNotNull(), "||")
            .when(F.col("ab").isNotNull(), "->")
            .when(F.col("ba").isNotNull(), "<-")
            .otherwise("#")
            .alias("relation"),
        )
    )
    return m


def heuristic_dependency(log: EventLog) -> DataFrame:
    """Heuristic-miner dependency measure per ordered pair:
    ``(|a>b| - |b>a|) / (|a>b| + |b>a| + 1)`` (Weijters et al. 2006,
    public formulation). Computed on the tiny DFG relation via a full
    outer self-join on the reversed edge."""
    dfg = directly_follows(log)
    fwd = dfg.select(
        F.col("activity").alias("a"), F.col("next_activity").alias("b"),
        F.col("n").alias("n_ab"),
    )
    rev = dfg.select(
        F.col("next_activity").alias("a"), F.col("activity").alias("b"),
        F.col("n").alias("n_ba"),
    )
    return (
        fwd.join(rev, ["a", "b"], "full_outer")
        .select(
            "a",
            "b",
            F.coalesce("n_ab", F.lit(0)).alias("n_ab"),
            F.coalesce("n_ba", F.lit(0)).alias("n_ba"),
        )
        .withColumn(
            "dependency",
            (F.col("n_ab") - F.col("n_ba"))
            / (F.col("n_ab") + F.col("n_ba") + F.lit(1)),
        )
    )


def activity_stats(log: EventLog) -> DataFrame:
    """Per-activity frequency profile (the DFG's node weights): count,
    distinct cases, first/last occurrence."""
    return (
        log.df.groupBy("activity")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("case_id").alias("n_cases"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def trace_variants(log: EventLog) -> DataFrame:
    """Trace variants: the ordered activity sequence per case, grouped
    and counted — the canonical process-mining 'variant explorer'.
    ``sort_array`` over (seq, activity) structs keeps collect_list
    deterministic."""
    per_case = (
        log.trace_events()
        .groupBy("case_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seq", "activity"))),
                    lambda s: s.getField("activity"),
                ),
                ",",
            ).alias("variant")
        )
    )
    return per_case.groupBy("variant").agg(F.count(F.lit(1)).alias("n_cases"))


def handover_network(
    log: EventLog,
    resource_col: str = "resource",
    include_self: bool = False,
) -> DataFrame:
    """Handover-of-work social network (organizational mining, van der
    Aalst & Song public formulation): (from_resource, to_resource, n)
    counting adjacent in-trace events performed by the two resources —
    who passes work to whom. ``include_self=False`` (default) drops
    self-handovers. Identical scale shape to the DFG: one
    hashpartitioning(case_id) exchange feeds the lead window, the
    |resources|^2-bounded edge aggregate combines map-side.

    NULL-resource events STAY in the window (an anonymous event still
    breaks the adjacency — no edge is invented across it); the two
    edges touching it are dropped afterward. This matches the SQL
    oracle, where ``to_resource <> resource`` is NULL-rejecting on
    both sides.
    """
    w = Window.partitionBy("case_id").orderBy("seq")
    real = log.trace_events().filter(F.col("seq").isNotNull())
    pairs = real.withColumn("to_resource", F.lead(resource_col).over(w))
    out = pairs.filter(
        F.col("to_resource").isNotNull() & F.col(resource_col).isNotNull()
    )
    if not include_self:
        out = out.filter(F.col("to_resource") != F.col(resource_col))
    return out.groupBy(
        F.col(resource_col).alias("from_resource"), "to_resource"
    ).agg(F.count(F.lit(1)).alias("n"))


def eventually_follows(log: EventLog) -> DataFrame:
    """Eventually-follows graph (EFG): (activity, later_activity, n)
    counting traces where some occurrence of ``activity`` precedes
    some occurrence of ``later_activity`` — the long-range companion
    of the directly-follows graph (same public process-mining
    formulation family as the DFG/footprint).

    Never a per-event self-join: one case shuffle aggregates each
    trace's (activity, min_seq, max_seq) profile — |alphabet|-bounded
    — and the alphabet x alphabet pair generation happens INSIDE the
    collected per-trace array with ``transform``/``flatten`` (no
    second exchange; the per-trace work is |alphabet|^2, independent
    of trace length). A self-pair (a, a) counts only traces with two
    occurrences (min_seq < max_seq).
    """
    per = (
        log.trace_events()
        .filter(F.col("seq").isNotNull())
        .groupBy("case_id", "activity")
        .agg(F.min("seq").alias("mn"), F.max("seq").alias("mx"))
    )
    arr = per.groupBy("case_id").agg(
        F.collect_list(F.struct("activity", "mn", "mx")).alias("acts")
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                F.col("acts"),
                lambda a: F.transform(
                    F.col("acts"),
                    lambda b: F.struct(
                        a["activity"].alias("activity"),
                        b["activity"].alias("later_activity"),
                        F.when(
                            a["activity"] == b["activity"],
                            a["mn"] < a["mx"],
                        )
                        .otherwise(a["mn"] < b["mx"])
                        .alias("ok"),
                    ),
                ),
            )
        ),
        lambda p: p["ok"],
    )
    return (
        arr.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.activity").alias("activity"),
            F.col("p.later_activity").alias("later_activity"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
