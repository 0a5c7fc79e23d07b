"""Process-model miners + conformance checking (reference capability
roadmap ``src/lib.rs:11-22``: AlphaMiner, HeuristicMiner, TokenReplay —
declared consumers with no reference code; these are Spark-native
designs following the public formulations).

Scale shape: every miner consumes the *aggregated* relations (DFG /
footprint), which are |alphabet|^2-bounded — tiny regardless of log
size — so model construction is driver-side set algebra on a collected
relation. Conformance (token replay) is the only per-trace pass: one
``applyInPandas`` over case groups against a broadcast Petri net — a
single shuffle on case_id, state bounded per case.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from promi_spark.log import EventLog
from promi_spark.operators.dfg import END, START, directly_follows


@dataclass(frozen=True)
class Place:
    """A Petri-net place: tokens flow in from ``ins``, out to ``outs``."""

    ins: tuple[str, ...]
    outs: tuple[str, ...]


@dataclass
class PetriNet:
    """Minimal workflow net: transitions = activities, plus source/sink."""

    transitions: list[str]
    places: list[Place] = field(default_factory=list)

    def to_rows(self) -> list[tuple[str, str]]:
        return [
            (",".join(p.ins), ",".join(p.outs)) for p in self.places
        ]


def alpha_miner(log: EventLog) -> PetriNet:
    """The alpha algorithm (van der Aalst, public formulation):

    1. footprint relations over the alphabet;
    2. candidate place pairs (A, B): all a in A, b in B with a->b, and
       A internally '#', B internally '#';
    3. keep only maximal pairs;
    4. add source place (-> start activities) and sink (end -> ).

    Runs driver-side on ONE collected endpoint-DFG (|alphabet|^2-bounded):
    the footprint relations, start set, and end set all derive from the
    same edge set, so alpha costs a single Spark job instead of the
    three (footprint + distinct-activities + endpoint DFG) a naive
    composition would run.
    """
    dfg_rows = directly_follows(log, with_endpoints=True).collect()
    edges = {(r["activity"], r["next_activity"]) for r in dfg_rows}
    alphabet = sorted(
        {a for a, _ in edges if a is not None and a != START}
        | {b for _, b in edges if b is not None and b != END}
    )

    def causal(a: str, b: str) -> bool:
        return (a, b) in edges and (b, a) not in edges

    def unrelated(a: str, b: str) -> bool:
        return (a, b) not in edges and (b, a) not in edges

    # candidate (A, B) sets — bounded alphabet, so powerset growth is
    # tamed by starting from pairs and expanding greedily
    candidates: set[tuple[tuple[str, ...], tuple[str, ...]]] = set()
    for a in alphabet:
        for b in alphabet:
            if causal(a, b):
                candidates.add(((a,), (b,)))

    def a_ok(A: tuple[str, ...], B: tuple[str, ...]) -> bool:
        return (
            all(causal(a, b) for a in A for b in B)
            and all(unrelated(x, y) for x, y in combinations(A, 2))
            and all(unrelated(x, y) for x, y in combinations(B, 2))
            and all(unrelated(x, x) for x in (*A, *B))
        )

    grown = True
    while grown:
        grown = False
        for A, B in list(candidates):
            for x in alphabet:
                biggerA = (tuple(sorted((*A, x))), B)
                if x not in A and biggerA not in candidates and a_ok(*biggerA):
                    candidates.add(biggerA)
                    grown = True
                biggerB = (A, tuple(sorted((*B, x))))
                if x not in B and biggerB not in candidates and a_ok(*biggerB):
                    candidates.add(biggerB)
                    grown = True

    maximal = [
        (A, B)
        for A, B in candidates
        if not any(
            (set(A) <= set(A2) and set(B) <= set(B2)) and (A, B) != (A2, B2)
            for A2, B2 in candidates
        )
    ]

    starts = sorted(
        b for a, b in edges if a == START and b is not None and b != END
    )
    ends = sorted(
        a for a, b in edges if b == END and a is not None and a != START
    )
    places = [Place(ins=(), outs=tuple(starts))]
    places += [Place(ins=A, outs=B) for A, B in sorted(maximal)]
    places.append(Place(ins=tuple(ends), outs=()))
    return PetriNet(transitions=alphabet, places=places)


def alpha_miner_df(log: EventLog) -> DataFrame:
    """Alpha-miner places as a DataFrame (in_set, out_set) — the
    driver-facing query surface."""
    net = alpha_miner(log)
    spark = log.df.sparkSession
    return spark.createDataFrame(
        net.to_rows(), "in_set string, out_set string"
    )


def heuristic_net(
    log: EventLog,
    dependency_threshold: float = 0.9,
    frequency_threshold: int = 1,
) -> DataFrame:
    """Heuristic miner: DFG edges kept when dependency measure and
    frequency clear the thresholds (Weijters et al., public
    formulation). Stays distributed — it is a filter on the dependency
    relation."""
    from promi_spark.operators.dfg import heuristic_dependency

    dep = heuristic_dependency(log)
    return dep.filter(
        (F.col("dependency") >= dependency_threshold)
        & (F.col("n_ab") >= frequency_threshold)
    ).select("a", "b", "n_ab", "dependency")


def token_replay(log: EventLog, net: PetriNet, buckets: int = 256) -> DataFrame:
    """Token-based conformance replay (Rozinat & van der Aalst, public
    formulation): replay each trace against the net counting produced/
    consumed/missing/remaining tokens; fitness per trace =
    ``0.5*(1 - m/c) + 0.5*(1 - r/p)``.

    One ``applyInPandas`` over hash buckets of cases with the (tiny) net
    broadcast in the closure as numpy incidence matrices: a single
    shuffle, per-case state only — the 100 TB shape for per-trace folds
    the reference would write as a stateful Handler (``observer.rs:13-55``).

    The replay fold itself is the Lindley-recursion closed form, not a
    Python loop: a trace's token count in place p after step j under
    clip-at-zero consumption is ``prefix_j - min(0, min_{i<=j} prefix_i)``
    of the unclipped ±1 delta prefix sum, so per-place missing tokens are
    ``max(0, -min_j prefix_j)`` and the whole trace replays as one
    (2E+1, P) cumsum + column-min in numpy. Hash-bucketing cases
    (``buckets`` groups, default 256 — size to ≥4× cluster cores) keeps
    Arrow batches large instead of one tiny group per case.
    """
    import numpy as np
    import pandas as pd

    trans_idx = {t: i for i, t in enumerate(net.transitions)}
    n_t, n_p = len(net.transitions), len(net.places)
    # consume[t, p]: place p feeds transition t; produce[t, p]: t feeds p.
    # Row n_t is all-zero — activities outside the net's alphabet no-op,
    # matching the set-membership semantics of the scalar formulation.
    consume = np.zeros((n_t + 1, n_p), dtype=np.int64)
    produce = np.zeros((n_t + 1, n_p), dtype=np.int64)
    for p_i, place in enumerate(net.places):
        for a in place.outs:
            if a in trans_idx:
                consume[trans_idx[a], p_i] = 1
        for a in place.ins:
            if a in trans_idx:
                produce[trans_idx[a], p_i] = 1
    init = np.array([1 if not p.ins else 0 for p in net.places], dtype=np.int64)
    sink = np.array([1 if not p.outs else 0 for p in net.places], dtype=np.int64)
    n_source, n_sink = int(init.sum()), int(sink.sum())

    cols = [
        "case_id", "n_events", "produced", "consumed",
        "missing", "remaining", "fitness",
    ]

    def replay(_key, pdf):
        pdf = pdf.sort_values(["case_id", "seq"], kind="mergesort")
        case_ids = pdf["case_id"].to_numpy()
        codes = np.array(
            [trans_idx.get(a, n_t) for a in pdf["activity"]], dtype=np.int64
        )
        bounds = np.nonzero(case_ids[1:] != case_ids[:-1])[0] + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(codes)]))
        rows = []
        for s, e in zip(starts, ends):
            c = codes[s:e]
            n_ev = int(e - s)
            deltas = np.empty((2 * n_ev + 1, n_p), dtype=np.int64)
            deltas[0 : 2 * n_ev : 2] = -consume[c]
            deltas[1 : 2 * n_ev : 2] = produce[c]
            deltas[-1] = -sink
            prefix = init + np.cumsum(deltas, axis=0)
            miss_p = np.maximum(-prefix.min(axis=0), 0)
            missing = int(miss_p.sum())
            remaining = int((prefix[-1] + miss_p).sum())
            consumed = int(consume[c].sum()) + n_sink
            produced = int(produce[c].sum()) + n_source
            fitness = 0.5 * (1 - missing / consumed if consumed else 1.0) + 0.5 * (
                1 - remaining / produced if produced else 1.0
            )
            rows.append(
                (case_ids[s], n_ev, produced, consumed, missing, remaining,
                 round(fitness, 6))
            )
        return pd.DataFrame(rows, columns=cols)

    return (
        log.trace_events()
        .select("case_id", "seq", "activity")
        .groupBy(F.pmod(F.xxhash64("case_id"), F.lit(buckets)).alias("__bucket"))
        .applyInPandas(
            replay,
            schema=(
                "case_id string, n_events int, produced int, consumed int, "
                "missing int, remaining int, fitness double"
            ),
        )
    )


def fitness_summary(replayed: DataFrame) -> DataFrame:
    """Log-level conformance: trace-weighted average fitness + share of
    perfectly fitting traces."""
    return replayed.agg(
        F.count(F.lit(1)).alias("n_traces"),
        F.round(F.avg("fitness"), 6).alias("avg_fitness"),
        F.round(
            F.avg((F.col("missing") == 0).cast("double")), 6
        ).alias("frac_fitting"),
    )
