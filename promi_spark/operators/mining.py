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
from promi_spark.operators.dfg import END, START, directly_follows, footprint


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

    Runs driver-side on the collected footprint (|alphabet|^2 rows).
    """
    fp_rows = footprint(log).collect()
    rel = {(r["a"], r["b"]): r["relation"] for r in fp_rows}
    alphabet = sorted({a for a, _ in rel})

    def causal(a: str, b: str) -> bool:
        return rel.get((a, b)) == "->"

    def unrelated(a: str, b: str) -> bool:
        return rel.get((a, b)) == "#"

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
            and all(rel.get((x, x)) == "#" for x in (*A, *B))
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

    dfg = directly_follows(log, with_endpoints=True).collect()
    starts = sorted(
        r["next_activity"] for r in dfg if r["activity"] == START
    )
    ends = sorted(r["activity"] for r in dfg if r["next_activity"] == END)
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


def token_replay(log: EventLog, net: PetriNet) -> DataFrame:
    """Token-based conformance replay (Rozinat & van der Aalst, public
    formulation): replay each trace against the net counting produced/
    consumed/missing/remaining tokens; fitness per trace =
    ``0.5*(1 - m/c) + 0.5*(1 - r/p)``.

    One ``applyInPandas`` over case groups with the (tiny) net broadcast
    in the closure: a single shuffle on case_id, per-case state only —
    the 100 TB shape for per-trace folds the reference would write as a
    stateful Handler (``observer.rs:13-55``).
    """
    import pandas as pd

    places = [(set(p.ins), set(p.outs)) for p in net.places]

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        case_id = pdf["case_id"].iloc[0]
        tokens = {i: 0 for i in range(len(places))}
        produced = consumed = missing = 0
        # initial marking: token in the source place
        for i, (ins, _) in enumerate(places):
            if not ins:
                tokens[i] += 1
                produced += 1
        for act in pdf["activity"]:
            for i, (ins, outs) in enumerate(places):
                if act in outs:  # place feeds this transition
                    if tokens[i] > 0:
                        tokens[i] -= 1
                    else:
                        missing += 1
                    consumed += 1
            for i, (ins, outs) in enumerate(places):
                if act in ins:  # transition feeds this place
                    tokens[i] += 1
                    produced += 1
        # final marking: consume from the sink place
        for i, (ins, outs) in enumerate(places):
            if not outs:
                if tokens[i] > 0:
                    tokens[i] -= 1
                else:
                    missing += 1
                consumed += 1
        remaining = sum(tokens.values())
        fitness = 0.5 * (1 - missing / consumed if consumed else 1.0) + 0.5 * (
            1 - remaining / produced if produced else 1.0
        )
        return pd.DataFrame(
            [
                (
                    case_id,
                    int(len(pdf)),
                    produced,
                    consumed,
                    missing,
                    remaining,
                    round(fitness, 6),
                )
            ],
            columns=[
                "case_id", "n_events", "produced", "consumed",
                "missing", "remaining", "fitness",
            ],
        )

    return (
        log.trace_events()
        .select("case_id", "seq", "activity")
        .groupBy("case_id")
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
