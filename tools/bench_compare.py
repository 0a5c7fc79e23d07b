"""Spark-vs-DuckDB timing comparison at a given sf (default 0.1): runs
every oracle-backed query on both engines (warm, best of `reps`) and
prints a markdown table for BASELINE.md.

Usage: python tools/bench_compare.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

FAMILIES = {
    "filters (F2, F5–F7)": [
        "filter_concept_eq", "filter_concept_in", "filter_concept_match",
        "filter_time_contained", "filter_trace_scope", "cnf_filter",
    ],
    "stats aggregation (A1, A3, A4)": [
        "stats_counts", "per_trace_counts", "trace_intervals",
        "classifier_counts", "activity_stats",
    ],
    "validation pack (V1, W3)": [
        "chronology_violations", "chronology_violations_injected",
        "validation_globals",
    ],
    "split/sample (P1, P2)": ["split_train", "sample_events"],
    "DFG / windowed ops (A5, W1–W3)": [
        "dfg", "dfg_endpoints", "footprint", "heuristic_dependency",
        "heuristic_net", "trace_variants", "event_gaps",
    ],
    "relational joins (TPC-H-ish)": [
        "tpch_q1", "tpch_q6", "revenue_by_nation",
        "order_priority_counts", "part_brand_volume",
    ],
    "dedup / text (training-data ops)": [
        "dedup_exact_docs", "doc_fingerprint", "token_counts_docs",
        "bpe_token_counts", "text_quality", "lang_id_docs",
    ],
    "similarity (embeddings)": ["embedding_norms", "knn_cosine"],
}


def main() -> int:
    import duckdb

    from promi_spark.queries import QUERIES
    from promi_spark.session import get_spark

    spark = get_spark("bench_compare")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    def time_spark(fn) -> float:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        return best

    def time_duck(sql: str) -> float:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        return best

    print(f"sf_dir={SF_DIR} reps={REPS} (best-of, warm)\n")
    print("| query family (SURVEY §2) | sf | sec/family (Spark) | sec/family (DuckDB oracle) | ratio |")
    print("|---|---|---|---|---|")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    per_query = {}
    for fam, names in FAMILIES.items():
        s_tot = d_tot = 0.0
        for n in names:
            fn, sql = QUERIES[n]
            fn(spark, SF_DIR).count()  # warm (codegen compile)
            s = time_spark(fn)
            d = time_duck(sql)
            per_query[n] = (s, d)
            s_tot += s
            d_tot += d
        print(
            f"| {fam} | {sf} | {s_tot:.2f} | {d_tot:.2f} | "
            f"{s_tot / d_tot:.1f}× |"
        )
    print("\nPer query (sec, Spark vs DuckDB):")
    for n, (s, d) in sorted(per_query.items(), key=lambda kv: -kv[1][0]):
        print(f"  {n:32s} {s:7.3f}  {d:7.3f}  {s/max(d,1e-9):6.1f}×")
    return 0


if __name__ == "__main__":
    sys.exit(main())
