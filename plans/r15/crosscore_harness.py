"""Quiet-window cross-core scaling datapoint at sf1 (r14 VERDICT item
7): the 10 heaviest bench queries, min-of-3 per query in one JVM, at
the core count given by $SPARK_GRAFT_CPUS; canary probes stamp the
window. Appends one JSON object per run to the output file."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF1 = "/root/repo/.soak/sf1par"
OUT = sys.argv[1]

QUERIES10 = [
    "minhash_near_dups", "simhash_near_dups", "incremental_dedup",
    "semantic_dedup", "dsir_select", "bloom_decontaminate",
    "token_replay_fitness", "event_gaps", "trace_variants",
    "dedup_exact_docs",
]

from promi_spark.session import get_spark
from promi_spark.queries import QUERIES

spark = get_spark("crosscore_sf1")


def canary(reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        spark.range(20_000_000).selectExpr("bit_xor(xxhash64(id))").collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


# warm footers + JIT
QUERIES["stats_counts"][0](spark, SF1).count()
out = {
    "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0")),
    "sf_dir": SF1,
    "canary_start": canary(),
    "queries": {},
}
for name in QUERIES10:
    fn, _ = QUERIES[name]
    best = float("inf")
    reps = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, SF1).count()
        reps.append(round(time.time() - t0, 3))
        best = min(best, reps[-1])
    spark.catalog.clearCache()
    out["queries"][name] = {"min3": round(best, 3), "reps": reps}
out["canary_end"] = canary()
with open(OUT, "a") as fh:
    fh.write(json.dumps(out) + "\n")
print(json.dumps(out))
