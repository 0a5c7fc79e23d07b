"""Deterministic scale-up slice generator: build sfN data as K
key-shifted replicas of an existing sf directory (default: sf1 = 10x
sf0.1) without touching the read-only driver testdata.

Replication preserves every distribution the operators care about
(join fan-outs, key skew, value/time marginals) while keeping
referential integrity: each replica shifts every key column by
`replica * STRIDE[table]`, so orders still join customers, lineitems
still join orders/parts/suppliers, and events keep per-user trace
shapes. The fixed dims (region, nation) are shared, exactly like
TPC-H scale factors.

Two columns are additionally PERTURBED so the dedup / similarity
workloads keep their natural shape instead of degenerating into
K-clone clusters (which would inflate near-dup candidate counts ~K^2
and make soak timings unrepresentative):

- documents.text: replica i>0 applies a deterministic "dialect":
  EVERY token t is rewritten to a hash token of (t, i), at every
  occurrence — a bijective per-replica vocabulary map. Because the map
  depends only on token identity, any two documents INSIDE a replica
  keep their exact/near-dup relationship bit-for-bit (equal texts stay
  equal, shingle overlap is preserved), so the dedup workload scales
  its natural cluster structure Kx; ACROSS replicas the vocabularies
  are disjoint, so cross-replica shingle Jaccard is exactly 0 — the
  invariant that keeps the exact-Jaccard oracles valid for the banded
  MinHash operators at soak scale (see _perturb_text). n_chars is
  recomputed.
- embeddings.embedding: replica i>0 adds a deterministic hash-derived
  offset in [-0.35, 0.35] per dimension — far enough that a vector's
  replica twin is not its near-dup, close enough to keep the global
  geometry.

Everything is hash-based (xxhash64/md5) — no rand(), so output is
bit-reproducible run to run and partition-layout independent.

Two output layouts (the scan-parallelism knob — at these table sizes
every table fits inside one `spark.sql.files.maxPartitionBytes` split,
so layout decides whether a scan stage gets 1 task or many):

- `single` (default): ONE parquet file named `{table}.parquet` —
  DuckDB's read_parquet takes the path directly; Spark scan stages of
  sub-128MB tables run as a single task (pessimistic but simple).
- `parallel`: big tables land as a DIRECTORY named `{table}.parquet`
  holding N part files (the realistic lake layout); Spark reads the
  directory transparently and scan stages parallelize per file;
  DuckDB needs the `{table}.parquet/*.parquet` glob (tools/soak.py
  handles both).

Usage:
    python tools/make_scale_slice.py OUT_DIR [SRC_DIR] [K] [LAYOUT]
    # defaults: SRC_DIR=/root/testdata/sf0.1  K=10  LAYOUT=single
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

# Key strides: > max key of the base table at any realistic sf so
# shifted replicas can never collide.
STRIDE = {
    "custkey": 10_000_000,
    "suppkey": 1_000_000,
    "partkey": 10_000_000,
    "orderkey": 100_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}

# table -> {column: stride_key}
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
SHARED_DIMS = ("region", "nation")

# parallel-layout file counts (sized so every worker in a local[32]
# session gets scan work on the hot tables)
FILES = {
    "lineitem": 16,
    "orders": 8,
    "events": 16,
    "documents": 8,
    "embeddings": 4,
    "customer": 4,
    "part": 4,
    "supplier": 1,
}


def _perturb_text(df: DataFrame, i: int) -> DataFrame:
    """Apply replica i's token dialect (see module docstring) — pure
    codegen (split/transform/md5), no UDF.

    Replica i>0 rewrites EVERY token t -> 'w' + md5(t#i)[:8]: a
    per-replica bijective vocabulary map (8 hex chars ~ 4.3e9 values,
    so vocab collisions are negligible). Two docs INSIDE a replica keep
    their shingle-overlap relationship bit-for-bit (the map is 1:1 on
    tokens, hence 1:1 on n-grams), while ACROSS replicas the
    vocabularies are disjoint, so every cross-replica pair has Jaccard
    exactly 0. The earlier ~14%-of-vocab coin left short/low-diversity
    docs at MID similarity across replicas (J in [0.5, 0.9)), where
    banded MinHash recall is legitimately < 1 — which silently broke
    the exact-Jaccard oracle contract at soak scale. All-token rewrite
    restores the invariant the generator promises: the near-dup
    workload is K natural copies of the base workload, every true pair
    is a high-J within-replica pair, and the exact-pair oracle remains
    valid at any K."""
    if i == 0:
        return df
    toks = F.split(F.col("text"), r"\s+")
    perturbed = F.array_join(
        F.transform(
            toks,
            lambda x: F.concat(
                F.lit("w"),
                F.substring(F.md5(F.concat(x, F.lit(f"#{i}"))), 1, 8),
            ),
        ),
        " ",
    )
    return df.withColumn(
        "text", F.when(F.col("text").isNotNull(), perturbed)
    ).withColumn("n_chars", F.length(F.coalesce("text", F.lit(""))).cast("long"))


def _perturb_embedding(df: DataFrame, i: int) -> DataFrame:
    """Add a deterministic per-dimension offset in [-0.35, 0.35]."""
    if i == 0:
        return df
    vid = F.col("vec_id").cast("string")
    off = lambda x, pos: (  # noqa: E731
        F.pmod(
            F.xxhash64(vid, F.lit(i), pos.cast("string")), F.lit(2001)
        ).cast("double")
        / 1000.0
        - 1.0
    ) * 0.35
    return df.withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x, pos: (x.cast("double") + off(x, pos)).cast("float"),
        ),
    )


def build(out_dir: str, src_dir: str, k: int, layout: str = "single",
          files_scale: int = 1) -> None:
    from promi_spark.session import get_spark

    spark = get_spark("make_scale_slice")
    os.makedirs(out_dir, exist_ok=True)

    def write_single(df: DataFrame, name: str) -> None:
        # files_scale multiplies the per-table file counts (r15: the
        # cross-core scaling runs need >= cores scan tasks; the
        # default FILES grid tops out at 16, which capped every scan
        # stage at 16 tasks and made 32-core runs read like 8-core)
        n_files = (
            FILES.get(name, 1) * files_scale if layout == "parallel" else 1
        )
        if n_files > 1:
            df.repartition(n_files).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )
            return
        tmp = os.path.join(out_dir, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out_dir, f"{name}.parquet"))
        shutil.rmtree(tmp)

    for name in SHARED_DIMS:
        write_single(
            spark.read.parquet(f"{src_dir}/{name}.parquet"), name
        )
        print(f"{name}: shared dim copied", flush=True)

    for name, shifts in SHIFTS.items():
        base = spark.read.parquet(f"{src_dir}/{name}.parquet")
        reps = []
        for i in range(k):
            r = base
            for col, skey in shifts.items():
                r = r.withColumn(
                    col,
                    (F.col(col) + F.lit(i * STRIDE[skey])).cast(
                        dict(base.dtypes)[col]
                    ),
                )
            if name == "documents":
                r = _perturb_text(r, i)
            elif name == "embeddings":
                r = _perturb_embedding(r, i)
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        write_single(out, name)
        n = spark.read.parquet(os.path.join(out_dir, f"{name}.parquet")).count()
        print(f"{name}: {n} rows ({k} replicas)", flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.soak/sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    layout = sys.argv[4] if len(sys.argv) > 4 else "single"
    files_scale = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    build(out, src, k, layout, files_scale)
