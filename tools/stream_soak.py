"""Streaming soak at scale: replay the sf1 events table (1M rows)
through the file-source micro-batch engine with PRODUCTION-sized
triggers and record steady-state rows/sec for the stateful family.

The r6 profiling found the 4-file/trigger bench numbers are dominated
by per-trigger fixed cost (micro-batch planning + state-store commit),
not per-row work: >= 100k rows/trigger is the production sizing rule
recorded in BASELINE.md. This tool is that rule run at 10x the bench
scale, committed as an artifact (STREAM_SOAK_r{N}.json) instead of a
profiling table. The measurement itself is bench.py's
``drain_streaming`` — one implementation shared with the bench's
streaming section so the two artifacts can never disagree about how
the metric is computed.

Usage:
    python tools/stream_soak.py [--sf1 DIR] [--files N]
                                [--files-per-trigger N] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drain_decontaminate_gate(
    spark, sf_dir: str, n_files: int, files_per_trigger: int
) -> dict:
    """Throughput of the streaming benchmark-decontamination gate
    (r9 operator; r10 fixed the per-batch double work — index loaded
    once per stream, verdict persisted so the tokenize→gram→probe
    pipeline runs once per batch, not twice). Benchmark = every 7th
    doc; the rest replay through the file-source gate with
    production-shaped triggers. Records the one-time sketch build
    separately from the steady-state gate drain."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from promi_spark.io import load_table
    from promi_spark.operators.bloom import write_bench_bloom
    from promi_spark.streaming import streaming_decontaminate_ingest

    docs = load_table(spark, "documents", sf_dir)
    bench_docs = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    root = tempfile.mkdtemp(prefix="decon_soak_")
    try:
        idx = os.path.join(root, "bloom_idx")
        t0 = time.time()
        write_bench_bloom(bench_docs, idx, n=5, fp_rate=1e-6)
        build_sec = time.time() - t0

        replay = os.path.join(root, "replay")
        train.repartition(n_files).write.mode("overwrite").parquet(replay)
        n_docs = spark.read.parquet(replay).count()
        schema = spark.read.parquet(replay).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(replay)
        )
        good, rej = os.path.join(root, "good"), os.path.join(root, "rej")
        t0 = time.time()
        q = streaming_decontaminate_ingest(
            stream,
            idx,
            good_path=good,
            reject_path=rej,
            checkpoint=os.path.join(root, "ckpt"),
        )
        q.awaitTermination()
        drain_sec = time.time() - t0
        return {
            "input_docs": n_docs,
            "build_sec": round(build_sec, 2),
            "drain_sec": round(drain_sec, 2),
            "docs_per_sec": int(n_docs / drain_sec),
            "good_docs": spark.read.parquet(good).count(),
            "flagged_docs": spark.read.parquet(rej).count(),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    from bench import drain_streaming
    from promi_spark.session import get_spark

    args = sys.argv[1:]

    def opt(flag, default, cast=str):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return cast(v)
        return default

    sf1 = opt("--sf1", "/root/repo/.soak/sf1")
    n_files = opt("--files", 8, int)
    fpt = opt("--files-per-trigger", 2, int)
    out_path = opt("--out", "STREAM_SOAK_r7.json")

    spark = get_spark("stream_soak")
    res = drain_streaming(spark, sf1, n_files, fpt, label="soak")
    n_rows = res["input_rows"]
    n_triggers = max(1, -(-n_files // fpt))  # ceil; fpt may exceed files
    out = {
        "sf_dir": sf1,
        "input_rows": n_rows,
        "replay_files": n_files,
        "files_per_trigger": fpt,
        "rows_per_trigger": n_rows // n_triggers,
        "queries": {
            name: {
                "drain_sec": res[f"{name}_sec"],
                "rows_per_sec": res[f"{name}_rows_per_sec"],
            }
            for name in ("sessionize", "stateful_dfg", "stateful_dfg_1batch")
        },
    }
    gate = drain_decontaminate_gate(spark, sf1, n_files, fpt)
    out["decontaminate_gate"] = gate
    for name, rec in out["queries"].items():
        print(f"{name}: {rec['drain_sec']:.1f}s "
              f"({rec['rows_per_sec']} rows/s)", flush=True)
    print(
        f"decontaminate_gate: build {gate['build_sec']:.1f}s, drain "
        f"{gate['drain_sec']:.1f}s ({gate['docs_per_sec']} docs/s, "
        f"{gate['flagged_docs']} flagged / {gate['input_docs']})",
        flush=True,
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
