"""Streaming soak at scale: replay the sf1 events table (1M rows)
through the file-source micro-batch engine with PRODUCTION-sized
triggers and record steady-state rows/sec for the stateful family.

The r6 profiling found the 4-file/trigger bench numbers are dominated
by per-trigger fixed cost (micro-batch planning + state-store commit),
not per-row work: >= 100k rows/trigger is the production sizing rule
recorded in BASELINE.md. This tool is that rule run at 10x the bench
scale, committed as an artifact (STREAM_SOAK_r{N}.json) instead of a
profiling table.

Usage:
    python tools/stream_soak.py [--sf1 DIR] [--files N]
                                [--files-per-trigger N] [--out FILE]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from promi_spark.io import load_event_log
    from promi_spark.session import get_spark
    from promi_spark.streaming import (
        read_event_stream,
        run_to_memory,
        sessionize,
        stateful_dfg,
    )

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
    replay = tempfile.mkdtemp(prefix="stream_soak_")
    try:
        log = load_event_log(spark, sf1)
        log.df.repartition(n_files).write.mode("overwrite").parquet(replay)
        n_rows = spark.read.parquet(replay).count()
        rows_per_trigger = n_rows // (n_files // fpt)
        out = {
            "sf_dir": sf1,
            "input_rows": n_rows,
            "replay_files": n_files,
            "files_per_trigger": fpt,
            "rows_per_trigger": rows_per_trigger,
            "queries": {},
        }
        print(
            f"replaying {n_rows} rows, {n_files} files, "
            f"{fpt}/trigger (~{rows_per_trigger} rows/trigger)",
            flush=True,
        )
        for name, build in (
            ("sessionize", lambda ev: sessionize(ev, key_col="resource")),
            ("stateful_dfg", stateful_dfg),
        ):
            ev = read_event_stream(spark, replay, max_files_per_trigger=fpt)
            t0 = time.time()
            q = run_to_memory(build(ev), f"soak_{name}")
            sec = time.time() - t0
            q.stop()
            rps = round(n_rows / sec)
            out["queries"][name] = {
                "drain_sec": round(sec, 2),
                "rows_per_sec": rps,
            }
            print(f"{name}: {sec:.1f}s ({rps} rows/s)", flush=True)
        # single availableNow batch: the amortized upper bound
        ev = read_event_stream(spark, replay)
        t0 = time.time()
        q = run_to_memory(stateful_dfg(ev), "soak_dfg_1batch")
        sec = time.time() - t0
        q.stop()
        out["queries"]["stateful_dfg_1batch"] = {
            "drain_sec": round(sec, 2),
            "rows_per_sec": round(n_rows / sec),
        }
        print(f"stateful_dfg_1batch: {sec:.1f}s "
              f"({round(n_rows / sec)} rows/s)", flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {out_path}")
        return 0
    finally:
        shutil.rmtree(replay, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
