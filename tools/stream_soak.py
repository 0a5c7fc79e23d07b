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
    for name, rec in out["queries"].items():
        print(f"{name}: {rec['drain_sec']:.1f}s "
              f"({rec['rows_per_sec']} rows/s)", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
