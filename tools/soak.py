"""Scale soak: run the oracled registry at a big scale factor (default
the sf1 slice from tools/make_scale_slice.py — 10x the bench scale),
hash-verify against DuckDB where the oracle can keep up, and record
per-query Spark runtimes next to their sf0.1 reference so scaling
ratios are explicit.

Per query it records:
- ``sf1_sec`` / ``rows``   — Spark wall clock at the soak scale
- ``sf01_sec``             — same query, same session, at sf0.1
- ``ratio``                — sf1_sec / sf01_sec (10x data; linear-ish
                             scaling means ratio <= ~10; constant-work
                             queries sit near 1)
- ``oracle``               — "match" | "MISMATCH: ..." |
                             "timeout(<budget>s)" | "skipped"

DuckDB gets a per-oracle interrupt budget (``--oracle-budget``,
default 120 s): some oracles deliberately replay Spark's md5/minhash
arithmetic in SQL and are fine at the correctness scale (sf0.01) but
quadratically-ish slow in DuckDB at sf1 — those time out and are
recorded as rows+runtime-only evidence, exactly as the round brief
allows ("hash-verify where DuckDB can keep up").

Usage:
    python tools/soak.py [--sf1 DIR] [--out FILE] [--oracle-budget S]
                         [--no-oracle] [query ...]

``--no-oracle`` records rows+runtime only (for scales where DuckDB
cannot be asked to replay the quadratic oracles at all — e.g. the
sf10 slice); hash verification at sf0.01/sf0.1/sf1 stands as the
correctness witness.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# check_oracle parses argv at import; neutralize before importing its
# hashing helpers.
_real_argv = sys.argv
sys.argv = [sys.argv[0]]
from tools.check_oracle import norm_cell, table_hash  # noqa: E402

sys.argv = _real_argv

SF01 = "/root/testdata/sf0.1"


def duck_with_budget(con, sql: str, budget: float):
    """Run an oracle with an interrupt timer; None on timeout."""
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return cols, rows
    except Exception as e:
        if "INTERRUPT" in str(e).upper() or "interrupted" in str(e).lower():
            return None
        raise
    finally:
        timer.cancel()


def main() -> int:
    import duckdb

    from promi_spark.queries import QUERIES
    from promi_spark.session import get_spark

    args = sys.argv[1:]

    def opt(flag, default):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf1 = opt("--sf1", "/root/repo/.soak/sf1")
    out_path = opt("--out", "CROSSSCALE_sf1_r6.json")
    budget = float(opt("--oracle-budget", "120"))
    no_oracle = "--no-oracle" in args
    args = [a for a in args if a != "--no-oracle"]
    only = set(args)

    spark = get_spark("soak")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = f"{sf1}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    results: dict[str, dict] = {}
    failures: list[str] = []
    t_start = time.time()
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        if not only and sql is None:
            continue  # rows-only ops are suite-covered; soak the oracled set
        rec: dict = {}
        try:
            # Engine metric first: count() only, comparable to the
            # sf0.1 reference below and to bench.py (collecting a
            # multi-million-row result to Python is harness cost, not
            # engine cost — it is timed inside the oracle phase).
            t0 = time.time()
            sdf = fn(spark, sf1)
            rec["rows"] = sdf.count()
            rec["sf1_sec"] = round(time.time() - t0, 2)
            scols = sdf.columns
        except Exception as e:
            rec["err"] = f"spark: {e}"
            results[name] = rec
            failures.append(name)
            print(f"FAIL {name}: spark: {e}", flush=True)
            continue
        try:
            spark.catalog.clearCache()  # dedup/minhash persist shared rels
        except Exception:
            pass
        try:
            t0 = time.time()
            fn(spark, SF01).count()
            rec["sf01_sec"] = round(time.time() - t0, 2)
            rec["ratio"] = (
                round(rec["sf1_sec"] / rec["sf01_sec"], 1)
                if rec["sf01_sec"] > 0
                else None
            )
            spark.catalog.clearCache()
        except Exception:
            rec["sf01_sec"] = None
        if sql is None or no_oracle:
            rec["oracle"] = "rows-only" if sql is None else "skipped(--no-oracle)"
        else:
            try:
                t0 = time.time()
                duck = duck_with_budget(con, sql, budget)
                if duck is None:
                    rec["oracle"] = f"timeout({int(budget)}s)"
                else:
                    dcols, drows = duck
                    srows = [tuple(r) for r in sdf.collect()]
                    probs = []
                    if len(srows) != len(drows):
                        probs.append(f"rows {len(srows)} vs {len(drows)}")
                    if sorted(scols) != sorted(dcols):
                        probs.append("cols differ")
                    elif table_hash(scols, srows) != table_hash(dcols, drows):
                        probs.append("value-hash mismatch")
                    rec["oracle"] = "match" if not probs else (
                        "MISMATCH: " + "; ".join(probs)
                    )
                    # duckdb + spark-collect + hash compare time: the
                    # harness cost, kept separate from sf1_sec
                    rec["oracle_sec"] = round(time.time() - t0, 2)
                    if probs:
                        failures.append(name)
            except Exception as e:
                rec["oracle"] = f"oracle error: {e}"
                failures.append(name)
        results[name] = rec
        print(
            f"{name}: sf1 {rec.get('sf1_sec')}s ({rec.get('rows')} rows, "
            f"ratio {rec.get('ratio')}x) oracle={rec.get('oracle')}",
            flush=True,
        )

    matched = sum(1 for r in results.values() if r.get("oracle") == "match")
    timed_out = sum(
        1 for r in results.values() if str(r.get("oracle", "")).startswith("timeout")
    )
    summary = {
        "sf_dir": sf1,
        "generator": "tools/make_scale_slice.py (10 key-shifted sf0.1 "
        "replicas, per-replica text dialect + embedding offset)",
        "queries_run": len(results),
        "hash_matched": matched,
        "oracle_timeouts": timed_out,
        "failures": failures,
        "wall_sec": round(time.time() - t_start, 1),
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(
        f"wrote {out_path}: {matched} matched, {timed_out} oracle-timeout, "
        f"{len(failures)} failures, wall {summary['wall_sec']}s"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
