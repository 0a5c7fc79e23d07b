"""Dump the optimized + physical plan of any registered query — the
audit surface for the plan-shape properties (pushdown, pruning,
broadcasts, exchange counts) that tests/test_plan_shapes.py gates.

Usage: python tools/explain_query.py <query> [sf_dir] [--mode formatted|extended|cost]
       python tools/explain_query.py --list
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    mode = "formatted"
    if "--mode" in args:
        mode = args[args.index("--mode") + 1]
        del args[args.index("--mode"): args.index("--mode") + 2]

    from promi_spark.queries import QUERIES

    if not args or args[0] == "--list":
        for name, (_, sql) in QUERIES.items():
            print(("oracled  " if sql else "rows-only") + "  " + name)
        return 0

    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in QUERIES:
        print(f"unknown query {name!r}; --list shows the registry", file=sys.stderr)
        return 1

    from promi_spark.session import get_spark

    spark = get_spark("explain_query")
    df = QUERIES[name][0](spark, sf_dir)
    je = df._jdf.queryExecution()
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    print(je.explainString(em.fromString(mode)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
