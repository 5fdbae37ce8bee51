#!/usr/bin/env python3
"""Dump .explain('formatted') for named queries to plans/<round>/<q>_<tag>.txt.

Usage:
    PYTHONPATH=/root/repo python scripts/explain_dump.py <tag> <query> [query...]

``tag`` is typically ``before`` or ``after``. Runs against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on the bench session so
the plans match what the bench times. Queries that run a stream internally
still produce a plan for the RETURNED batch frame (the part Catalyst plans).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        repo, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r17")
    )
    os.makedirs(out_dir, exist_ok=True)

    sys.path.insert(0, repo)
    from datafusion_impl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("explain-dump")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
