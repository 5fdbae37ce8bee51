#!/usr/bin/env python3
"""Ad-hoc oracle checker: run named queries() entries (or all) against their
DuckDB oracles at sf0.01 with a plain driver-style session. Usage:

    python scripts/check_oracles.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m
    from datafusion_impl_spark.sources.registry import TABLES
    from tests.oracle_utils import compare_spark_duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    qs, osql = m.queries(), m.oracle_sql()
    names = sys.argv[1:] or sorted(osql)
    failures = 0
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.01")
        if name in osql:
            ok, msg = compare_spark_duckdb(df, con, osql[name])
            print(("PASS " if ok else "FAIL ") + name + ("" if ok else f": {msg[:400]}"))
            failures += 0 if ok else 1
        else:
            print(f"ROWS {name}: {df.count()}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
