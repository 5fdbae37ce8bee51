#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing methodology: one warm-up run of q1 to absorb JVM/codegen startup,
then each query is executed once with a full materialization
(df.write.format("noop") would skip result transfer; we use count-style
collect of all columns via .foreach-less collect() kept small by the
queries' own aggregations/limits).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datafusion_impl_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("datafusion_impl_spark-bench")
    queries = entrymod.queries()

    # Warm-up: JVM JIT + codegen + parquet footer caches.
    queries["q1_pricing_summary"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
