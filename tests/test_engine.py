"""EngineContext façade tests — the reference README's usage flow
(``readme.md:36-57``) transcribed against this engine."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from datafusion_impl_spark.engine import EngineContext
from tests.conftest import SF_DIR


def _ctx(spark) -> EngineContext:
    return EngineContext(spark)


def test_readme_usage_flow(spark, tmp_path):
    """new context → (udf auto-registered) → read_csv → select with the
    function → show/collect — the full readme.md:36-57 flow."""
    ctx = _ctx(spark)
    csv = tmp_path / "data.csv"
    csv.write_text("text\nproduct-123-region\nitem-456-zone\n")
    df = ctx.read_csv(str(csv))
    result = df.select(
        F.col("text"),
        F.expr(r"regexp_extract_safe(text, '(\\d+)', 1)").alias("extracted"),
    )
    rows = result.collect()
    assert [r.extracted for r in rows] == ["123", "456"]
    result.show()  # pretty-print sink, readme.md:55


def test_sql_entry_point_resolves_udf(spark):
    ctx = _ctx(spark)
    row = ctx.sql(
        r"SELECT regexp_extract_safe('test-789-x', '-(\\d+)-', 1) AS v"
    ).collect()[0]
    assert row.v == "789"


def test_values_and_subquery(spark):
    ctx = _ctx(spark)
    got = ctx.sql(
        """
        SELECT id * 2 AS doubled
        FROM (SELECT * FROM VALUES (1),(2),(3) AS t(id))
        ORDER BY doubled
        """
    ).collect()
    assert [r.doubled for r in got] == [2, 4, 6]


def test_registered_testdata_views(spark):
    ctx = _ctx(spark)
    ctx.register_testdata(SF_DIR, ("nation", "region"))
    assert ctx.sql("SELECT COUNT(*) AS n FROM nation").collect()[0].n == 25


def test_concurrent_queries_one_context(spark):
    """Shared-context concurrency (regexp-tests.rs:149-191)."""
    ctx = _ctx(spark)

    def run(i: int) -> int:
        return ctx.sql(f"SELECT {i} * 10 AS v").collect()[0].v

    with ThreadPoolExecutor(max_workers=5) as pool:
        assert list(pool.map(run, range(5))) == [0, 10, 20, 30, 40]


def test_queries_registry_exposed(spark):
    qs = EngineContext.queries()
    assert "q1_pricing_summary" in qs and "dedup_documents_minhash" in qs


def test_hll_rollup_accuracy_and_merge_semantics(spark):
    """The merged-sketch estimate must sit within HLL error (±5% at the
    default lgConfigK) of the exact period distinct count, and the naive
    sum of daily estimates must exceed it whenever users appear on
    multiple days (the double-count the mergeable rollup exists to
    avoid)."""
    from pyspark.sql import functions as F

    from datafusion_impl_spark.plans.analytics import events_user_hll_rollup
    from datafusion_impl_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    rows = events_user_hll_rollup(spark, SF_DIR).collect()
    assert rows
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        e = exact[r["event_type"]]
        assert abs(r["est_unique_users"] - e) <= max(2, 0.05 * e)
        assert r["sum_daily_est"] >= r["est_unique_users"]
