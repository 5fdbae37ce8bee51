"""Semantic invariants for the CDC/temporal layer (plans/cdc.py) and the r4
corpus batching/layout operators — properties the exact-value oracle can't
express (interval disjointness, interleave fairness, clustering benefit).
Exactness itself is covered by tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_impl_spark.operators import sampling
from datafusion_impl_spark.plans import cdc
from datafusion_impl_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_merge_upsert_takes_every_update(spark):
    """Every key in the change feed must surface with the updated status —
    the 'U' bucket of the merged summary equals the feed's key count, and
    total row count is preserved (merge never duplicates or drops keys)."""
    orders = load_table(spark, SF_DIR, "orders")
    n_orders = orders.count()
    n_updates = orders.filter(F.col("o_orderkey") % 7 == 0).count()
    rows = {r["o_orderstatus"]: r for r in cdc.merge_upsert_latest_orders(spark, SF_DIR).collect()}
    assert rows["U"]["n_orders"] == n_updates
    assert sum(r["n_orders"] for r in rows.values()) == n_orders


def test_scd2_intervals_partition_the_timeline(spark):
    """Reconstruct the per-customer intervals and check SCD2 shape: exactly
    one open interval per customer, and each closed interval's valid_to is
    the next interval's valid_from (half-open coverage, no gaps/overlaps)."""
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("o_day"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("o_day", "o_orderkey")
    intervals = (
        orders.withColumn("prev", F.lag("o_orderstatus").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus")))
        .select(
            "o_custkey",
            F.col("o_day").alias("valid_from"),
            F.lead("o_day").over(w).alias("valid_to"),
        )
    )
    per_cust = intervals.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("valid_to").isNull(), 1)).alias("n_open"),
    )
    bad = per_cust.filter(F.col("n_open") != 1).count()
    assert bad == 0
    # half-open chaining: valid_to == next valid_from within each customer
    w2 = Window.partitionBy("o_custkey").orderBy("valid_from")
    chained = intervals.withColumn("nxt", F.lead("valid_from").over(w2)).filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("nxt"))
    )
    assert chained.count() == 0
    # and the summary's open-interval count equals the customer count
    summary = cdc.scd2_order_status_history(spark, SF_DIR)
    n_open_total = sum(r["n_open"] for r in summary.collect())
    assert n_open_total == orders.select("o_custkey").distinct().count()


def test_range_frame_counts_only_present_days(spark):
    """RANGE vs ROWS: n_days_7d is the number of PRESENT days in the last 7
    calendar days — never more than 7, and rev_7d ≥ rev (frames include the
    current row). A ROWS 6-preceding frame would always report 7 once past
    the first week; RANGE must not."""
    rows = cdc.range_frame_weekly_revenue(spark, SF_DIR).collect()
    assert rows, "no daily rows"
    assert all(1 <= r["n_days_7d"] <= 7 for r in rows)
    assert all(r["rev_7d"] >= r["rev"] - 0.01 for r in rows)
    # first row's frame contains only itself
    assert rows[0]["n_days_7d"] == 1
    assert abs(rows[0]["rev_7d"] - rows[0]["rev"]) < 0.01


def test_quantile_bins_are_ordered_and_balanced(spark):
    """Bins must tile the length axis in order (disjoint, increasing) and be
    equal-frequency up to tie granularity: every bin's population stays
    within [total/10 - max_tie, total/10 + max_tie] where max_tie is the
    largest single-length group (ties are indivisible by construction)."""
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    max_tie = (
        docs.groupBy("n_chars").count().agg(F.max("count")).collect()[0][0]
    )
    rows = sampling.doc_length_quantile_bins(spark, SF_DIR).collect()
    assert [r["bin"] for r in rows] == sorted(r["bin"] for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["max_chars"] < b["min_chars"]
    assert sum(r["n_docs"] for r in rows) == total
    target = total / 10
    for r in rows:
        assert abs(r["n_docs"] - target) <= max_tie


def test_interleave_is_weight_fair(spark):
    """In any prefix of the interleaved order, source s with weight w has
    emitted floor(T·w) or ceil(T·w) docs at virtual time T — the per-stride
    fairness guarantee that motivates the operator."""
    rows = sampling.interleave_sources_round_robin(spark, SF_DIR).collect()
    assert [r["position"] for r in rows] == list(range(1, len(rows) + 1))
    last_vt = max(r["rk"] / r["weight"] for r in rows)
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        w = rs[0]["weight"]
        expect = last_vt * w
        assert len(rs) <= int(expect) + 1, (src, len(rs), expect)
        # within-source order follows the rank (stable hash-ring order)
        assert [r["rk"] for r in sorted(rs, key=lambda r: r["position"])] == sorted(
            r["rk"] for r in rs
        )


def test_incremental_merge_equals_full_recompute(spark):
    """Merged-partials output must be row-identical to a from-scratch
    monthly aggregate (the algebraic claim of incremental maintenance)."""
    merged = {r["month"]: r for r in cdc.incremental_agg_merge(spark, SF_DIR).collect()}
    full = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .collect()
    )
    assert len(merged) == len(full)
    for r in full:
        m = merged[r["month"]]
        assert m["n_orders"] == r["n_orders"]
        assert abs(m["revenue"] - r["revenue"]) < 0.02


def test_priority_dedup_curated_always_wins(spark):
    """Every curated row must be kept (priority 1 beats any web copy of the
    same content, and curated rows are unique per doc_id); the ceded count
    lands entirely on the web corpus."""
    from datafusion_impl_spark.operators.dedup import dedup_union_priority

    rows = {r["corpus"]: r for r in dedup_union_priority(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents")
    n_curated_hashes = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(F.md5("text").alias("h"))
        .distinct()
        .count()
    )
    # curated keeps exactly one row per distinct curated content hash
    assert rows["curated"]["n_kept"] == n_curated_hashes
    # every web row whose content exists in curated must cede
    assert rows["web"]["n_ceded"] >= rows["curated"]["n_kept"]
    assert rows["curated"]["n_ceded"] == rows["curated"]["n_rows"] - n_curated_hashes


def test_merge_deletes_update_then_delete_trap(spark, sf_dir):
    """A key divisible by both 7 and 13 gets an update (v2) AND a delete
    (v3): the delete must win. Survivor count per status must exclude every
    %13 key, and the audit column must equal the %13 key count."""
    from pyspark.sql import functions as F

    from datafusion_impl_spark.plans.cdc import merge_cdc_with_deletes
    from datafusion_impl_spark.sources.registry import load_table

    out = merge_cdc_with_deletes(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_del = orders.filter(F.col("o_orderkey") % 13 == 0).count()
    n_all = orders.count()
    assert out[0].n_deleted == n_del
    assert sum(r.n_orders for r in out) == n_all - n_del
    # updated-but-not-deleted keys surface under status 'U'
    n_upd_only = orders.filter(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0)
    ).count()
    assert {r.o_orderstatus: r.n_orders for r in out}.get("U", 0) == n_upd_only


def test_stream_cdc_equals_batch_twin(spark, sf_dir):
    """The foreachBatch streaming CDC apply must land on exactly the batch
    merge's final state for the same feed subset."""
    from pyspark.sql import functions as F

    from datafusion_impl_spark.plans.cdc import merge_cdc_with_deletes
    from datafusion_impl_spark.streaming import (
        _CDC_FEED_MOD,
        stream_cdc_merge_stats,
    )

    got = {
        (r.o_orderstatus): (r.n_orders, r.sum_price, r.n_deleted)
        for r in stream_cdc_merge_stats(spark, sf_dir).collect()
    }
    # batch twin on the same subset: reuse the batch op's logic by checking
    # the streaming result against a direct batch computation of the feed
    from datafusion_impl_spark.sources.registry import load_table
    from pyspark.sql import Window

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % _CDC_FEED_MOD == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    feed = (
        orders.select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            F.lit(1).alias("version"), F.lit("I").alias("op"))
        .unionByName(
            orders.filter(F.col("o_orderkey") % 7 == 0).select(
                "o_orderkey", F.lit("U").alias("o_orderstatus"),
                "o_totalprice", F.lit(2).alias("version"),
                F.lit("U").alias("op")))
        .unionByName(
            orders.filter(F.col("o_orderkey") % 13 == 0).select(
                "o_orderkey", F.lit("X").alias("o_orderstatus"),
                "o_totalprice", F.lit(3).alias("version"),
                F.lit("D").alias("op")))
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    latest = feed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    n_deleted = latest.filter(F.col("op") == "D").count()
    expected = {
        r.o_orderstatus: (r.n_orders, r.sum_price, n_deleted)
        for r in latest.filter(F.col("op") != "D")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .collect()
    }
    assert got == expected
