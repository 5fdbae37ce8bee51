"""Modern Spark-SQL engine surface: recursive CTEs, LATERAL correlated
subqueries, and the VARIANT semi-structured type (all Spark 4.x features the
SQL entry point exposes — the reference exercises its host engine through
SQL the same way, ``tests/regexp-tests.rs:83-125``).

Each query here is deliberately authored as SQL (``spark.sql``) rather than
DataFrame calls: the point is the SQL surface itself. DuckDB shares all
three constructs, so the oracles replay the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_impl_spark.sources.registry import load_table

__all__ = ["QUERIES", "ORACLES"]

#: EMA smoothing factor — new month weight.
_EMA_ALPHA = 0.2


def recursive_cte_revenue_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average of monthly order revenue via WITH
    RECURSIVE — a genuinely sequential recurrence (ema_i depends on
    ema_{i-1}) that no window frame expresses. ~80 months of recursion over
    a pre-aggregated frame: the recursion depth is the number of MONTHS, not
    rows, so at 100 TB the recursive part still iterates over a tiny
    aggregate while the heavy lifting (the monthly groupBy) is one ordinary
    shuffle."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rcte")
    return spark.sql(f"""
WITH RECURSIVE months AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(o_totalprice) AS revenue,
         ROW_NUMBER() OVER (ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE)) AS i
  FROM orders_rcte
  GROUP BY 1
),
ema AS (
  SELECT i, month, revenue, revenue AS ema FROM months WHERE i = 1
  UNION ALL
  SELECT m.i, m.month, m.revenue,
         e.ema * {1.0 - _EMA_ALPHA} + m.revenue * {_EMA_ALPHA}
  FROM ema e JOIN months m ON m.i = e.i + 1
)
SELECT month, ROUND(revenue, 2) AS revenue, ROUND(ema, 2) AS ema
FROM ema
ORDER BY month
""")


_RCTE_SQL = f"""
WITH RECURSIVE months AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(o_totalprice) AS revenue,
         ROW_NUMBER() OVER (ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE)) AS i
  FROM orders
  GROUP BY 1
),
ema AS (
  SELECT i, month, revenue, revenue AS ema FROM months WHERE i = 1
  UNION ALL
  SELECT m.i, m.month, m.revenue,
         e.ema * {1.0 - _EMA_ALPHA} + m.revenue * {_EMA_ALPHA}
  FROM ema e JOIN months m ON m.i = e.i + 1
)
SELECT month, ROUND(revenue, 2) AS revenue, ROUND(ema, 2) AS ema
FROM ema
ORDER BY month
"""


def lateral_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders by value for each market segment through a correlated
    LATERAL subquery — the decorrelated plan is the same broadcast +
    windowed top-k Catalyst produces for the DataFrame formulation, but the
    SQL shape (per-row subquery with ORDER BY/LIMIT) is what BI tools and
    migration workloads actually emit."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql("""
SELECT seg.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer_lat) seg,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders_lat o JOIN customer_lat c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = seg.c_mktsegment
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
ORDER BY seg.c_mktsegment, t.o_totalprice DESC, t.o_orderkey
""")


_LATERAL_SQL = """
SELECT seg.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) seg,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = seg.c_mktsegment
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
ORDER BY seg.c_mktsegment, t.o_totalprice DESC, t.o_orderkey
"""


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the VARIANT type: ``parse_json`` into a
    variant, ``variant_get`` typed field extraction, aggregated per event
    type. Versus the ``from_json``-struct path (structured.py), VARIANT
    needs no declared schema — the shredding happens at extraction, which is
    the right model for evolving event payloads at scale."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_var")
    return spark.sql("""
WITH parsed AS (
  SELECT event_type,
         variant_get(parse_json(props), '$.k', 'int') AS k
  FROM events_var
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM parsed
GROUP BY event_type
ORDER BY event_type
""")


_VARIANT_SQL = """
WITH parsed AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM parsed
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "recursive_cte_revenue_ema": recursive_cte_revenue_ema,
    "lateral_top_orders_per_segment": lateral_top_orders_per_segment,
    "events_props_variant": events_props_variant,
}

ORACLES = {
    "recursive_cte_revenue_ema": _RCTE_SQL,
    "lateral_top_orders_per_segment": _LATERAL_SQL,
    "events_props_variant": _VARIANT_SQL,
}
