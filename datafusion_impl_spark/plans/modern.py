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
from pyspark.sql import functions as F

from datafusion_impl_spark.sources.registry import load_table

__all__ = ["QUERIES", "ORACLES"]

#: EMA smoothing factor — new month weight.
_EMA_ALPHA = 0.2


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared seed: monthly order revenue + 1-based month index. This is the
    only part of the EMA queries that touches the fact table — one ordinary
    groupBy shuffle at any scale; the output is one row per MONTH (~80)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    return monthly.select(
        "month",
        "revenue",
        F.row_number().over(Window.orderBy("month")).alias("i"),
    )


#: Months folded per recursive step (see recursive_cte_revenue_ema).
_EMA_BLOCK = 8


def recursive_cte_revenue_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average of monthly order revenue via WITH
    RECURSIVE — the genuinely sequential recurrence (ema_i depends on
    ema_{i-1}) expressed through the iterative SQL surface.

    Cost discipline (the r3 bench measured 25 s for the naive per-month
    recursion): every UNION ALL step of a recursive CTE is a
    driver-coordinated job, so per-iteration scheduling dominates when the
    recursive frame is tiny. Standard fix for a LINEAR recurrence: *blocked
    evaluation* — recurse over blocks of ``_EMA_BLOCK`` months and fold the
    months inside a block with a higher-order ``aggregate`` (the exact same
    multiply-add sequence as the per-month recursion, so results are
    bit-identical), cutting iteration count by the block factor. The block
    seed is pre-aggregated once (one ordinary groupBy shuffle over orders —
    the only part that touches the fact table), ``coalesce(1)`` +
    ``localCheckpoint``-ed so no step re-scans the source. r4 measured:
    25.3 s → ~2 s at sf0.1.

    See also :func:`ema_revenue_closed_form` — the same recurrence as a
    closed-form exponentially-weighted prefix sum (one window, no
    iteration), the shape to prefer when a closed form exists."""
    months = _monthly_revenue(spark, sf_dir)
    blocks = (
        months.withColumn(
            # div-safe: _EMA_BLOCK is a nonzero module constant
            "b", ((F.col("i") - 1) / _EMA_BLOCK).cast("int") + 1
        )
        .groupBy("b")
        # struct sorts by leading field i → months inside a block in order
        .agg(F.sort_array(F.collect_list(F.struct("i", "month", "revenue"))).alias("ms"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    blocks.createOrReplaceTempView("blocks_rcte")

    def fold(init: str) -> str:
        """SQL fold of one block's months, carrying the running EMA in
        ``acc.last`` (NULL carry → first month seeds ema = revenue)."""
        return f"""aggregate(
        ms,
        named_struct('last', {init},
                     'out', CAST(array() AS ARRAY<STRUCT<i: INT, month: DATE, revenue: DOUBLE, ema: DOUBLE>>)),
        (acc, x) -> named_struct(
            'last', CASE WHEN acc.last IS NULL THEN CAST(x.revenue AS DOUBLE)
                         ELSE acc.last * {1.0 - _EMA_ALPHA} + x.revenue * {_EMA_ALPHA} END,
            'out', array_append(acc.out, named_struct(
                'i', x.i, 'month', x.month, 'revenue', x.revenue,
                'ema', CASE WHEN acc.last IS NULL THEN CAST(x.revenue AS DOUBLE)
                            ELSE acc.last * {1.0 - _EMA_ALPHA} + x.revenue * {_EMA_ALPHA} END))),
        acc -> acc.out)"""

    return spark.sql(f"""
WITH RECURSIVE ema_blocks AS (
  SELECT b, {fold('CAST(NULL AS DOUBLE)')} AS out
  FROM blocks_rcte WHERE b = 1
  UNION ALL
  SELECT m.b, {fold('element_at(e.out, -1).ema')} AS out
  FROM ema_blocks e JOIN blocks_rcte m ON m.b = e.b + 1
)
SELECT x.month AS month, ROUND(x.revenue, 2) AS revenue, ROUND(x.ema, 2) AS ema
FROM ema_blocks LATERAL VIEW explode(out) t AS x
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


def ema_revenue_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same EMA recurrence as :func:`recursive_cte_revenue_ema`, solved
    in closed form — EMA is a linear recurrence, so it is an exponentially
    weighted prefix sum:

        ema_i = (1-a)^(i-1) * rev_1  +  a * sum_{j=2..i} (1-a)^(i-j) * rev_j
              = (1-a)^i * cumsum_j<=i [ t_j ],
          t_j = (rev_1 if j=1 else a*rev_j) * (1-a)^(-j)

    One monthly groupBy + ONE ordered window over ~80 aggregate rows — no
    iteration, no per-month jobs. The (1-a)^(+/-i) rescaling stays far
    inside double range for any realistic month count (a=0.2 → 0.8^-80 ≈
    5e7); for unbounded i you would segment the sum, documented here as the
    known bound. This is the 100 TB-preferred formulation; the RCTE twin
    exists to exercise the iterative SQL surface itself."""
    from pyspark.sql import Window

    months = _monthly_revenue(spark, sf_dir)
    decay = F.lit(1.0 - _EMA_ALPHA)
    t = (
        F.when(F.col("i") == 1, F.col("revenue"))
        .otherwise(F.col("revenue") * F.lit(_EMA_ALPHA))
        * F.pow(decay, -F.col("i"))
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        months.withColumn("t", t)
        .select(
            "month",
            F.round("revenue", 2).alias("revenue"),
            F.round(F.pow(decay, F.col("i")) * F.sum("t").over(w), 2).alias("ema"),
        )
        .orderBy("month")
    )


_EMA_CLOSED_SQL = f"""
WITH months AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(o_totalprice) AS revenue,
         ROW_NUMBER() OVER (ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE)) AS i
  FROM orders
  GROUP BY 1
),
weighted AS (
  SELECT month, revenue, i,
         (CASE WHEN i = 1 THEN revenue ELSE revenue * {_EMA_ALPHA} END)
           * POWER({1.0 - _EMA_ALPHA}, -i) AS t
  FROM months
)
SELECT month, ROUND(revenue, 2) AS revenue,
       ROUND(POWER({1.0 - _EMA_ALPHA}, i)
             * SUM(t) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             2) AS ema
FROM weighted
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


def group_by_all_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern SQL aggregation ergonomics surface in one query:
    ``GROUP BY ALL`` (group on every non-aggregate select item),
    ``FILTER (WHERE ...)`` on individual aggregates (the standard way to
    compute conditional aggregates without CASE-NULL tricks), and
    ``ORDER BY ALL``. Spark 4 and DuckDB implement all three with matching
    semantics, so the oracle replays the query verbatim."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(_GBA_BODY.format(table="orders_gba"))


_GBA_BODY = """
SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS rev_finished,
       COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O') AS n_open_custs
FROM {table}
GROUP BY ALL
ORDER BY ALL
"""

_GBA_SQL = _GBA_BODY.format(table="orders")


def sql_variables_threshold_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables + EXECUTE IMMEDIATE + parameterized SQL — the
    scripting surface (DECLARE VARIABLE / SET VAR from a scalar subquery /
    `?` placeholders / named `:param` binding) that migration workloads and
    notebook pipelines drive the engine with. The threshold is computed
    once into a session variable (avg order price), then an
    EXECUTE IMMEDIATE statement counts per-priority orders above it, with
    the final projection bound through a named parameter. The oracle
    inlines the same scalar subquery — the point is that variable binding
    changes nothing semantically."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_var")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_threshold DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        "SET VAR price_threshold = (SELECT AVG(o_totalprice) FROM orders_var)"
    )
    big = spark.sql(
        """EXECUTE IMMEDIATE
           'SELECT o_orderpriority, COUNT(*) AS n_above,
                   ROUND(MIN(o_totalprice) - ?, 2) AS min_gap
            FROM orders_var WHERE o_totalprice > price_threshold
            GROUP BY o_orderpriority'
           USING price_threshold"""
    )
    big.createOrReplaceTempView("above_var")
    return spark.sql(
        "SELECT o_orderpriority, n_above, min_gap FROM above_var "
        "WHERE n_above > :min_n ORDER BY o_orderpriority",
        args={"min_n": 0},
    )


_SQL_VARS_SQL = """
WITH t AS (SELECT AVG(o_totalprice) AS thr FROM orders)
SELECT o_orderpriority, COUNT(*) AS n_above,
       ROUND(MIN(o_totalprice) - (SELECT thr FROM t), 2) AS min_gap
FROM orders, t
WHERE o_totalprice > t.thr
GROUP BY o_orderpriority
HAVING COUNT(*) > 0
ORDER BY o_orderpriority
"""


def collated_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping through Spark 4 COLLATIONS
    (``COLLATE UTF8_LCASE``) rather than a ``lower()`` rewrite — collation
    lives in the type, so every comparison/group/join on the column is
    case-insensitive without touching the data. A mixed-case segment column
    is planted (odd customers initcap'd), grouped under the collation, and
    normalized to lowercase only for presentation. The oracle replays the
    semantics with lower()."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_coll")
    return spark.sql("""
WITH planted AS (
  SELECT CASE WHEN c_custkey % 2 = 1 THEN initcap(c_mktsegment)
              ELSE c_mktsegment END AS seg,
         c_acctbal
  FROM customer_coll
)
SELECT lower(seg COLLATE UTF8_LCASE) AS segment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT seg COLLATE UTF8_BINARY) AS n_case_variants_merged,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM planted
GROUP BY seg COLLATE UTF8_LCASE
ORDER BY segment
""")


_COLLATION_SQL = """
WITH planted AS (
  SELECT CASE WHEN c_custkey % 2 = 1 THEN
           upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
         ELSE c_mktsegment END AS seg,
         c_acctbal
  FROM customer
)
SELECT lower(seg) AS segment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT seg) AS n_case_variants_merged,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM planted
GROUP BY lower(seg)
ORDER BY segment
"""


def sql_udf_revenue_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL user-defined functions — the declarative UDF surface the
    reference's host engine exposes through ``ScalarUDF`` registration
    (``readme.md:31-35``), here with zero Python in the execution path:

    - a SQL *scalar* function ``disc_price_sqludf(p, d) = p·(1−d)`` (inlined
      by the analyzer into the plan — whole-stage-codegen, exactly as if the
      expression were written at the call site), and
    - a SQL *table* function ``price_bins_sqludf(lo, hi, step)`` expanded
      LATERAL-free into an 11-row bin spine that is broadcast against
      lineitem with a band predicate (tiny side broadcast — the sanctioned
      nested-loop shape, never a shuffled cartesian).

    Bins are HALF-OPEN ``[bin_lo, bin_hi)`` (r4 ADVICE: the old closed
    integer bins ``[b, b+9999]`` silently dropped fractional prices in the
    gaps), and the spine spans [0, 110000) which covers TPC-H's price
    domain (max ~104,950) — every lineitem row lands in exactly one bin.
    Revenue sums go through DECIMAL(18,4) casts so the aggregate is
    addition-order-independent and engine-portable."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sqludf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price_sqludf(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION price_bins_sqludf(lo INT, hi INT, step INT)
RETURNS TABLE(bin_lo INT, bin_hi INT)
RETURN SELECT t.b AS bin_lo, t.b + step AS bin_hi
       FROM (SELECT explode(sequence(lo, hi, step)) AS b) t"""
    )
    return spark.sql(
        """
SELECT b.bin_lo, b.bin_hi,
       COUNT(*) AS n_items,
       ROUND(CAST(SUM(CAST(disc_price_sqludf(l_extendedprice, l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem_sqludf l
JOIN price_bins_sqludf(0, 100000, 10000) b
  ON l.l_extendedprice >= b.bin_lo AND l.l_extendedprice < b.bin_hi
GROUP BY b.bin_lo, b.bin_hi
ORDER BY b.bin_lo
"""
    )


_SQL_UDF_SQL = """
WITH bins AS (
  SELECT b AS bin_lo, b + 10000 AS bin_hi
  FROM (SELECT unnest(generate_series(0, 100000, 10000)) AS b)
)
SELECT CAST(bin_lo AS INTEGER) AS bin_lo,
       CAST(bin_hi AS INTEGER) AS bin_hi,
       COUNT(*) AS n_items,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN bins b ON l.l_extendedprice >= b.bin_lo AND l.l_extendedprice < b.bin_hi
GROUP BY b.bin_lo, b.bin_hi
ORDER BY bin_lo
"""


def pipe_syntax_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 ``|>`` operators) — the linear query-flow
    surface: table → WHERE → JOIN → AGGREGATE → SELECT → ORDER BY as
    sequential pipe stages. Same Catalyst plan as the nested form (the
    parser desugars stages 1:1), so this is an engine-surface query: it
    proves the dialect ships, while the oracle checks the desugaring against
    classic SQL semantics. Revenue goes through DECIMAL so the aggregate is
    order-independent."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_pipe")
    return spark.sql(
        """
FROM orders_pipe
|> WHERE o_orderstatus = 'O'
|> JOIN customer_pipe ON o_custkey = c_custkey
|> AGGREGATE COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
   GROUP BY c_mktsegment
|> SELECT c_mktsegment AS segment, n_orders,
          ROUND(CAST(rev AS DOUBLE), 2) AS revenue
|> ORDER BY segment
"""
    )


_PIPE_SQL = """
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'O'
GROUP BY c_mktsegment
ORDER BY segment
"""


def null_safe_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark ``<=>`` ≡ ANSI ``IS NOT DISTINCT
    FROM``) — the dimension-lookup pattern where a NULL key is a real,
    joinable category ("unassigned") instead of a dropped row: a plain
    equi-join silently loses every NULL-keyed fact row, the classic
    missing-revenue bug in segment reporting.

    Events derive a nullable segment (``NULLIF(user_id % 5, 0)`` — a fifth
    of users intentionally unassigned) and join to a 5-row inline dimension
    whose last row carries a NULL key. Plan: the dimension is a broadcast
    VALUES relation; a null-safe equi-condition still plans as a
    BroadcastHashJoin in Spark (``<=>`` is hashable), so the 100 TB shape
    is one map-side join, no shuffle."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_nsj")
    return spark.sql(
        """
WITH dim(seg, seg_label) AS (VALUES
  (1, 'alpha'), (2, 'beta'), (3, 'gamma'), (4, 'delta'),
  (CAST(NULL AS INT), 'unassigned')),
keyed AS (
  SELECT NULLIF(CAST(user_id % 5 AS INT), 0) AS seg, value FROM events_nsj
)
SELECT d.seg_label,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
FROM keyed k JOIN dim d ON k.seg <=> d.seg
GROUP BY d.seg_label
ORDER BY d.seg_label
"""
    )


_NULL_SAFE_SQL = """
WITH dim(seg, seg_label) AS (VALUES
  (1, 'alpha'), (2, 'beta'), (3, 'gamma'), (4, 'delta'),
  (CAST(NULL AS INT), 'unassigned')),
keyed AS (
  SELECT NULLIF(CAST(user_id % 5 AS INT), 0) AS seg, value FROM events
)
SELECT d.seg_label,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
FROM keyed k JOIN dim d ON k.seg IS NOT DISTINCT FROM d.seg
GROUP BY d.seg_label
ORDER BY d.seg_label
"""


def observed_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``Observation`` API (Spark 3.3+) — pipeline observability
    without a second scan: named aggregate metrics piggyback on a query's
    OWN action (here a noop-ish count over a filtered projection), and the
    driver reads them from the observation afterwards. This is how a
    production job emits row-count/quality gauges per stage without paying
    an extra pass over 100 TB.

    The observed metrics are returned as a 1-row DataFrame and
    value-checked against the oracle's direct aggregation — proving the
    piggybacked metrics equal a dedicated aggregate of the same scan."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 25
    )
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the host action
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                float(m["sum_qty"]),
                int(m["min_key"]),
                int(m["max_key"]),
            )
        ],
        schema="n_rows bigint, sum_qty double, min_key bigint, max_key bigint",
    )


_OBSERVE_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       MIN(l_orderkey) AS min_key,
       MAX(l_orderkey) AS max_key
FROM lineitem
WHERE l_quantity >= 25
"""


# --------------------------------------------------------------------------
# Holt-Winters additive forecasting (level + trend + seasonality)
# --------------------------------------------------------------------------

_HW_ALPHA, _HW_BETA, _HW_GAMMA = 0.3, 0.1, 0.2
#: seasonal period (months) and the block size of the blocked recursion.
_HW_SEASON = 12
_HW_BLOCK = 12

#: step expressions, inlined identically in BOTH engines (sub-expressions
#: are repeated rather than bound — same value, and SQL has no let):
#:   sp   = seasonal state for this month's slot (12 steps ago, or 0)
#:   fc   = one-step-ahead forecast made BEFORE seeing y
#:   lvl' = α(y − sp) + (1−α)(lvl + trd)
#:   trd' = β(lvl' − lvl) + (1−β)trd
#:   s'   = γ(y − lvl') + (1−γ)sp
_HW_SLOT = "(({i} - 1) % 12) + 1"


def _hw_exprs(y: str, i: str, lvl: str, trd: str, sp: str) -> dict[str, str]:
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    lvl1 = f"({a} * ({y} - {sp}) + {1.0 - a} * ({lvl} + {trd}))"
    return {
        "fc": f"({lvl} + {trd} + {sp})",
        "lvl1": lvl1,
        "trd1": f"({b} * ({lvl1} - {lvl}) + {1.0 - b} * {trd})",
        "sn": f"({g} * ({y} - {lvl1}) + {1.0 - g} * {sp})",
    }


def holt_winters_monthly_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE exponential smoothing over monthly order
    revenue — the classic level+trend+seasonality forecaster, reported as
    the one-step-ahead forecast and its residual per month (the backtest a
    demand-planning team reads). Zero-initialized seasonal state (level =
    first month, trend = 0), which the recursion washes out over the
    ~7-year series; a production deployment would use the classical
    first-season initialization — a seed change, not a plan change.

    Determinism: monthly revenue sums as DECIMAL(18,2) (exact, order-free)
    and is cast to double once; every smoothing step is the SAME inlined
    expression sequence in both engines (sub-expressions repeated, not
    bound), so the state walk is bit-identical and only the 2-dp output
    round matters.

    Scale shape: the only corpus-scale work is one monthly groupBy; the
    recursion follows the repo's blocked-linear-recurrence discipline
    (``recursive_cte_revenue_ema``): fold ``_HW_BLOCK`` months per
    recursive step with a higher-order ``aggregate`` carrying
    (level, trend, seasonal[12]) in a struct, so the ~84-month series
    costs 7 driver-coordinated steps, not 84."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    months = monthly.select(
        "month",
        "revenue",
        F.row_number().over(Window.orderBy("month")).alias("i"),
    )
    blocks = (
        months.withColumn(
            # div-safe: _HW_BLOCK is a nonzero module constant
            "b", ((F.col("i") - 1) / _HW_BLOCK).cast("int") + 1
        )
        .groupBy("b")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("i", "month", "revenue"))
            ).alias("ms")
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    blocks.createOrReplaceTempView("blocks_hw")

    e = _hw_exprs(
        y="x.revenue",
        i="x.i",
        lvl="acc.lvl",
        trd="acc.trd",
        sp=f"element_at(acc.seas, {_HW_SLOT.format(i='x.i')})",
    )
    out_t = (
        "ARRAY<STRUCT<i: INT, month: DATE, revenue: DOUBLE, forecast: DOUBLE>>"
    )
    step = f"""named_struct(
        'lvl', CASE WHEN acc.lvl IS NULL THEN CAST(x.revenue AS DOUBLE)
                    ELSE CAST({e['lvl1']} AS DOUBLE) END,
        'trd', CASE WHEN acc.lvl IS NULL THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST({e['trd1']} AS DOUBLE) END,
        'seas', CASE WHEN acc.lvl IS NULL THEN acc.seas
                     ELSE transform(acc.seas, (v, j) ->
                         IF(j + 1 = {_HW_SLOT.format(i='x.i')},
                            CAST({e['sn']} AS DOUBLE), v)) END,
        'out', array_append(acc.out, named_struct(
            'i', x.i, 'month', x.month, 'revenue', x.revenue,
            'forecast', CASE WHEN acc.lvl IS NULL
                             THEN CAST(x.revenue AS DOUBLE)
                             ELSE CAST({e['fc']} AS DOUBLE) END)))"""

    def fold(init: str) -> str:
        return f"aggregate(ms, {init}, (acc, x) -> {step}, acc -> acc)"

    seed = (
        "named_struct('lvl', CAST(NULL AS DOUBLE), 'trd', CAST(0.0 AS DOUBLE),"
        " 'seas', array_repeat(CAST(0.0 AS DOUBLE), 12),"
        f" 'out', CAST(array() AS {out_t}))"
    )
    carry = (
        "named_struct('lvl', e.st.lvl, 'trd', e.st.trd, 'seas', e.st.seas,"
        f" 'out', CAST(array() AS {out_t}))"
    )
    return spark.sql(f"""
WITH RECURSIVE hw_blocks AS (
  SELECT b, {fold(seed)} AS st FROM blocks_hw WHERE b = 1
  UNION ALL
  SELECT m.b, {fold(carry)} AS st
  FROM hw_blocks e JOIN blocks_hw m ON m.b = e.b + 1
)
SELECT x.month AS month, ROUND(x.revenue, 2) AS revenue,
       ROUND(x.forecast, 2) AS forecast,
       ROUND(ABS(x.revenue - x.forecast), 2) AS abs_err
FROM hw_blocks LATERAL VIEW explode(st.out) t AS x
ORDER BY month
""")


def _hw_sql() -> str:
    e = _hw_exprs(
        y="m.y",
        i="m.i",
        lvl="h.lvl",
        trd="h.trd",
        sp=f"h.seas[{_HW_SLOT.format(i='m.i')}]",
    )
    zero_list = "[" + ", ".join("CAST(0.0 AS DOUBLE)" for _ in range(12)) + "]"
    return f"""
WITH RECURSIVE months AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y,
         ROW_NUMBER() OVER (ORDER BY CAST(date_trunc('month', o_orderdate)
                                          AS DATE)) AS i
  FROM orders
  GROUP BY 1
),
hw(i, month, y, lvl, trd, seas, fc) AS (
  SELECT i, month, y, y, CAST(0.0 AS DOUBLE), {zero_list}, y
  FROM months WHERE i = 1
  UNION ALL
  SELECT m.i, m.month, m.y,
         CAST({e['lvl1']} AS DOUBLE),
         CAST({e['trd1']} AS DOUBLE),
         list_transform(generate_series(1, 12), j ->
             CASE WHEN j = {_HW_SLOT.format(i='m.i')}
                  THEN CAST({e['sn']} AS DOUBLE) ELSE h.seas[j] END),
         CAST({e['fc']} AS DOUBLE)
  FROM hw h JOIN months m ON m.i = h.i + 1
)
SELECT month, ROUND(y, 2) AS revenue, ROUND(fc, 2) AS forecast,
       ROUND(ABS(y - fc), 2) AS abs_err
FROM hw
ORDER BY month
"""


# --------------------------------------------------------------------------
# SQL scripting (BEGIN…END control flow — Spark 4.x procedural surface)
# --------------------------------------------------------------------------

#: the exposure cap the threshold search enforces.
_SCRIPT_FRAC = 0.05
#: histogram band width (dollars) — thresholds are band boundaries so the
#: band census answers ``price >= t`` exactly.
_SCRIPT_BAND = 1000


def sql_scripting_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedural SQL SCRIPTING (Spark 4.x ``BEGIN…END`` with ``DECLARE`` /
    ``SET`` / ``WHILE``) doing real work: a doubling search for the
    smallest power-of-two price threshold with at most {frac:.0%} of orders
    at or above it — the control-flow shape (iterate → re-check a data
    predicate) that previously required a driver-side loop, now expressed
    entirely inside the SQL surface.

    Scale discipline: the script never loops over the fact table — the
    query pre-aggregates orders into a ${band} band histogram ONCE (two-
    phase groupBy, bounded by the price domain), and every WHILE iteration
    re-checks a scalar subquery against that metadata-sized view. Doubling
    means O(log(max_price)) iterations. Thresholds are band boundaries, so
    the band census answers ``price >= t`` exactly; the DuckDB oracle
    solves the same search in closed form (MIN over the doubling ladder),
    which is equivalent because the exposed fraction is monotone in t."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    hist = orders.groupBy(
        F.floor(F.col("o_totalprice") / _SCRIPT_BAND).cast("long").alias("band")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    hist.createOrReplaceTempView("order_band_hist_script")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(f"""
BEGIN
  DECLARE n BIGINT;
  DECLARE t DOUBLE DEFAULT {float(_SCRIPT_BAND)!r};
  DECLARE frac DOUBLE DEFAULT 1.0;
  DECLARE n_above BIGINT DEFAULT 0;
  SET n = (SELECT SUM(cnt) FROM order_band_hist_script);
  WHILE frac > {_SCRIPT_FRAC!r} DO
    SET t = t * 2.0;
    SET n_above = (SELECT COALESCE(SUM(cnt), 0) FROM order_band_hist_script
                   WHERE band >= CAST(t AS BIGINT) / {_SCRIPT_BAND});
    -- div-safe: n = COUNT(*) of orders, >= 1
    SET frac = n_above / CAST(n AS DOUBLE);
  END WHILE;
  SELECT n AS n_orders, t AS threshold, n_above,
         ROUND(frac, 6) AS frac_at_or_above;
END
""")


sql_scripting_threshold_search.__doc__ = (
    sql_scripting_threshold_search.__doc__.format(
        frac=_SCRIPT_FRAC, band=_SCRIPT_BAND
    )
)

_SCRIPTING_SQL = f"""
WITH hist AS (
  SELECT CAST(FLOOR(o_totalprice / {_SCRIPT_BAND}) AS BIGINT) AS band,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1
),
n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
ladder AS (
  SELECT {float(_SCRIPT_BAND)!r} * POWER(2.0, k) AS t
  FROM (SELECT unnest(generate_series(1, 40)) AS k)
),
evals AS (
  SELECT t,
         (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) FROM hist
          WHERE band >= CAST(t AS BIGINT) / {_SCRIPT_BAND}) AS n_above
  FROM ladder
),
hit AS (
  -- the doubling loop stops at the FIRST t whose fraction clears the cap;
  -- the fraction is monotone non-increasing in t, so that is MIN(t)
  SELECT MIN(t) AS t FROM evals, n
  -- div-safe: n = COUNT(*) of orders, >= 1
  WHERE n_above / CAST(n AS DOUBLE) <= {_SCRIPT_FRAC!r}
)
SELECT n.n AS n_orders, hit.t AS threshold, e.n_above,
       -- div-safe: n = COUNT(*) of orders, >= 1
       ROUND(e.n_above / CAST(n.n AS DOUBLE), 6) AS frac_at_or_above
FROM hit JOIN evals e ON e.t = hit.t, n
"""


QUERIES = {
    "observed_scan_metrics": observed_scan_metrics,
    "sql_scripting_threshold_search": sql_scripting_threshold_search,
    "holt_winters_monthly_forecast": holt_winters_monthly_forecast,
    "null_safe_segment_join": null_safe_segment_join,
    "pipe_syntax_segment_revenue": pipe_syntax_segment_revenue,
    "sql_udf_revenue_bins": sql_udf_revenue_bins,
    "recursive_cte_revenue_ema": recursive_cte_revenue_ema,
    "ema_revenue_closed_form": ema_revenue_closed_form,
    "lateral_top_orders_per_segment": lateral_top_orders_per_segment,
    "events_props_variant": events_props_variant,
    "group_by_all_order_stats": group_by_all_order_stats,
    "sql_variables_threshold_report": sql_variables_threshold_report,
    "collated_segment_counts": collated_segment_counts,
}

ORACLES = {
    "observed_scan_metrics": _OBSERVE_SQL,
    "sql_scripting_threshold_search": _SCRIPTING_SQL,
    "holt_winters_monthly_forecast": _hw_sql(),
    "null_safe_segment_join": _NULL_SAFE_SQL,
    "pipe_syntax_segment_revenue": _PIPE_SQL,
    "sql_udf_revenue_bins": _SQL_UDF_SQL,
    "recursive_cte_revenue_ema": _RCTE_SQL,
    "ema_revenue_closed_form": _EMA_CLOSED_SQL,
    "lateral_top_orders_per_segment": _LATERAL_SQL,
    "events_props_variant": _VARIANT_SQL,
    "group_by_all_order_stats": _GBA_SQL,
    "sql_variables_threshold_report": _SQL_VARS_SQL,
    "collated_segment_counts": _COLLATION_SQL,
}
