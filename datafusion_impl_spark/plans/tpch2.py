"""Second tranche of TPC-H-style queries (adapted to the driver's simplified
star schema — no phone/comment/receiptdate columns), widening the relational
surface with the classic hard shapes: nation-pair joins with disjunctive
predicates (Q7), left-outer count distributions (Q13), correlated per-group
averages (Q17), and scalar-subquery + anti-join composition (Q22)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_impl_spark.plans.tpch import _REV_SQL, _dec, _revenue
from datafusion_impl_spark.sources.registry import load_table

__all__ = ["QUERIES", "ORACLES"]


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between two nations per year, either direction —
    the disjunctive nation-pair predicate after a 5-way join. nation is
    broadcast twice under different aliases; the big joins stay key-partitioned."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rev_pair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(pair | rev_pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
         {_REV_SQL} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count — left outer join (keep
    zero-order customers) feeding two cascaded aggregations."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: average yearly revenue lost if small-quantity orders (below half
    the part's average quantity) were dropped — the correlated per-group
    average, decorrelated into an agg + equi-join (the only shape that
    scales; a correlated subquery would rescan lineitem per part)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # avg computed in exact decimal (summation-order independent), then ONE
    # conversion to double before the 0.5 scale and the comparison — the same
    # conversion point the oracle uses, so boundary cases agree bit-for-bit.
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg(_dec("l_quantity")).cast("double") * 0.5).alias("half_avg")
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(_dec("l_quantity").cast("double") < F.col("half_avg"))
        .agg(
            (F.sum(_dec("l_extendedprice")) / 7.0)
            .cast("double")
            .alias("avg_yearly")
        )
    )


_Q17_SQL = """
WITH half_avg AS (
  SELECT l_partkey AS pk,
         CAST(AVG(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) * 0.5 AS half_avg
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem JOIN half_avg ON l_partkey = pk
WHERE CAST(CAST(l_quantity AS DECIMAL(12,4)) AS DOUBLE) < half_avg
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (phone prefix → nation key, schema has no phone column): customers
    with above-average positive balance and NO orders, per nation — scalar
    subquery (global avg, computed once and broadcast) + anti join + agg."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg(F.col("c_acctbal").cast("decimal(14,4)")).cast("double").alias("a")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        _dec("c_acctbal").cast("double") > F.col("a")
    )
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(14,4)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,4))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE CAST(CAST(c_acctbal AS DECIMAL(12,4)) AS DOUBLE) > (
        SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE)
        FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


QUERIES = {
    "q7_nation_volume": q7_nation_volume,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLES = {
    "q7_nation_volume": _Q7_SQL,
    "q13_customer_distribution": _Q13_SQL,
    "q17_small_quantity_revenue": _Q17_SQL,
    "q22_idle_rich_customers": _Q22_SQL,
}
