"""Scale-discipline helpers (SURVEY.md §7 phase 3): the operational knobs a
100 TB deployment needs beyond what AQE does automatically.

- :func:`salted_groupby` — two-phase aggregation with an explicit salt for
  pathologically skewed group keys (generalizing the reference design doc's
  ``OptimizeSkewedGroupBy`` sketch, spark-groupby-analysis.md:50-57). AQE's
  skew handling splits *join* partitions; a single hot *aggregation* key
  still lands on one reducer — salting splits it across ``n_salts`` reducers
  and recombines, correct for any algebraic aggregate.
- :func:`write_partitioned` / :func:`read_pruned` — storage-partitioned
  parquet layout: writes ``partitionBy`` directories so later reads with a
  partition predicate scan only matching directories (partition pruning —
  verified by plan inspection in tests).
- :func:`write_bucketed` — hash-bucketed + sorted table layout: two tables
  bucketed the same way on the join key sort-merge-join WITHOUT a shuffle
  (verified by plan inspection in tests). This is the co-located-join
  discipline for 100 TB fact-fact joins where neither side broadcasts.
- :func:`salted_join` — skew-safe equi-join: the skewed (fact) side gets a
  deterministic row-hash salt, the compact side is replicated ``n_salts``
  ways, and the join
  key becomes (key, salt) — a hot key spreads over ``n_salts`` reducers.
  Complements AQE's skew-join (which only splits oversized partitions it can
  detect at shuffle-materialization time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "analyze_tables",
    "salted_groupby",
    "salted_join",
    "write_partitioned",
    "read_pruned",
    "write_bucketed",
]

def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): a hash of EVERY column of
    the row, mod n_salts. Unlike a hash of the *group key* (which would give
    every row of a hot key the same salt and defeat the split), the non-key
    columns vary within a key group, so a hot key spreads across reducers —
    while identical inputs produce identical salts run-to-run, keeping the
    whole pipeline bit-reproducible (this repo's determinism ruleset,
    plans/__init__.py). Identical *duplicate rows* share a salt; that only
    re-concentrates load if a single fully-duplicated row dominates, a far
    rarer pathology than a hot key."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")


#: (partial_agg, final_agg) pairs per supported algebraic aggregate:
#: stage 1 aggregates (key, salt) groups, stage 2 recombines per key.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe groupBy: ``aggs`` maps output column → (agg_name, input_col)
    with agg_name in {sum, count, min, max}.

    Plan shape: groupBy(keys + salt) [narrow-ish shuffle, hot key split
    n_salts ways] → groupBy(keys) [tiny shuffle over pre-aggregated rows].
    Equivalent to a plain groupBy for these algebraic aggregates (tested).
    """
    unknown = [a for a, _ in aggs.values() if a not in _ALGEBRAIC]
    if unknown:
        raise ValueError(f"non-algebraic aggregates not supported: {unknown}")
    salted = df.withColumn("_salt", _row_salt(df, n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[a][0](col).alias(f"_p_{out}")
            for out, (a, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[a][1](f"_p_{out}").alias(out)
            for out, (a, _) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe inner equi-join: semantically identical to
    ``fact.join(dim, fact[fact_key] == dim[dim_key])`` (tested), but a hot
    fact key is spread across ``n_salts`` reducers. The dim side is
    replicated n_salts× via an explode — acceptable when |dim| ≪ |fact|,
    which is the only regime where key skew on the fact side dominates."""
    salted_fact = fact.withColumn("_salt", _row_salt(fact, n_salts))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["_salt"] == replicated_dim["_salt"]),
    )
    return out.drop("_salt")


def analyze_tables(spark: SparkSession, *tables: str) -> None:
    """Populate catalog statistics — the cost-based optimizer's input.

    ``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`` records table
    rowCount/sizeInBytes plus per-column NDV/min/max/null-count in the
    metastore. With ``spark.sql.cbo.enabled`` (+ ``cbo.joinReorder.enabled``)
    Catalyst then estimates intermediate cardinalities from those stats —
    join reordering, stats-based broadcast decisions, and filter selectivity
    — instead of falling back to raw file sizes. At 100 TB this is a nightly
    metadata job over the warehouse tables, not a per-query cost: one scan
    per table, stats amortized across every subsequent plan. AQE re-plans
    from RUNTIME shuffle sizes and complements (not replaces) this: CBO
    shapes the initial join tree before any stage has run."""
    for t in tables:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed, per-bucket-sorted parquet table (metastore-backed):
    join two tables bucketed identically on the join key and Spark plans a
    sort-merge join with NO Exchange on either side — the 100 TB co-located
    fact-fact join layout. (``bucketBy`` requires ``saveAsTable``; plain
    ``.parquet(path)`` writes cannot record bucketing metadata.)"""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Storage-partitioned parquet layout: one directory per partition value,
    rows optionally sorted within files (run-length/dictionary friendly and
    a prerequisite for min-max pruning on the sort key)."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_pruned(spark, path: str, predicate: Column | None = None) -> DataFrame:
    """Read a partitioned layout; a predicate on a partition column becomes a
    PartitionFilter (directory pruning), never a data scan filter."""
    df = spark.read.parquet(path)
    return df.filter(predicate) if predicate is not None else df
