"""Near-duplicate cluster assignment: connected components over the
MinHash-LSH pair graph — the step that turns pairwise near-dup hits into
"keep one doc per cluster" decisions in a dedup pipeline.

Iterative algorithm, Spark-style: min-label propagation expressed as a FIXED
number of lazy join/aggregate rounds (no driver-side actions inside the
loop, no collect — the whole computation is one Catalyst plan; identical
edge subtrees are shared via exchange reuse). Six rounds resolve any
component of diameter ≤ 6; near-dup clusters are copy-chains with diameter
≤ 3 here, and the oracle computes the TRUE transitive closure with a
recursive CTE, so an insufficient round count would surface as a mismatch,
not silently wrong output.

At 100 TB: each round is a shuffle keyed by doc_id over the *pair graph*
(bounded by near-dup volume, orders of magnitude smaller than the corpus);
for unbounded-diameter graphs you would switch to alternating large/small
star (pointer doubling) — same primitive, log-diameter rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_impl_spark.operators.dedup import _MINHASH_SQL, dedup_documents_minhash

__all__ = ["QUERIES", "ORACLES", "connected_components"]

_ROUNDS = 6


def connected_components(pairs: DataFrame, rounds: int = _ROUNDS) -> DataFrame:
    """Min-label propagation over an undirected pair list
    (``doc_a``, ``doc_b``) → (``doc_id``, ``component``) where component is
    the minimum doc_id reachable within ``rounds`` hops."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    # Truncate lineage before iterating: without this every round re-embeds
    # the upstream pair-generation DAG and the plan tree grows multiplicatively
    # (Catalyst analysis alone blows up). The edge list is the bounded
    # near-dup graph, so materializing it is the iterative-algorithm pattern —
    # on a cluster this would be checkpoint() to reliable storage.
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    for _ in range(rounds):
        prop = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(prop, labels.doc_id == prop.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
        )
    return labels.select("doc_id", F.col("label").alias("component"))


def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH pairs → connected components → cluster assignment
    (component id = minimum doc_id in the cluster, i.e. the canonical
    survivor an exact-keep-first policy would retain)."""
    pairs = dedup_documents_minhash(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs).orderBy("doc_id")


# Oracle: true transitive closure of the same pair graph via recursive CTE.
_COMPONENTS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_MINHASH_SQL}) minhash_pairs
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(s, d) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.s, e.d
  FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS doc_id, MIN(d) AS component
FROM reach
GROUP BY s
ORDER BY doc_id
"""


QUERIES = {
    "dedup_cluster_components": dedup_cluster_components,
}

ORACLES = {
    "dedup_cluster_components": _COMPONENTS_SQL,
}
