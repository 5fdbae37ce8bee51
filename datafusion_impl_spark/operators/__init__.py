"""LLM-data-pipeline operators (the build's north star beyond reference parity):

- :mod:`.text`       — tokenization stats, language-ID, quality scoring,
                       regex token counting, rolling-hash fingerprints
- :mod:`.dedup`      — exact (content-hash), MinHash-LSH near-dup,
                       SimHash near-dup
- :mod:`.similarity` — brute-force cosine top-k, IVF top-k,
                       sign-random-projection LSH near-dup pairs
- :mod:`.curation`   — paragraph-level dedup, URL canonicalization dedup,
                       temperature-scaled source mixing, int8 embedding
                       quantization
- :mod:`.structured` — JSON/struct column handling (events.props)
- :mod:`.multimodal` — binary media columns + Arrow-batched feature
                       extraction plumbing (decoders stubbed; no image/audio
                       libs in this container)

Every operator is a declarative DataFrame plan (JVM-side, Catalyst-optimized)
unless the semantics genuinely need Python (`multimodal` uses mapInPandas —
that IS the operator's contract). Each has a DuckDB oracle; cross-engine
determinism rests on two portable primitives verified bit-exact:

- **md5-derived 60-bit hashes** (`md5_long` here ≡ the DuckDB fragment
  ``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``): both engines implement
  RFC-1321 md5 over UTF-8 bytes, and 15 hex chars = 60 bits always fits a
  signed BIGINT. All sketches (MinHash seeds, SimHash bits, SRP hyperplanes,
  fingerprints) derive from this, never from engine-native hash functions
  (Spark xxhash64 and DuckDB ``hash()`` differ).
- **double-precision sequential folds**: `aggregate(zip_with(...))` in Spark
  and `list_cosine_similarity(::DOUBLE[], ...)` in DuckDB reduce 64-element
  vectors left-to-right in float64 — empirically bit-identical; results are
  still ROUND()ed before any comparison or ranking so a last-bit divergence
  can never flip a top-k order on either side.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """Portable 60-bit non-negative hash of a string column.

    Exactly equals the DuckDB expression produced by :func:`duck_md5_long`
    for the same input string (verified bit-exact in tests).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_md5_long(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit hash as :func:`md5_long`."""
    return f"CAST(('0x' || substr(md5({expr}),1,15)) AS BIGINT)"


#: one iteration-stage shuffle partition per this many rows — sized so a
#: partition's join state stays comfortably in executor memory.
_ROWS_PER_ITER_PARTITION = 2_000_000


def _iteration_partitions(n_rows: int) -> int:
    """Shuffle-partition count for a fixed-point loop, sized from the
    checkpointed frame's measured row count (NOT a hard-coded 1): tiny
    frames get 1 partition (scheduling overhead dominates), a 100×-scale
    graph of tens of millions of rows gets real parallelism."""
    return max(1, -(-n_rows // _ROWS_PER_ITER_PARTITION))


@contextmanager
def bounded_iteration(spark: SparkSession, n_rows: int):
    """Pin shuffle partitions to ``_iteration_partitions(n_rows)`` for a
    fixed-point loop over a bounded frame, restoring after.

    Iterative operators (connected components, PageRank, k-core, suffix-array
    prefix doubling) loop over BOUNDED frames (thousands of rows at sf0.1),
    but with the session's core-count shuffle partitions every round schedules
    32-task stages whose fixed scheduling cost dwarfs the actual work. Heavy
    upstream plans are localCheckpoint-ed at full parallelism BEFORE entering
    this context, so only the tiny iterative stages are pinned, and the count
    that sizes the pin is one cheap job over that checkpoint. Measured at
    sf0.1 (r13, graph family): components 5.7 s → ~2 s, PageRank 6.4 s → ~2 s.

    NOTE: this mutates the session-global shuffle-partition conf for the
    duration of the loop (restored in ``finally``) and therefore assumes no
    CONCURRENT queries plan on the same SparkSession while the loop runs —
    true for the sequential bench/driver harness. A threaded harness would
    need the override scoped per-frame (``df.repartition(n)`` on the
    iteration frames) instead."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_iteration_partitions(n_rows))
    )
    # AQE's job inside this zone — re-planning partition counts at runtime —
    # is already done better here: the partition count IS derived from the
    # measured row count. Left on, AQE materializes every exchange of every
    # per-round action as its own sub-job (plus a re-optimization pass per
    # stage), which on these bounded frames is pure scheduling overhead at
    # any scale; the skew/coalesce protections it buys matter on corpus-scale
    # shuffles, which are all checkpointed BEFORE entering the zone.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def materialize(df):
    """Truncate lineage for a subtree consumed by multiple downstream
    branches (LSH tables self-joined for candidates, shingle sets reused by
    the verify pass, ...). Without this Catalyst re-executes the whole
    subtree once per consumer — the MinHash plan scanned its parquet source
    18 times. On a cluster this is ``checkpoint()`` to reliable storage; the
    materialized frame is always the *bounded sketch* (signatures, buckets,
    shingle sets), never the raw corpus."""
    return df.localCheckpoint(eager=True)
