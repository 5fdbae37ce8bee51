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

from pyspark.sql import Column
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


def materialize(df):
    """Truncate lineage for a subtree consumed by multiple downstream
    branches (LSH tables self-joined for candidates, shingle sets reused by
    the verify pass, ...). Without this Catalyst re-executes the whole
    subtree once per consumer — the MinHash plan scanned its parquet source
    18 times. On a cluster this is ``checkpoint()`` to reliable storage; the
    materialized frame is always the *bounded sketch* (signatures, buckets,
    shingle sets), never the raw corpus."""
    return df.localCheckpoint(eager=True)
