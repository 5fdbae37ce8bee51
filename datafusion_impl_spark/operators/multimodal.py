"""Multimodal columns: opaque ``binary`` media payloads with typed metadata,
processed by Arrow-batched ``mapInPandas``.

This is the one operator family where Python in the dataflow is the design,
not a compromise: decoding/feature-extracting media is imperative per-blob
work, so the Spark-side contract is

    media table (id, source, kind, media BINARY, meta STRUCT)
        → mapInPandas(feature_fn, FEATURES_SCHEMA)   # Arrow batches
        → typed feature rows → normal relational ops

The *plumbing* — schema, Arrow batch shape, partitioning, output contract —
is real and oracle-checked end-to-end. The actual image/audio decoders are
STUBBED (this container ships no PIL/av): :func:`decode_image` raises
``NotImplementedError`` unless pillow appears, and the feature extractor
used by the checked query computes deterministic byte-level features
(length, md5 checksum, synthetic dimensions) that DuckDB reproduces from the
same bytes.

At 100 TB: mapInPandas streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) through long-lived Python
workers — per-executor parallelism with no driver involvement; the binary
column never shuffles (features are extracted before any wide operation).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_impl_spark.sources.registry import load_table

__all__ = [
    "QUERIES",
    "ORACLES",
    "FEATURES_SCHEMA",
    "media_table",
    "extract_media_features",
    "decode_image",
]

#: Output contract of :func:`extract_media_features`.
FEATURES_SCHEMA = (
    "doc_id bigint, source string, kind string, "
    "n_bytes int, checksum string, width int, height int"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the canonical media table from ``documents``: the text payload
    re-encoded as an opaque binary blob plus typed metadata — the same shape
    an image/audio corpus would load with (payload, mime, dims) columns."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return docs.select(
        "doc_id",
        "source",
        F.lit("text").alias("kind"),
        F.encode("text", "UTF-8").alias("media"),
        F.struct(
            F.lit("utf-8").alias("encoding"),
            F.length("text").alias("n_chars"),
        ).alias("meta"),
    )


def decode_image(data: bytes):
    """Decode an image payload. STUB: requires pillow, which this container
    does not ship — the Spark-side plumbing is exercised with
    :func:`_byte_features` instead (see module docstring)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no pillow in container
        raise NotImplementedError(
            "image decode requires pillow; install it on the cluster and "
            "replace _byte_features with a real decoder"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(data))  # pragma: no cover


def _byte_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic per-blob features standing in for a media decoder:
    byte length, md5 checksum, and synthetic width/height derived from the
    length. Every value is reproducible from the bytes alone, which is what
    lets the DuckDB oracle check the full mapInPandas round-trip."""
    n_bytes = pdf["media"].map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "kind": pdf["kind"],
            "n_bytes": n_bytes.astype("int32"),
            "checksum": pdf["media"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            "width": (n_bytes % 640).astype("int32"),
            "height": (n_bytes * 7 % 480).astype("int32"),
        }
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the media table (the multimodal
    analogue of the reference's batch-in/batch-out kernel contract)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _byte_features(pdf)

    return media.mapInPandas(fn, FEATURES_SCHEMA)


def multimodal_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: build media table → mapInPandas
    feature extraction → relational aggregate per source."""
    feats = extract_media_features(media_table(spark, sf_dir))
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("checksum").alias("n_checksums"),
            F.max("width").alias("max_width"),
            F.min("height").alias("min_height"),
        )
        .orderBy("source")
    )


_MEDIA_FEATURES_SQL = """
WITH feats AS (
  SELECT source,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS checksum,
         octet_length(encode(text)) % 640 AS width,
         octet_length(encode(text)) * 7 % 480 AS height
  FROM documents
)
SELECT source,
       COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT checksum) AS n_checksums,
       CAST(MAX(width) AS INTEGER) AS max_width,
       CAST(MIN(height) AS INTEGER) AS min_height
FROM feats
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "multimodal_media_features": multimodal_media_features,
}

ORACLES = {
    "multimodal_media_features": _MEDIA_FEATURES_SQL,
}
