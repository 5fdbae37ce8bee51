"""Multimodal columns: opaque ``binary`` media payloads with typed metadata,
processed by Arrow-batched ``mapInPandas``.

This is the one operator family where Python in the dataflow is the design,
not a compromise: decoding/feature-extracting media is imperative per-blob
work, so the Spark-side contract is

    media table (id, source, kind, media BINARY, meta STRUCT)
        → mapInPandas(feature_fn, FEATURES_SCHEMA)   # Arrow batches
        → typed feature rows → normal relational ops

The *plumbing* — schema, Arrow batch shape, partitioning, output contract —
is real and oracle-checked end-to-end. General image/audio decoding is
env-gated (this container ships no PIL/av): :func:`decode_image` raises
``NotImplementedError`` unless pillow appears, and the byte-level feature
extractor computes deterministic features DuckDB reproduces from the same
bytes. Since r6 one REAL decode path needs no external libs at all:
:func:`decode_bmp` parses genuine 24-bit BMP payloads (header, bottom-up
rows, BGR order, row padding) inside the ``mapInArrow`` kernel, and
``multimodal_bmp_decode_stats`` oracle-checks the decoded pixel statistics.

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

from datafusion_impl_spark.operators import duck_md5_long
from datafusion_impl_spark.sources.registry import load_table

__all__ = [
    "QUERIES",
    "ORACLES",
    "FEATURES_SCHEMA",
    "media_table",
    "extract_media_features",
    "decode_image",
    "decode_bmp",
    "decode_jpeg",
    "BMP_STATS_SCHEMA",
    "JPEG_STATS_SCHEMA",
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
    """Decode an image payload. Uncompressed 24-bit BMP decodes natively via
    :func:`decode_bmp` (no external libs); every other format requires
    pillow, which this container does not ship — those fall back to the
    env-gated PIL path (see module docstring)."""
    if data[:2] == b"BM":
        return decode_bmp(data)
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


#: frame-sampling parameters: fixed-size byte frames, every STRIDE-th kept.
_FRAME_BYTES = 64
_FRAME_STRIDE = 2

#: Output contract of the frame sampler (1 blob → N frame rows).
FRAMES_SCHEMA = "doc_id bigint, source string, frame_idx int, frame_len int, frame_md5 string"


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling over binary payloads: each blob is treated as a
    sequence of fixed 64-byte frames and every 2nd frame is emitted — the
    video-frame-sampling plumbing shape (1 input row → N output rows through
    ``mapInPandas``; a real deployment swaps the byte-slicer for an
    av/ffmpeg keyframe decoder, keeping schema and batching identical).
    Frame checksums are md5 over the uppercase hex of the slice so the
    DuckDB oracle (no BLOB substring support) reproduces them exactly."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _frame_rows(pdf)

    return media.mapInPandas(fn, FRAMES_SCHEMA)


def _frame_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch kernel of :func:`sample_frames` (1 blob row → N frame rows)."""
    rows: dict[str, list] = {
        k: [] for k in ("doc_id", "source", "frame_idx", "frame_len", "frame_md5")
    }
    for doc_id, source, blob in zip(pdf["doc_id"], pdf["source"], pdf["media"]):
        b = bytes(blob)
        last = (len(b) - 1) // _FRAME_BYTES
        for fi in range(0, last + 1, _FRAME_STRIDE):
            sl = b[fi * _FRAME_BYTES:(fi + 1) * _FRAME_BYTES]
            rows["doc_id"].append(doc_id)
            rows["source"].append(source)
            rows["frame_idx"].append(fi)
            rows["frame_len"].append(len(sl))
            rows["frame_md5"].append(
                hashlib.md5(sl.hex().upper().encode()).hexdigest()
            )
    out = pd.DataFrame(rows)
    out["frame_idx"] = out["frame_idx"].astype("int32")
    out["frame_len"] = out["frame_len"].astype("int32")
    return out


def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end frame-sampling pipeline: media table → mapInPandas frame
    explode → per-source aggregate of sampled-frame stats."""
    frames = sample_frames(media_table(spark, sf_dir))
    return (
        frames.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("frame_md5").alias("n_distinct_frames"),
            F.sum("frame_len").cast("long").alias("total_frame_bytes"),
        )
        .orderBy("source")
    )


_FRAME_SAMPLES_SQL = f"""
WITH f AS (
  SELECT doc_id, source,
         unnest(generate_series(0,
             CAST((octet_length(encode(text)) - 1) // {_FRAME_BYTES} AS BIGINT),
             {_FRAME_STRIDE})) AS fi,
         hex(encode(text)) AS hx,
         octet_length(encode(text)) AS nb
  FROM documents),
frames AS (
  SELECT doc_id, source,
         md5(substr(hx, CAST(fi * {_FRAME_BYTES * 2} + 1 AS BIGINT),
                    {_FRAME_BYTES * 2})) AS frame_md5,
         LEAST({_FRAME_BYTES}, nb - fi * {_FRAME_BYTES}) AS frame_len
  FROM f)
SELECT source,
       COUNT(*) AS n_frames,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(DISTINCT frame_md5) AS n_distinct_frames,
       CAST(SUM(frame_len) AS BIGINT) AS total_frame_bytes
FROM frames
GROUP BY source
ORDER BY source
"""


def multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of BINARY media blobs with a storage-ROI report: per
    language, blob count, distinct contents, and the BYTES a keep-first
    policy reclaims — the number that justifies media dedup at 100 TB
    (image/video dedup is storage-bound, not row-bound). Runs over the
    planted-dup corpus re-encoded as blobs so there are real duplicates.

    The content key is md5 over the hex rendering of the raw bytes (both
    engines hex uppercase; DuckDB's md5 does not accept BLOBs) — one
    shuffle on the uniform hash, binary payloads never shuffle (the hash
    and byte length are projected first)."""
    from datafusion_impl_spark.operators.dedup import near_dup_corpus

    corpus = near_dup_corpus(spark, sf_dir)
    blobs = corpus.select(
        "doc_id",
        "lang",
        F.encode("text", "UTF-8").alias("media"),
    ).select(
        "doc_id",
        "lang",
        F.md5(F.hex("media")).alias("h"),
        F.length("media").alias("n_bytes"),
    )
    per_hash = blobs.groupBy("lang", "h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").cast("long").alias("bytes_all"),
        F.min("n_bytes").cast("long").alias("bytes_one"),
    )
    return (
        per_hash.groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_blobs"),
            F.count(F.lit(1)).alias("n_unique"),
            (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_removed"),
            F.sum("bytes_all").cast("long").alias("total_bytes"),
            (F.sum("bytes_all") - F.sum("bytes_one")).cast("long").alias(
                "bytes_reclaimed"
            ),
        )
        .orderBy("lang")
    )


_MEDIA_DEDUP_SQL = """
WITH corpus AS ({corpus_sql}),
blobs AS (
  SELECT doc_id, lang,
         md5(hex(encode(text))) AS h,
         octet_length(encode(text)) AS n_bytes
  FROM corpus),
per_hash AS (
  SELECT lang, h, COUNT(*) AS n,
         SUM(n_bytes) AS bytes_all, MIN(n_bytes) AS bytes_one
  FROM blobs GROUP BY lang, h)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_blobs,
       COUNT(*) AS n_unique,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_removed,
       CAST(SUM(bytes_all) AS BIGINT) AS total_bytes,
       CAST(SUM(bytes_all) - SUM(bytes_one) AS BIGINT) AS bytes_reclaimed
FROM per_hash
GROUP BY lang
ORDER BY lang
"""


def _media_dedup_oracle() -> str:
    from datafusion_impl_spark.operators.dedup import _CORPUS_SQL

    return _MEDIA_DEDUP_SQL.format(corpus_sql=_CORPUS_SQL)


def extract_media_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_media_features` — the other
    Arrow-native batch API, operating on ``pyarrow.RecordBatch`` directly
    with compute kernels where the work is columnar (lengths, modular
    dimension arithmetic) and a per-blob Python loop only where it is
    inherently scalar (the md5). Skipping the pandas conversion removes a
    copy per batch — the right call when the payload column dominates batch
    size, exactly the multimodal case."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            media_col = b.column(b.schema.get_field_index("media"))
            n_bytes = pc.cast(pc.binary_length(media_col), pa.int32())
            checksum = pa.array(
                [hashlib.md5(v.as_py()).hexdigest() for v in media_col],
                type=pa.string(),
            )
            width = pc.cast(
                pc.subtract(
                    n_bytes, pc.multiply(pc.divide(n_bytes, 640), 640)
                ),
                pa.int32(),
            )
            h_full = pc.multiply(pc.cast(n_bytes, pa.int64()), 7)
            height = pc.cast(
                pc.subtract(
                    h_full, pc.multiply(pc.divide(h_full, 480), 480)
                ),
                pa.int32(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    b.column(b.schema.get_field_index("source")),
                    b.column(b.schema.get_field_index("kind")),
                    n_bytes,
                    checksum,
                    width,
                    height,
                ],
                names=[
                    "doc_id", "source", "kind",
                    "n_bytes", "checksum", "width", "height",
                ],
            )

    return media.mapInArrow(fn, FEATURES_SCHEMA)


def multimodal_arrow_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The :func:`multimodal_media_features` aggregate computed through the
    ``mapInArrow`` extractor — same oracle, proving both Arrow batch APIs
    produce byte-identical features end to end."""
    feats = extract_media_features_arrow(media_table(spark, sf_dir))
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


#: multipart-transfer chunk size (bytes) and the doc_id sample the audit
#: query surfaces (manifests are per-blob metadata; 1-in-20 keeps the
#: driver-facing output bounded while every chunk computation is exercised).
_CHUNK_BYTES = 256
_MANIFEST_MOD = 20


def multimodal_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multipart-transfer manifest over binary payloads: split every blob
    into fixed 256-byte chunks and emit (offset, length, md5) per chunk —
    the upload/verification plan object stores and dataset-shipping tools
    (multipart PUT, torrent-style piece tables) need alongside the blob.

    Pure Catalyst, no Python: chunk boundaries come from one
    ``explode(sequence(...))`` over the blob's byte length, and each
    chunk's checksum is md5 over the corresponding slice of the blob's hex
    encoding — byte-exact, engine-portable (hex avoids DuckDB's missing
    BLOB substring), and verifiable chunk-by-chunk on the receiving end.
    Map-only plan: payloads are read once, never shuffled (the explode and
    hashing happen in the scan stage); the manifest rows that do move are
    ~40 bytes each."""
    media = media_table(spark, sf_dir).filter(
        F.col("doc_id") % _MANIFEST_MOD == 0
    )
    base = media.select(
        "doc_id",
        F.upper(F.hex("media")).alias("h"),
        F.length("media").cast("int").alias("n_bytes"),
    ).filter(F.col("n_bytes") > 0)
    chunked = base.select(
        "doc_id",
        "h",
        "n_bytes",
        # div-safe: _CHUNK_BYTES is a nonzero module constant
        F.ceil(F.col("n_bytes") / _CHUNK_BYTES).cast("int").alias("n_chunks"),
        F.explode(
            F.sequence(
                F.lit(0), (F.ceil(F.col("n_bytes") / _CHUNK_BYTES) - 1).cast("int")
            )
        ).alias("chunk_idx"),
    )
    return chunked.select(
        "doc_id",
        "n_bytes",
        "n_chunks",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * _CHUNK_BYTES).cast("int").alias("offset"),
        F.least(
            F.lit(_CHUNK_BYTES),
            F.col("n_bytes") - F.col("chunk_idx") * _CHUNK_BYTES,
        ).cast("int").alias("chunk_len"),
        F.md5(
            F.expr(
                f"substring(h, chunk_idx * {_CHUNK_BYTES} * 2 + 1, "
                f"{_CHUNK_BYTES} * 2)"
            )
        ).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


_CHUNK_MANIFEST_SQL = f"""
WITH m AS (
  SELECT doc_id, upper(hex(encode(text))) AS h,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
  FROM documents
  WHERE doc_id % {_MANIFEST_MOD} = 0 AND octet_length(encode(text)) > 0
),
c AS (
  SELECT doc_id, h, n_bytes,
         -- div-safe: _CHUNK_BYTES is a nonzero module constant
         CAST(CEIL(n_bytes / {_CHUNK_BYTES}.0) AS INTEGER) AS n_chunks,
         unnest(generate_series(0,
             CAST(CEIL(n_bytes / {_CHUNK_BYTES}.0) AS INTEGER) - 1)) AS chunk_idx
  FROM m
)
SELECT doc_id, n_bytes, n_chunks,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(chunk_idx * {_CHUNK_BYTES} AS INTEGER) AS offset,
       CAST(LEAST({_CHUNK_BYTES}, n_bytes - chunk_idx * {_CHUNK_BYTES}) AS INTEGER)
         AS chunk_len,
       md5(substr(h, chunk_idx * {_CHUNK_BYTES} * 2 + 1, {_CHUNK_BYTES} * 2))
         AS chunk_md5
FROM c
ORDER BY doc_id, chunk_idx
"""


#: perceptual-hash parameters: 15 hex symbols × 4 frequency thresholds =
#: a 60-bit signature (the 16th symbol's frequency is determined by the
#: others, and 60 bits keeps the value inside signed BIGINT); banding is
#: 4 chunks × 15 bits — a pair within Hamming distance d < 4 ALWAYS shares
#: at least one exact chunk (pigeonhole), the classic Hamming-LSH recall
#: guarantee; looser pairs are caught probabilistically.
_PHASH_CHARS = "0123456789ABCDE"
_PHASH_THRESHOLDS = (80, 95, 105, 120)  # percent of the uniform frequency
_PHASH_HAMMING_T = 12
#: hot-bucket cap: a (chunk-position, value) bucket holding more blobs than
#: this is NON-DISCRIMINATIVE (many corpora share common byte statistics)
#: and is skipped — the standard LSH skip-hot-buckets rule that bounds the
#: candidate join's fan-out; near-identical pairs still collide in their
#: other, rarer chunks.
_PHASH_BUCKET_CAP = 64


def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate detection for opaque binary payloads — the
    perceptual-hash workflow (pHash/aHash for images, chromaprints for
    audio) with the decoder swapped for a deterministic byte-histogram
    signature this container can compute (and DuckDB can replay): 60 bits
    of 'is symbol s over/under t% of uniform frequency' over the payload's
    hex distribution. Exact copies collide at Hamming 0; payloads with
    similar byte statistics land within a few bits.

    The pairing is Hamming-LSH: the signature splits into 4 chunks of 15
    bits, candidates come from an equi-join on any identical chunk (never
    an all-pairs product; distance <4 pairs are caught with certainty by
    pigeonhole), and the exact Hamming distance (xor + bit_count) verifies
    candidates. Output: the near-dup census by Hamming distance."""
    media = media_table(spark, sf_dir).select(
        "doc_id", F.upper(F.hex("media")).alias("h")
    ).filter(F.length("h") > 0)
    L = F.length("h")
    # materialize the 15 symbol frequencies ONCE: Catalyst collapses
    # projections, so without the checkpoint each of the 60 bit expressions
    # would re-run its multi-KB replace() scan (measured 21.6 s → ~2 s at
    # sf0.1 from this + the hot-bucket cap below)
    freqs = media.select(
        "doc_id",
        L.alias("len"),
        *[
            (L - F.length(F.expr(f"replace(h, '{c}', '')"))).alias(f"f{i}")
            for i, c in enumerate(_PHASH_CHARS)
        ],
    ).localCheckpoint(eager=True)
    sig = F.lit(0).cast("long")
    for i in range(len(_PHASH_CHARS)):
        for t, pct in enumerate(_PHASH_THRESHOLDS):
            bit = (F.col(f"f{i}") * 16 * 100 > F.col("len") * pct).cast("long")
            sig = sig + bit * F.lit(2 ** (i * 4 + t)).cast("long")
    hashed = freqs.select("doc_id", sig.alias("sig"))
    hashed = hashed.localCheckpoint(eager=True)
    chunks = hashed.select(
        "doc_id",
        "sig",
        F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j"),
    ).select(
        "doc_id",
        "sig",
        "j",
        F.expr("(sig >> (15 * j)) & 32767").alias("chunk"),
    )
    rare = (
        chunks.groupBy("j", "chunk")
        .agg(F.count(F.lit(1)).alias("pop"))
        .filter(F.col("pop") <= _PHASH_BUCKET_CAP)
        .select("j", "chunk")
    )
    chunks = chunks.join(F.broadcast(rare), ["j", "chunk"])
    a = chunks.select(
        F.col("doc_id").alias("da"), F.col("sig").alias("sa"), "j", "chunk"
    )
    b = chunks.select(
        F.col("doc_id").alias("db"), F.col("sig").alias("sb"), "j", "chunk"
    )
    cand = (
        a.join(b, ["j", "chunk"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", "sa", "sb")
        .distinct()
    )
    hamming = F.bit_count(F.expr("sa ^ sb"))
    return (
        cand.select(hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= _PHASH_HAMMING_T)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


def _phash_oracle() -> str:
    bits = []
    for i, c in enumerate(_PHASH_CHARS):
        freq = f"(length(h) - length(replace(h, '{c}', '')))"
        for t, pct in enumerate(_PHASH_THRESHOLDS):
            bits.append(
                f"CASE WHEN {freq} * 16 * 100 > length(h) * {pct} "
                f"THEN CAST({2 ** (i * 4 + t)} AS BIGINT) ELSE 0 END"
            )
    sig = " + ".join(bits)
    return f"""
WITH media AS (
  SELECT doc_id, upper(hex(encode(text))) AS h FROM documents
  WHERE length(text) > 0
),
hashed AS (SELECT doc_id, {sig} AS sig FROM media),
chunks0 AS (
  SELECT doc_id, sig, j, (sig >> (15 * j)) & 32767 AS chunk
  FROM hashed, (SELECT unnest(generate_series(0, 3)) AS j) t
),
rare AS (
  SELECT j, chunk FROM chunks0 GROUP BY j, chunk
  HAVING COUNT(*) <= {_PHASH_BUCKET_CAP}
),
chunks AS (
  SELECT c.* FROM chunks0 c JOIN rare USING (j, chunk)
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.sig AS sa, b.sig AS sb
  FROM chunks a JOIN chunks b
    ON a.j = b.j AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming,
       COUNT(*) AS n_pairs
FROM cand
WHERE bit_count(xor(sa, sb)) <= {_PHASH_HAMMING_T}
GROUP BY 1
ORDER BY hamming
"""


_PHASH_SQL = _phash_oracle()


# --- real image decode: dependency-free 24-bit BMP ------------------------
#
# The container ships no pillow/av, so until r5 every "decode" ran on
# byte-level twins. This path is a REAL decoder: deterministic 24-bit BMP
# images are planted (encoded byte-for-byte to the Windows BITMAPINFOHEADER
# spec — a public format), and :func:`decode_bmp` parses them back from the
# BYTES ALONE (magic, header offsets, bottom-up row order, BGR pixel order,
# 4-byte row padding). The DuckDB oracle replays the *pixel formula* in
# closed form, so any decoder/encoder disagreement about the actual BMP
# layout shows up as a stats mismatch; a golden-bytes pytest additionally
# pins the layout against a handcrafted image so complementary
# encoder/decoder bugs cannot cancel.

_BMP_W_BASE, _BMP_W_MOD = 8, 5  # width  = 8 + doc_id % 5 → row padding varies
_BMP_H_BASE, _BMP_H_MOD = 6, 3  # height = 6 + doc_id % 3
_BMP_SAMPLE_MOD = 4             # plant 1-in-4 docs as images


def _bmp_pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic (r, g, b) for the planted image — the formula the
    DuckDB oracle replays in SQL."""
    return (
        (doc_id + 3 * x + 7 * y) % 256,
        (3 * doc_id + 5 * x + 2 * y) % 256,
        (doc_id + x * y) % 256,
    )


def _bmp_encode(doc_id: int) -> bytes:
    """Encode the planted image for ``doc_id`` as a real uncompressed
    24-bit BMP (14-byte file header + 40-byte BITMAPINFOHEADER, bottom-up
    rows, BGR byte order, rows padded to 4 bytes)."""
    import struct

    w = _BMP_W_BASE + doc_id % _BMP_W_MOD
    h = _BMP_H_BASE + doc_id % _BMP_H_MOD
    row_stride = (w * 3 + 3) // 4 * 4
    pixel_bytes = row_stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        for x in range(w):
            r, g, b = _bmp_pixel(doc_id, x, y)
            rows += bytes((b, g, r))  # BGR
        rows += b"\x00" * (row_stride - w * 3)
    return header + bytes(rows)


def decode_bmp(data: bytes):
    """Parse an uncompressed 24-bit BMP from its bytes alone; returns
    ``(width, height, pixels)`` with ``pixels`` an (h*w, 3) uint8 RGB
    ndarray in top-down row-major order. Raises ``ValueError`` on
    malformed/unsupported payloads (the honest contract for a decoder
    kernel — corrupt blobs must fail loudly, not yield garbage stats)."""
    import struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant (need uncompressed 24-bit)")
    bottom_up = h > 0
    h = abs(h)
    row_stride = (w * 3 + 3) // 4 * 4
    if pixel_off + row_stride * h > len(data):
        raise ValueError("truncated BMP pixel array")
    raw = np.frombuffer(
        data, dtype=np.uint8, count=row_stride * h, offset=pixel_off
    ).reshape(h, row_stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        raw = raw[::-1]
    return w, h, raw[..., ::-1].reshape(-1, 3)  # BGR → RGB


#: Output contract of the BMP decode kernel.
BMP_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def decode_bmp_stats(images: DataFrame) -> DataFrame:
    """``mapInArrow`` decode kernel: (doc_id, media BINARY) → per-image
    decoded dimensions and exact per-channel pixel sums. Per-blob Python is
    the design here (decoding is inherently scalar work); the per-pixel
    arithmetic is vectorized numpy inside each blob."""
    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            ws, hs, sr, sg, sb = [], [], [], [], []
            for v in blobs:
                w, h, px = decode_bmp(v.as_py())
                s = px.astype("int64").sum(axis=0)
                ws.append(w)
                hs.append(h)
                sr.append(int(s[0]))
                sg.append(int(s[1]))
                sb.append(int(s[2]))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                    pa.array(sr, type=pa.int64()),
                    pa.array(sg, type=pa.int64()),
                    pa.array(sb, type=pa.int64()),
                ],
                names=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return images.mapInArrow(fn, BMP_STATS_SCHEMA)


def multimodal_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode end to end: plant deterministic 24-bit BMPs for
    1-in-4 documents (builder kernel encodes REAL BMP bytes), decode them
    back from bytes alone with :func:`decode_bmp`, and report per (width,
    height) shape: image count, exact per-channel sums, and mean
    brightness. The DuckDB oracle recomputes the same stats from the pixel
    FORMULA (never the bytes), so every layout detail the decoder must get
    right — BGR order, bottom-up rows, 4-byte padding, header offsets — is
    value-checked.

    Scale shape: map-only until the final tiny groupBy (15 shape groups);
    blobs are built and decoded inside the scan stage and never shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _bmp_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _BMP_SAMPLE_MOD == 0)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")
    stats = decode_bmp_stats(images)
    n_px = F.sum(F.col("width").cast("long") * F.col("height"))
    return (
        stats.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("sum_r").alias("sum_r"),
            F.sum("sum_g").alias("sum_g"),
            F.sum("sum_b").alias("sum_b"),
            # div-safe: n_px = planted BMP width x height, a positive
            # constant per payload
            F.round(
                (F.sum("sum_r") + F.sum("sum_g") + F.sum("sum_b"))
                / (n_px * 3.0),
                4,
            ).alias("avg_brightness"),
        )
        .orderBy("width", "height")
    )


_BMP_DECODE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_BMP_W_BASE} + doc_id % {_BMP_W_MOD} AS w,
         {_BMP_H_BASE} + doc_id % {_BMP_H_MOD} AS h
  FROM documents WHERE doc_id % {_BMP_SAMPLE_MOD} = 0
),
px AS (
  -- this DuckDB build has no lateral generate_series(col): cross with the
  -- fixed max range (w <= {_BMP_W_BASE + _BMP_W_MOD - 1},
  -- h <= {_BMP_H_BASE + _BMP_H_MOD - 1}) and filter per image
  SELECT d.doc_id, d.w, d.h, gx.x, gy.y
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_BMP_W_BASE + _BMP_W_MOD - 2})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_BMP_H_BASE + _BMP_H_MOD - 2})) AS y) gy
    ON gy.y < d.h
),
vals AS (
  SELECT doc_id, w, h,
         (doc_id + 3 * x + 7 * y) % 256 AS r,
         (3 * doc_id + 5 * x + 2 * y) % 256 AS g,
         (doc_id + x * y) % 256 AS b
  FROM px
)
SELECT CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       COUNT(DISTINCT doc_id) AS n_images,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       -- div-safe: COUNT(*) of a GROUP BY group is >= 1
       ROUND(CAST(SUM(r) + SUM(g) + SUM(b) AS DOUBLE) / (COUNT(*) * 3.0), 4)
         AS avg_brightness
FROM vals
GROUP BY w, h
ORDER BY width, height
"""




# --- real audio decode: dependency-free 16-bit PCM WAV --------------------
#
# The audio sibling of the BMP path above (r6 verdict #3): deterministic
# 16-bit PCM mono WAV clips are planted (encoded byte-for-byte to the RIFF/
# WAVE spec — a public format), and :func:`decode_wav` parses them back from
# the BYTES ALONE (RIFF framing, chunk walk, fmt fields, little-endian int16
# samples). The DuckDB oracle replays the *sample formula* in closed form,
# so any encoder/decoder disagreement about the actual WAV layout shows up
# as a stats mismatch; a golden-bytes pytest additionally pins the byte
# layout against a handcrafted clip.

_WAV_RATE_BASE, _WAV_RATE_MOD = 8000, 3   # rate = 8000 * (1 + doc_id % 3)
_WAV_N_BASE, _WAV_N_MOD = 48, 9           # n_samples = 48 + doc_id % 9
_WAV_SAMPLE_MOD = 4                       # plant 1-in-4 docs as audio
_WAV_SAMPLE_RES = 2                       # ... at residue 2 (images use 0)


def _wav_sample(doc_id: int, i: int) -> int:
    """Deterministic int16 sample value — the formula the DuckDB oracle
    replays in SQL. Range ±2000, comfortably inside int16."""
    return (doc_id * 31 + i * 17) % 4001 - 2000


def _wav_encode(doc_id: int) -> bytes:
    """Encode the planted clip for ``doc_id`` as a real 16-bit PCM mono
    WAV (44-byte RIFF/WAVE header: ``fmt `` subchunk with format tag 1,
    then a ``data`` subchunk of little-endian int16 samples)."""
    import struct

    import numpy as np

    rate = _WAV_RATE_BASE * (1 + doc_id % _WAV_RATE_MOD)
    n = _WAV_N_BASE + doc_id % _WAV_N_MOD
    samples = (
        (doc_id * 31 + np.arange(n, dtype=np.int64) * 17) % 4001 - 2000
    ).astype("<i2")
    data = samples.tobytes()
    hdr = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(data: bytes):
    """Parse a 16-bit PCM mono WAV from its bytes alone; returns
    ``(sample_rate, samples)`` with ``samples`` an int16 ndarray. Walks the
    RIFF chunk list (tolerating extra chunks in any order), and raises
    ``ValueError`` on malformed/truncated/unsupported payloads — corrupt
    blobs must fail loudly, not yield garbage stats."""
    import struct

    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = None
    samples = None
    off = 12
    while off + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, off)
        body = off + 8
        if body + size > len(data):
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    "unsupported WAV variant (need 16-bit PCM mono)"
                )
        elif cid == b"data":
            if size % 2:
                raise ValueError("odd data chunk size for 16-bit samples")
            samples = np.frombuffer(data, dtype="<i2", count=size // 2,
                                    offset=body)
        off = body + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples


#: Output contract of the WAV decode kernel.
WAV_STATS_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples int, "
    "sum_sq bigint, peak int, zero_cross bigint"
)


# --------------------------------------------------------------------------
# Integer-exact peak loudness normalization (r15): the gain-staging pass
# audio curation runs before feature extraction — mixed-loudness clips
# normalized to a common peak, entirely in integer arithmetic so both
# engines land on identical samples.
# --------------------------------------------------------------------------

#: normalization target: every clip's peak |sample| is scaled to this.
_PEAK_TARGET = 16000


def audio_peak_normalize_stats(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """PEAK NORMALIZATION CENSUS — decode each planted PCM clip from
    bytes, find its peak magnitude, and rescale every sample with the
    integer half-away rule ``sign(s)·((|s|·{t} + peak//2) // peak)`` so
    the clip's new peak is EXACTLY {t} (the integer identity
    ``(peak·T + peak//2) // peak = T`` — assertable, no clamping, no
    floating point anywhere). Census per sample rate: clip count, the
    pre-normalization peak sum (the loudness spread being corrected),
    the post-normalization peak sum (must be exactly n_clips·{t}), and
    the exact post-normalization energy sum — the value the DuckDB
    oracle replays from the planted sample formula through the same
    integer scaling.

    Scale shape: map-only decode + rescale; one row per rate."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(
                        lambda d: _wav_encode(int(d))
                    ),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _WAV_SAMPLE_MOD == _WAV_SAMPLE_RES)
    )
    clips = docs.mapInPandas(build, "doc_id bigint, media binary")

    def kernel(batches):
        import pyarrow as pa

        for b in batches:
            blobs = b.column(b.schema.get_field_index("media"))
            rates, pre, post, energy = [], [], [], []
            for v in blobs:
                rate, s = decode_wav(v.as_py())
                s = s.astype(np.int64)
                peak = int(np.abs(s).max())
                if peak == 0:
                    raise ValueError("silent clip cannot be normalized")
                mag = (np.abs(s) * _PEAK_TARGET + peak // 2) // peak
                scaled = np.where(s >= 0, mag, -mag)
                rates.append(rate)
                pre.append(peak)
                post.append(int(np.abs(scaled).max()))
                energy.append(int((scaled * scaled).sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rates, type=pa.int32()),
                    pa.array(pre, type=pa.int64()),
                    pa.array(post, type=pa.int64()),
                    pa.array(energy, type=pa.int64()),
                ],
                names=["rate", "pre_peak", "post_peak", "energy"],
            )

    stats = clips.mapInArrow(
        kernel, "rate int, pre_peak bigint, post_peak bigint, energy bigint"
    )
    return (
        stats.groupBy("rate")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("pre_peak").alias("pre_peak_sum"),
            F.sum("post_peak").alias("post_peak_sum"),
            F.sum("energy").alias("post_energy_sum"),
        )
        .orderBy("rate")
    )


audio_peak_normalize_stats.__doc__ = audio_peak_normalize_stats.__doc__.format(
    t=_PEAK_TARGET
)

_PEAK_NORM_SQL = f"""
WITH clips AS (
  SELECT doc_id,
         {_WAV_RATE_BASE} * (1 + doc_id % {_WAV_RATE_MOD}) AS rate,
         {_WAV_N_BASE} + doc_id % {_WAV_N_MOD} AS n
  FROM documents
  WHERE doc_id % {_WAV_SAMPLE_MOD} = {_WAV_SAMPLE_RES}
),
samples AS (
  SELECT c.doc_id, c.rate,
         (c.doc_id * 31 + idx.i * 17) % 4001 - 2000 AS s
  FROM clips c,
       LATERAL (SELECT unnest(generate_series(0, c.n - 1)) AS i) idx
),
peaks AS (
  SELECT doc_id, rate, MAX(ABS(s)) AS peak FROM samples
  GROUP BY doc_id, rate
),
scaled AS (
  SELECT s.doc_id, s.rate, p.peak,
         -- div-safe: peak >= 1 (planted clips are never silent; the
         -- kernel raises on a zero peak)
         CASE WHEN s.s >= 0
              THEN (ABS(s.s) * {_PEAK_TARGET} + p.peak // 2) // p.peak
              ELSE -((ABS(s.s) * {_PEAK_TARGET} + p.peak // 2) // p.peak)
         END AS v
  FROM samples s JOIN peaks p ON p.doc_id = s.doc_id
),
per_clip AS (
  SELECT doc_id, rate, MIN(peak) AS pre_peak,
         MAX(ABS(v)) AS post_peak, SUM(v * v) AS energy
  FROM scaled GROUP BY doc_id, rate
)
SELECT CAST(rate AS INTEGER) AS rate,
       COUNT(*) AS n_clips,
       CAST(SUM(pre_peak) AS BIGINT) AS pre_peak_sum,
       CAST(SUM(post_peak) AS BIGINT) AS post_peak_sum,
       CAST(SUM(energy) AS BIGINT) AS post_energy_sum
FROM per_clip
GROUP BY rate
ORDER BY rate
"""



def decode_wav_stats(clips: DataFrame) -> DataFrame:
    """``mapInArrow`` decode kernel: (doc_id, media BINARY) → per-clip
    decoded rate, length, exact energy (sum of squared samples), peak
    amplitude, and zero-crossing count (sign transitions under the
    ``sample < 0`` convention). Per-blob Python is the design (decoding is
    inherently scalar work); per-sample arithmetic is vectorized numpy."""
    import numpy as np
    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            rates, ns, sq, pk, zc = [], [], [], [], []
            for v in blobs:
                rate, s = decode_wav(v.as_py())
                s64 = s.astype("int64")
                neg = s64 < 0
                rates.append(rate)
                ns.append(len(s64))
                sq.append(int((s64 * s64).sum()))
                pk.append(int(np.abs(s64).max()) if len(s64) else 0)
                zc.append(int((neg[1:] != neg[:-1]).sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(rates, type=pa.int32()),
                    pa.array(ns, type=pa.int32()),
                    pa.array(sq, type=pa.int64()),
                    pa.array(pk, type=pa.int32()),
                    pa.array(zc, type=pa.int64()),
                ],
                names=["doc_id", "sample_rate", "n_samples", "sum_sq",
                       "peak", "zero_cross"],
            )

    return clips.mapInArrow(fn, WAV_STATS_SCHEMA)


def multimodal_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode end to end: plant deterministic 16-bit PCM WAV
    clips for 1-in-4 documents (builder kernel encodes REAL RIFF/WAVE
    bytes), decode them back from bytes alone with :func:`decode_wav`, and
    report per sample rate: clip count, total samples, RMS amplitude from
    the exact integer energy sum, peak amplitude, and mean zero-crossing
    rate. The DuckDB oracle recomputes the same stats from the sample
    FORMULA (never the bytes), so every layout detail the decoder must get
    right — chunk walk, little-endian int16, fmt fields — is value-checked.

    Scale shape: map-only until the final tiny groupBy (3 rate groups);
    blobs are built and decoded inside the scan stage and never shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _wav_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _WAV_SAMPLE_MOD == _WAV_SAMPLE_RES)
    )
    clips = docs.mapInPandas(build, "doc_id bigint, media binary")
    stats = decode_wav_stats(clips)
    total_n = F.sum(F.col("n_samples").cast("long"))
    return (
        stats.groupBy("sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            total_n.alias("total_samples"),
            F.sum("sum_sq").alias("sum_sq"),
            F.round(
            # div-safe: planted WAV payloads always carry >= 1 sample
                F.sqrt(F.sum("sum_sq") / F.sum(F.col("n_samples").cast("long"))),
                6,
            ).alias("rms"),
            F.max("peak").alias("max_peak"),
            F.sum("zero_cross").alias("zero_crossings"),
        )
        .orderBy("sample_rate")
    )


_WAV_DECODE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_WAV_RATE_BASE} * (1 + doc_id % {_WAV_RATE_MOD}) AS rate,
         {_WAV_N_BASE} + doc_id % {_WAV_N_MOD} AS n
  FROM documents
  WHERE doc_id % {_WAV_SAMPLE_MOD} = {_WAV_SAMPLE_RES}
),
-- no lateral generate_series(col) in this DuckDB build: cross with the
-- fixed max range (n <= {_WAV_N_BASE + _WAV_N_MOD - 1}) and filter per clip
samp AS (
  SELECT d.doc_id, d.rate, d.n, gi.i,
         (d.doc_id * 31 + gi.i * 17) % 4001 - 2000 AS s,
         CASE WHEN gi.i > 0
              THEN (d.doc_id * 31 + (gi.i - 1) * 17) % 4001 - 2000
         END AS prev_s
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_WAV_N_BASE + _WAV_N_MOD - 2})) AS i) gi
    ON gi.i < d.n
),
clip AS (
  SELECT doc_id, rate, n,
         SUM(s * s) AS sum_sq,
         MAX(abs(s)) AS peak,
         count_if(i > 0 AND (prev_s < 0) <> (s < 0)) AS zero_cross
  FROM samp GROUP BY doc_id, rate, n
)
SELECT CAST(rate AS INTEGER) AS sample_rate,
       COUNT(*) AS n_clips,
       CAST(SUM(n) AS BIGINT) AS total_samples,
       CAST(SUM(sum_sq) AS BIGINT) AS sum_sq,
       -- div-safe: planted WAV payloads always carry >= 1 sample
       ROUND(sqrt(CAST(SUM(sum_sq) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)), 6)
         AS rms,
       CAST(MAX(peak) AS INTEGER) AS max_peak,
       CAST(SUM(zero_cross) AS BIGINT) AS zero_crossings
FROM clip
GROUP BY rate
ORDER BY sample_rate
"""


# --- real video decode: dependency-free YUV4MPEG2 (y4m) -------------------
#
# The video sibling of the BMP/WAV paths (r7): y4m is the uncompressed
# video interchange format mjpegtools defined and ffmpeg/mplayer ship —
# a plain-text "YUV4MPEG2 W.. H.. F.. C420jpeg" header line followed by
# "FRAME" markers and raw 4:2:0 planar YUV bytes. Deterministic clips are
# planted (encoded byte-for-byte to that public layout), and
# :func:`decode_y4m` parses them back from the BYTES ALONE (header token
# walk, per-frame marker, Y/U/V plane strides at half-resolution chroma).
# The DuckDB oracle replays the *pixel formulas* in closed form, and a
# golden-bytes pytest pins the byte layout, so encoder/decoder bugs cannot
# cancel. Frame SAMPLING (the middle frame's stats next to the full-clip
# stats) exercises the "decode only the frames you need" shape a training
# pipeline uses at scale.

_Y4M_W_BASE, _Y4M_W_MOD = 8, 3    # width  = 8 + 2*(doc_id % 3) — even, 8..12
_Y4M_H_BASE, _Y4M_H_MOD = 6, 2    # height = 6 + 2*(doc_id % 2) — even, 6..8
_Y4M_F_BASE, _Y4M_F_MOD = 3, 4    # frames = 3 + doc_id % 4     — 3..6
_Y4M_SAMPLE_MOD = 4               # plant 1-in-4 docs as video
_Y4M_SAMPLE_RES = 3               # ... at residue 3 (BMP=0, WAV=2)


def _y4m_geometry(doc_id: int) -> tuple[int, int, int]:
    w = _Y4M_W_BASE + 2 * (doc_id % _Y4M_W_MOD)
    h = _Y4M_H_BASE + 2 * (doc_id % _Y4M_H_MOD)
    n = _Y4M_F_BASE + doc_id % _Y4M_F_MOD
    return w, h, n


def _y4m_luma(doc_id: int, f: int, x: int, y: int) -> int:
    """Deterministic Y sample — the formula the DuckDB oracle replays."""
    return (doc_id + 5 * f + 3 * x + 7 * y) % 256


def _y4m_chroma(doc_id: int, f: int, cx: int, cy: int) -> tuple[int, int]:
    """Deterministic (U, V) at half-resolution chroma coords."""
    return (
        (2 * doc_id + f + 3 * cx + cy) % 256,
        (doc_id + 11 * f + cx + 2 * cy) % 256,
    )


def _y4m_encode(doc_id: int) -> bytes:
    """Encode the planted clip for ``doc_id`` as a real YUV4MPEG2 stream
    (C420jpeg: full-res Y plane then quarter-size U and V planes per
    FRAME)."""
    import numpy as np

    w, h, n = _y4m_geometry(doc_id)
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode())
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)[:, None]
    cxs = np.arange(w // 2, dtype=np.int64)
    cys = np.arange(h // 2, dtype=np.int64)[:, None]
    for f in range(n):
        out += b"FRAME\n"
        out += (((doc_id + 5 * f + 3 * xs + 7 * ys) % 256)
                .astype(np.uint8).tobytes())
        out += (((2 * doc_id + f + 3 * cxs + cys) % 256)
                .astype(np.uint8).tobytes())
        out += (((doc_id + 11 * f + cxs + 2 * cys) % 256)
                .astype(np.uint8).tobytes())
    return bytes(out)


def decode_y4m(data: bytes):
    """Parse a YUV4MPEG2 4:2:0 stream from its bytes alone; returns
    ``(width, height, frames)`` with ``frames`` a list of (Y, U, V) uint8
    ndarrays (Y is h x w; U and V are h/2 x w/2). Raises ``ValueError`` on
    malformed/truncated/unsupported payloads."""
    import numpy as np

    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    for tok in data[:nl].split(b" ")[1:]:
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C") and not tok.startswith(b"C420"):
            raise ValueError("unsupported chroma mode (need C420*)")
    if not w or not h or w % 2 or h % 2:
        raise ValueError("missing or odd W/H for 4:2:0 planes")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frames = []
    off = nl + 1
    while off < len(data):
        fnl = data.find(b"\n", off)
        if fnl < 0 or not data[off:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        off = fnl + 1
        if off + ysz + 2 * csz > len(data):
            raise ValueError("truncated frame planes")
        yp = np.frombuffer(data, np.uint8, ysz, off).reshape(h, w)
        up = np.frombuffer(data, np.uint8, csz, off + ysz).reshape(h // 2, w // 2)
        vp = np.frombuffer(data, np.uint8, csz, off + ysz + csz).reshape(
            h // 2, w // 2
        )
        frames.append((yp, up, vp))
        off += ysz + 2 * csz
    if not frames:
        raise ValueError("no frames")
    return w, h, frames


#: Output contract of the y4m decode kernel.
Y4M_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, "
    "sum_y bigint, sum_u bigint, sum_v bigint, mid_frame_sum_y bigint"
)


def decode_y4m_stats(videos: DataFrame) -> DataFrame:
    """``mapInArrow`` decode kernel: (doc_id, media BINARY) → per-clip
    geometry, exact per-plane sums over ALL frames, and the middle frame's
    luma sum (the frame-sampling path)."""
    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            ws, hs, nf, sy, su, sv, mid = [], [], [], [], [], [], []
            for v in blobs:
                w, h, frames = decode_y4m(v.as_py())
                ws.append(w)
                hs.append(h)
                nf.append(len(frames))
                sy.append(sum(int(f[0].astype("int64").sum()) for f in frames))
                su.append(sum(int(f[1].astype("int64").sum()) for f in frames))
                sv.append(sum(int(f[2].astype("int64").sum()) for f in frames))
                mid.append(
                    int(frames[len(frames) // 2][0].astype("int64").sum())
                )
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                    pa.array(nf, type=pa.int32()),
                    pa.array(sy, type=pa.int64()),
                    pa.array(su, type=pa.int64()),
                    pa.array(sv, type=pa.int64()),
                    pa.array(mid, type=pa.int64()),
                ],
                names=["doc_id", "width", "height", "n_frames", "sum_y",
                       "sum_u", "sum_v", "mid_frame_sum_y"],
            )

    return videos.mapInArrow(fn, Y4M_STATS_SCHEMA)


def multimodal_y4m_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video decode end to end: plant deterministic YUV4MPEG2 4:2:0
    clips for 1-in-4 documents, decode them back from bytes alone with
    :func:`decode_y4m`, and report per (width, height, n_frames) shape:
    clip count, exact Y/U/V plane sums, mean luma, and the exact
    middle-frame luma sum (frame sampling). The DuckDB oracle recomputes
    everything from the pixel FORMULAS (never the bytes), so the header
    walk, FRAME framing, and half-resolution chroma strides are all
    value-checked.

    Scale shape: map-only until the final tiny groupBy (24 shape groups);
    blobs are built and decoded inside the scan stage and never shuffle —
    and the middle-frame column shows the kernel can sample frames without
    materializing per-frame rows."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _y4m_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _Y4M_SAMPLE_MOD == _Y4M_SAMPLE_RES)
    )
    videos = docs.mapInPandas(build, "doc_id bigint, media binary")
    stats = decode_y4m_stats(videos)
    n_luma = F.sum(
        F.col("width").cast("long") * F.col("height") * F.col("n_frames")
    )
    return (
        stats.groupBy("width", "height", "n_frames")
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.sum("sum_y").alias("sum_y"),
            F.sum("sum_u").alias("sum_u"),
            F.sum("sum_v").alias("sum_v"),
            # div-safe: n_luma = planted y4m width x height x frames > 0
            F.round(F.sum("sum_y") / n_luma, 4).alias("avg_luma"),
            F.sum("mid_frame_sum_y").alias("mid_frame_sum_y"),
        )
        .orderBy("width", "height", "n_frames")
    )


_Y4M_DECODE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_Y4M_W_BASE} + 2 * (doc_id % {_Y4M_W_MOD}) AS w,
         {_Y4M_H_BASE} + 2 * (doc_id % {_Y4M_H_MOD}) AS h,
         {_Y4M_F_BASE} + doc_id % {_Y4M_F_MOD} AS n
  FROM documents
  WHERE doc_id % {_Y4M_SAMPLE_MOD} = {_Y4M_SAMPLE_RES}
),
-- fixed max ranges (w <= {_Y4M_W_BASE + 2 * (_Y4M_W_MOD - 1)},
-- h <= {_Y4M_H_BASE + 2 * (_Y4M_H_MOD - 1)},
-- frames <= {_Y4M_F_BASE + _Y4M_F_MOD - 1}), filtered per clip
luma AS (
  SELECT d.doc_id, d.w, d.h, d.n, gf.f,
         SUM((d.doc_id + 5 * gf.f + 3 * gx.x + 7 * gy.y) % 256) AS fy
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_Y4M_F_BASE + _Y4M_F_MOD - 2})) AS f) gf
    ON gf.f < d.n
  JOIN (SELECT unnest(generate_series(0, {_Y4M_W_BASE + 2 * (_Y4M_W_MOD - 1) - 1})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_Y4M_H_BASE + 2 * (_Y4M_H_MOD - 1) - 1})) AS y) gy
    ON gy.y < d.h
  GROUP BY d.doc_id, d.w, d.h, d.n, gf.f
),
chroma AS (
  SELECT d.doc_id,
         SUM((2 * d.doc_id + gf.f + 3 * gx.cx + gy.cy) % 256) AS su,
         SUM((d.doc_id + 11 * gf.f + gx.cx + 2 * gy.cy) % 256) AS sv
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_Y4M_F_BASE + _Y4M_F_MOD - 2})) AS f) gf
    ON gf.f < d.n
  JOIN (SELECT unnest(generate_series(0, {(_Y4M_W_BASE + 2 * (_Y4M_W_MOD - 1)) // 2 - 1})) AS cx) gx
    ON gx.cx < d.w // 2
  JOIN (SELECT unnest(generate_series(0, {(_Y4M_H_BASE + 2 * (_Y4M_H_MOD - 1)) // 2 - 1})) AS cy) gy
    ON gy.cy < d.h // 2
  GROUP BY d.doc_id
),
clip AS (
  SELECT l.doc_id, l.w, l.h, l.n,
         SUM(l.fy) AS sum_y,
         SUM(CASE WHEN l.f = l.n // 2 THEN l.fy ELSE 0 END) AS mid_y
  FROM luma l GROUP BY l.doc_id, l.w, l.h, l.n
)
SELECT CAST(c.w AS INTEGER) AS width,
       CAST(c.h AS INTEGER) AS height,
       CAST(c.n AS INTEGER) AS n_frames,
       COUNT(*) AS n_videos,
       CAST(SUM(c.sum_y) AS BIGINT) AS sum_y,
       CAST(SUM(ch.su) AS BIGINT) AS sum_u,
       CAST(SUM(ch.sv) AS BIGINT) AS sum_v,
       ROUND(CAST(SUM(c.sum_y) AS DOUBLE)
       -- div-safe: planted y4m dims and frame counts are positive
             / SUM(CAST(c.w AS BIGINT) * c.h * c.n), 4) AS avg_luma,
       CAST(SUM(c.mid_y) AS BIGINT) AS mid_frame_sum_y
FROM clip c JOIN chroma ch ON c.doc_id = ch.doc_id
GROUP BY c.w, c.h, c.n
ORDER BY width, height, n_frames
"""



# --- real COMPRESSED image decode: dependency-free 8-bit RGB PNG ----------
#
# The first compressed format in the decoder family (r9 verdict #5): BMP is
# uncompressed, WAV is raw PCM, Y4M is raw planes — PNG adds a real codec
# stage (zlib inflate from the stdlib) plus the per-scanline predictive
# filters every real PNG carries. Deterministic 8-bit RGB images are
# planted (encoded byte-for-byte to the public PNG spec: signature, CRC'd
# chunks, IHDR, filtered scanlines deflated into SPLIT IDAT chunks, IEND),
# and :func:`decode_png` parses them back from the BYTES ALONE — chunk
# walk with CRC verification, multi-IDAT concatenation, inflate, and
# reversal of all five filter types (the encoder cycles filter = y % 5, so
# None/Sub/Up/Average/Paeth are ALL exercised on every image). The DuckDB
# oracle replays the pixel FORMULA in closed form (never the bytes), and a
# golden-bytes pytest pins the byte layout, so encoder/decoder bugs cannot
# cancel. Golden-fixture discipline follows the reference's test style
# (reference tests/regexp-tests.rs:5-27: planted input, formula-checkable
# expected output).

_PNG_W_BASE, _PNG_W_MOD = 12, 5   # width  = 12 + doc_id % 5 — 12..16
_PNG_H_BASE, _PNG_H_MOD = 9, 6    # height = 9 + doc_id % 6  — 9..14 (>= 5
#                                   rows, so every filter type appears)
_PNG_SAMPLE_MOD = 4               # plant 1-in-4 docs as PNG images
_PNG_SAMPLE_RES = 1               # ... at residue 1 (BMP=0, WAV=2, Y4M=3)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic (r, g, b) for the planted image — the formula the
    DuckDB oracle replays in SQL (distinct from the BMP formula so the two
    image families can never mask each other)."""
    return (
        (2 * doc_id + 5 * x + 3 * y) % 256,
        (doc_id + x + 11 * y) % 256,
        (7 * doc_id + 4 * x + y) % 256,
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left) per the public spec."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _png_encode(doc_id: int) -> bytes:
    """Encode the planted image for ``doc_id`` as a real 8-bit RGB PNG:
    scanlines filtered with filter type ``y % 5`` (all five spec filters),
    deflated with stdlib zlib, and written as TWO IDAT chunks (the spec
    allows the stream to split anywhere; decoders must concatenate)."""
    import struct
    import zlib

    w = _PNG_W_BASE + doc_id % _PNG_W_MOD
    h = _PNG_H_BASE + doc_id % _PNG_H_MOD
    stride = w * 3
    raw = bytearray()
    prior = [0] * stride
    for y in range(h):
        row = []
        for x in range(w):
            row.extend(_png_pixel(doc_id, x, y))
        ftype = y % 5
        raw.append(ftype)
        for i in range(stride):
            a = row[i - 3] if i >= 3 else 0
            b = prior[i]
            c = prior[i - 3] if i >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                pred = _paeth(a, b, c)
            raw.append((row[i] - pred) % 256)
        prior = row
    z = zlib.compress(bytes(raw), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    mid = len(z) // 2
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[:mid])
        + _png_chunk(b"IDAT", z[mid:])
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """Parse an 8-bit RGB non-interlaced PNG from its bytes alone; returns
    ``(width, height, pixels)`` with ``pixels`` an (h*w, 3) uint8 RGB
    ndarray in top-down row-major order. Verifies every chunk CRC,
    concatenates split IDAT streams, inflates with stdlib zlib, and
    reverses all five scanline filter types. Raises ``ValueError`` on
    malformed/unsupported payloads (corrupt blobs must fail loudly, not
    yield garbage stats)."""
    import struct
    import zlib

    import numpy as np

    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    off = 8
    w = h = None
    idat = bytearray()
    seen_iend = False
    first = True
    while off < len(data) and not seen_iend:
        if off + 8 > len(data):
            raise ValueError("truncated chunk header")
        ln, typ = struct.unpack_from(">I4s", data, off)
        off += 8
        if off + ln + 4 > len(data):
            raise ValueError("truncated chunk payload")
        payload = data[off : off + ln]
        (crc,) = struct.unpack_from(">I", data, off + ln)
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError("chunk CRC mismatch")
        off += ln + 4
        if first and typ != b"IHDR":
            raise ValueError("IHDR must be the first chunk")
        first = False
        if typ == b"IHDR":
            if ln != 13:
                raise ValueError("bad IHDR length")
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need 8-bit RGB, deflate,"
                    " no interlace)"
                )
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            seen_iend = True
    if w is None or h is None or not seen_iend or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from None
    stride = w * 3
    if len(raw) != h * (1 + stride):
        raise ValueError("decompressed scanline size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int64)
        pos += stride
        if ftype == 0:
            recon = row
        elif ftype == 2:
            recon = (row + prior) % 256
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth are sequential along x (each pixel needs
            # the reconstructed left neighbor) — per-byte loop; planted
            # scanlines are tens of bytes, and real decoders special-case
            # this exact dependency too
            recon = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = int(recon[i - 3]) if i >= 3 else 0
                b = int(prior[i])
                c = int(prior[i - 3]) if i >= 3 else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                recon[i] = (int(row[i]) + pred) % 256
        else:
            raise ValueError(f"bad scanline filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return w, h, out.reshape(h, w, 3).reshape(-1, 3)


#: Output contract of the PNG decode kernel.
PNG_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, mid_row_sum_r bigint"
)


def decode_png_stats(images: DataFrame) -> DataFrame:
    """``mapInArrow`` decode kernel: (doc_id, media BINARY) → per-image
    decoded dimensions, exact per-channel pixel sums, and the MIDDLE row's
    red sum (proves top-down row order survives filter reversal — a
    decoder that reverses rows would still get the totals right)."""
    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            ws, hs, sr, sg, sb, mid = [], [], [], [], [], []
            for v in blobs:
                w, h, px = decode_png(v.as_py())
                s = px.astype("int64").sum(axis=0)
                mrow = px.reshape(h, w, 3)[h // 2, :, 0].astype("int64")
                ws.append(w)
                hs.append(h)
                sr.append(int(s[0]))
                sg.append(int(s[1]))
                sb.append(int(s[2]))
                mid.append(int(mrow.sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                    pa.array(sr, type=pa.int64()),
                    pa.array(sg, type=pa.int64()),
                    pa.array(sb, type=pa.int64()),
                    pa.array(mid, type=pa.int64()),
                ],
                names=[
                    "doc_id", "width", "height",
                    "sum_r", "sum_g", "sum_b", "mid_row_sum_r",
                ],
            )

    return images.mapInArrow(fn, PNG_STATS_SCHEMA)


def multimodal_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real COMPRESSED image decode end to end: plant deterministic 8-bit
    RGB PNGs for 1-in-4 documents (builder encodes real zlib-deflated,
    CRC'd, filter-cycled PNG bytes), decode them back from bytes alone with
    :func:`decode_png`, and report per (width, height) shape: image count,
    exact per-channel sums, mean brightness, and the exact middle-row red
    sum. The DuckDB oracle recomputes the same stats from the pixel FORMULA
    (never the bytes), so every layout detail the decoder must get right —
    chunk CRCs, IDAT reassembly, inflate, and all five filter reversals —
    is value-checked: a single wrong predicted byte corrupts every later
    pixel in the row (and via the Up/Average/Paeth filters, every later
    ROW), which the sums catch.

    Scale shape: map-only until the final tiny groupBy (30 shape groups);
    blobs are built and decoded inside the scan stage and never shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _png_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _PNG_SAMPLE_MOD == _PNG_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")
    stats = decode_png_stats(images)
    n_px = F.sum(F.col("width").cast("long") * F.col("height"))
    return (
        stats.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("sum_r").alias("sum_r"),
            F.sum("sum_g").alias("sum_g"),
            F.sum("sum_b").alias("sum_b"),
            # div-safe: n_px = planted PNG width x height, positive
            F.round(
                (F.sum("sum_r") + F.sum("sum_g") + F.sum("sum_b"))
                / (n_px * 3.0),
                4,
            ).alias("avg_brightness"),
            F.sum("mid_row_sum_r").alias("mid_row_sum_r"),
        )
        .orderBy("width", "height")
    )


_PNG_DECODE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_PNG_W_BASE} + doc_id % {_PNG_W_MOD} AS w,
         {_PNG_H_BASE} + doc_id % {_PNG_H_MOD} AS h
  FROM documents WHERE doc_id % {_PNG_SAMPLE_MOD} = {_PNG_SAMPLE_RES}
),
px AS (
  -- fixed max ranges (w <= {_PNG_W_BASE + _PNG_W_MOD - 1},
  -- h <= {_PNG_H_BASE + _PNG_H_MOD - 1}), filtered per image
  SELECT d.doc_id, d.w, d.h, gx.x, gy.y
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_PNG_W_BASE + _PNG_W_MOD - 2})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_PNG_H_BASE + _PNG_H_MOD - 2})) AS y) gy
    ON gy.y < d.h
),
vals AS (
  SELECT doc_id, w, h, x, y,
         (2 * doc_id + 5 * x + 3 * y) % 256 AS r,
         (doc_id + x + 11 * y) % 256 AS g,
         (7 * doc_id + 4 * x + y) % 256 AS b
  FROM px
)
SELECT CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       COUNT(DISTINCT doc_id) AS n_images,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       -- div-safe: COUNT(*) of a GROUP BY group is >= 1
       ROUND(CAST(SUM(r) + SUM(g) + SUM(b) AS DOUBLE) / (COUNT(*) * 3.0), 4)
         AS avg_brightness,
       CAST(SUM(CASE WHEN y = h // 2 THEN r ELSE 0 END) AS BIGINT)
         AS mid_row_sum_r
FROM vals
GROUP BY w, h
ORDER BY width, height
"""


# --------------------------------------------------------------------------
# PNG ENCODER (write path) — a hand-rolled RFC-1951 DEFLATE writer
# (stored + fixed-Huffman blocks) under the zlib container, round-tripped
# against stdlib inflate via decode_png: both-directions interop for the
# DEFLATE layer, the way Avro got jar-interop in r13 (r13 verdict #6).
# --------------------------------------------------------------------------

#: encoder-plant pixel formula — distinct from the decode-stats plant so
#: the two PNG queries can never mask each other.
def _pngw_pixel_exprs(d: str = "doc_id", x: str = "x", y: str = "y"):
    """The (r, g, b) formula as SQL strings (single source of truth for
    the oracle; the numpy builder mirrors it)."""
    return (
        f"(3 * {d} + 7 * {x} + 5 * {y}) % 256",
        f"(5 * {d} + 2 * {x} + 9 * {y}) % 256",
        f"({d} + 6 * {x} + 13 * {y}) % 256",
    )


#: stored/fixed blocks alternate at this raw-byte granularity, so every
#: planted image carries MULTIPLE blocks of BOTH types (BFINAL handling,
#: byte-alignment after a stored header, and the 7/8/9-bit fixed code
#: ranges are all exercised on every image).
_PNGW_BLOCK_BYTES = 120


class _DeflateBitWriter:
    """RFC-1951 bit packing: data elements enter LSB-first, Huffman codes
    enter MSB-first (the spec's one asymmetry — getting it backwards
    produces streams zlib rejects, which is exactly what the round-trip
    catches)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def bits(self, value: int, n: int) -> None:
        self._acc |= value << self._n
        self._n += n
        while self._n >= 8:
            self.buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def huff(self, code: int, n: int) -> None:
        rev = 0
        for _ in range(n):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.bits(rev, n)

    def align(self) -> None:
        if self._n:
            self.buf.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0


def _deflate_fixed_block(w: _DeflateBitWriter, data: bytes,
                         final: bool) -> None:
    """One fixed-Huffman (BTYPE=01) literal-only block: every byte emitted
    as its fixed literal code (0-143 → 8 bits from 0x30, 144-255 → 9 bits
    from 0x190), closed with the 7-bit end-of-block code 0. Literal-only
    is valid DEFLATE — no LZ77 matches, just the entropy layer."""
    w.bits(1 if final else 0, 1)
    w.bits(1, 2)
    for byte in data:
        if byte < 144:
            w.huff(0x30 + byte, 8)
        else:
            w.huff(0x190 + (byte - 144), 9)
    w.huff(0, 7)


def _deflate_stored_block(w: _DeflateBitWriter, data: bytes,
                          final: bool) -> None:
    """One stored (BTYPE=00) block: header bits, byte-align, then
    LEN/NLEN (one's complement) and the raw bytes."""
    import struct

    if len(data) > 0xFFFF:
        raise ValueError("stored block over 65535 bytes")
    w.bits(1 if final else 0, 1)
    w.bits(0, 2)
    w.align()
    w.buf += struct.pack("<HH", len(data), len(data) ^ 0xFFFF)
    w.buf += data


def _zlib_compress_own(raw: bytes, doc_id: int) -> bytes:
    """zlib-container DEFLATE stream from OUR writer: 0x78 0x01 header
    (32 KB window, check bits valid: 0x7801 % 31 == 0), blocks of
    {block} raw bytes alternating stored/fixed (phase keyed by doc_id so
    both orderings occur across the corpus), adler32 trailer. stdlib
    ``zlib.decompress`` — the reader inside :func:`decode_png` — is the
    independent counter-implementation that verifies it."""
    import struct
    import zlib

    w = _DeflateBitWriter()
    chunks = [
        raw[i:i + _PNGW_BLOCK_BYTES]
        for i in range(0, len(raw), _PNGW_BLOCK_BYTES)
    ] or [b""]
    for i, chunk in enumerate(chunks):
        final = i == len(chunks) - 1
        if (i + doc_id) % 2 == 0:
            _deflate_stored_block(w, chunk, final)
        else:
            _deflate_fixed_block(w, chunk, final)
    w.align()
    return b"\x78\x01" + bytes(w.buf) + struct.pack(
        ">I", zlib.adler32(raw) & 0xFFFFFFFF
    )


_zlib_compress_own.__doc__ = _zlib_compress_own.__doc__.format(
    block=_PNGW_BLOCK_BYTES
)


def _pngw_encode(doc_id: int) -> bytes:
    """Encode the writer-plant image for ``doc_id`` as a real PNG whose
    IDAT stream comes from OUR deflate writer (never stdlib
    ``zlib.compress``): same spec-filter cycling (y % 5) as
    :func:`_png_encode`, pixels from the writer-plant formula, IDAT split
    in two (decoders must concatenate)."""
    import struct

    w = _PNG_W_BASE + doc_id % _PNG_W_MOD
    h = _PNG_H_BASE + doc_id % _PNG_H_MOD
    stride = w * 3
    raw = bytearray()
    prior = [0] * stride
    for y in range(h):
        row = []
        for x in range(w):
            row.extend(
                (
                    (3 * doc_id + 7 * x + 5 * y) % 256,
                    (5 * doc_id + 2 * x + 9 * y) % 256,
                    (doc_id + 6 * x + 13 * y) % 256,
                )
            )
        ftype = y % 5
        raw.append(ftype)
        for i in range(stride):
            a = row[i - 3] if i >= 3 else 0
            b = prior[i]
            c = prior[i - 3] if i >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                pred = _paeth(a, b, c)
            raw.append((row[i] - pred) % 256)
        prior = row
    z = _zlib_compress_own(bytes(raw), doc_id)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    mid = len(z) // 2
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[:mid])
        + _png_chunk(b"IDAT", z[mid:])
        + _png_chunk(b"IEND", b"")
    )


def multimodal_png_encode_roundtrip(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """PNG WRITE PATH end to end — the multimodal sink the decoder lineage
    lacked (r13 verdict #6): the builder kernel encodes each planted image
    with a HAND-ROLLED RFC-1951 DEFLATE writer (stored + fixed-Huffman
    blocks alternating within every IDAT stream, zlib container with
    adler32) — never stdlib ``zlib.compress`` — and the images round-trip
    through :func:`decode_png`, whose stdlib-``zlib.decompress`` reader is
    the independent counter-implementation. The census per (width, height)
    shape mirrors the decode-stats query on the WRITER-plant pixel formula
    (distinct coefficients, so the two PNG queries can never mask each
    other); the DuckDB oracle replays that formula in closed form. Any
    writer bug — bit order, block framing, NLEN complement, 9-bit code
    range, adler32 — makes inflate raise or corrupts the sums.

    Scale shape: identical to the decode twin — map-only encode + decode
    in the scan stage (blobs never shuffle), tiny shape-group aggregate."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(
                        lambda d: _pngw_encode(int(d))
                    ),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _PNG_SAMPLE_MOD == _PNG_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")
    stats = decode_png_stats(images)
    n_px = F.sum(F.col("width").cast("long") * F.col("height"))
    return (
        stats.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("sum_r").alias("sum_r"),
            F.sum("sum_g").alias("sum_g"),
            F.sum("sum_b").alias("sum_b"),
            # div-safe: n_px = planted PNG width x height, positive
            F.round(
                (F.sum("sum_r") + F.sum("sum_g") + F.sum("sum_b"))
                / (n_px * 3.0),
                4,
            ).alias("avg_brightness"),
            F.sum("mid_row_sum_r").alias("mid_row_sum_r"),
        )
        .orderBy("width", "height")
    )


_PNGW_R, _PNGW_G, _PNGW_B = _pngw_pixel_exprs()

_PNG_ENCODE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_PNG_W_BASE} + doc_id % {_PNG_W_MOD} AS w,
         {_PNG_H_BASE} + doc_id % {_PNG_H_MOD} AS h
  FROM documents WHERE doc_id % {_PNG_SAMPLE_MOD} = {_PNG_SAMPLE_RES}
),
px AS (
  SELECT d.doc_id, d.w, d.h, gx.x, gy.y
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_PNG_W_BASE + _PNG_W_MOD - 2})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_PNG_H_BASE + _PNG_H_MOD - 2})) AS y) gy
    ON gy.y < d.h
),
vals AS (
  SELECT doc_id, w, h, x, y,
         {_PNGW_R} AS r,
         {_PNGW_G} AS g,
         {_PNGW_B} AS b
  FROM px
)
SELECT CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       COUNT(DISTINCT doc_id) AS n_images,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       -- div-safe: COUNT(*) of a GROUP BY group is >= 1
       ROUND(CAST(SUM(r) + SUM(g) + SUM(b) AS DOUBLE) / (COUNT(*) * 3.0), 4)
         AS avg_brightness,
       CAST(SUM(CASE WHEN y = h // 2 THEN r ELSE 0 END) AS BIGINT)
         AS mid_row_sum_r
FROM vals
GROUP BY w, h
ORDER BY width, height
"""


# --------------------------------------------------------------------------
# GIF decode (real variable-width LZW) — dictionary-compressed format #2
# --------------------------------------------------------------------------

_GIF_W_BASE, _GIF_W_MOD = 18, 5   # width  = 18 + doc_id % 5 — 18..22
_GIF_H_BASE, _GIF_H_MOD = 11, 4   # height = 11 + doc_id % 4 — 11..14
_GIF_SAMPLE_MOD = 5               # plant 1-in-5 docs as GIF images
_GIF_SAMPLE_RES = 0
_GIF_NCOLORS = 16                 # 4-bit palette → LZW min code size 4
#: encoder emits a CLEAR every this many codes, so the decoder's
#: dictionary-reset path is exercised on every planted image
_GIF_CLEAR_EVERY = 64


def _gif_palette(i: int) -> tuple[int, int, int]:
    """Deterministic 16-color palette (pure arithmetic — the oracle
    recomputes it in SQL)."""
    return ((17 * i) % 256, (11 * i + 5) % 256, (7 * i + 13) % 256)


def _gif_index(doc_id: int, x: int, y: int) -> int:
    """Planted palette index at (x, y) — pure arithmetic."""
    return (doc_id + 3 * x + 7 * y) % _GIF_NCOLORS


class _LZWBitWriter:
    """LSB-first bit packer (GIF's bit order) with 255-byte sub-blocking."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        out = bytearray()
        for i in range(0, len(self.bytes), 255):
            chunk = self.bytes[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
        return bytes(out)


def _gif_lzw_compress(indices: list[int], mcs: int) -> bytes:
    """Real GIF LZW: dictionary of pixel strings, variable code width
    (mcs+1 up to 12 bits, 'late change' convention), periodic CLEAR codes
    so decode exercises the reset path. The code WIDTH is driven by the
    DECODER's dictionary schedule (one add per code read after the first
    since reset) — not the encoder's own add schedule, which skips an add
    at the stream-final and pre-clear emissions and would desync the width
    exactly when the decoder's lagging add lands on a power of two.
    Mirrors :func:`_gif_lzw_decompress` exactly (pytest round-trips random
    sequences and the planted fixtures)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    wtr = _LZWBitWriter()
    width = mcs + 1
    n_reads = 0  # data codes the decoder has read since the last clear

    def emit(code: int) -> None:
        nonlocal width, n_reads
        wtr.put(code, width)
        n_reads += 1
        if n_reads >= 2:  # decoder adds entry eoi+1 + (n_reads-2) now
            if eoi + n_reads == (1 << width) and width < 12:
                width += 1

    def reset() -> tuple[dict, int]:
        nonlocal width, n_reads
        wtr.put(clear, width)
        width = mcs + 1
        n_reads = 0
        return {(-1, k): k for k in range(1 << mcs)}, eoi + 1

    table, nxt = reset()
    w = -1
    emitted = 0
    for k in indices:
        if (w, k) in table:
            w = table[(w, k)]
            continue
        emit(w)
        emitted += 1
        if nxt < 4096:
            table[(w, k)] = nxt
            nxt += 1
        w = k
        if emitted % _GIF_CLEAR_EVERY == 0:
            emit(w)
            table, nxt = reset()
            w = -1
    if w != -1:
        emit(w)
    emit(eoi)
    return wtr.finish()


def _gif_lzw_decompress(data: bytes, mcs: int, expect: int) -> list[int]:
    """Decode a GIF LZW code stream (already de-sub-blocked) back to at
    most ``expect`` palette indices. Handles variable code width, CLEAR
    resets, the KwKwK (code == next entry) case, and raises ``ValueError``
    on codes beyond the dictionary or a truncated stream."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = 0  # bit position
    nbits = len(data) * 8
    out: list[int] = []
    table: list[list[int]] = []
    width = mcs + 1
    nxt = eoi + 1
    prev: list[int] | None = None

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("truncated LZW stream")
        byte, bit = pos >> 3, pos & 7
        v = int.from_bytes(data[byte : byte + 3], "little") >> bit
        pos += width
        return v & ((1 << width) - 1)

    def reset_table() -> None:
        nonlocal table, width, nxt, prev
        table = [[k] for k in range(1 << mcs)] + [[], []]
        width = mcs + 1
        nxt = eoi + 1
        prev = None

    reset_table()
    while True:
        code = read(width)
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first code after clear not a root")
            entry = table[code]
        elif code < nxt:
            entry = table[code]
        elif code == nxt:  # KwKwK
            entry = prev + [prev[0]]
        else:
            raise ValueError(f"LZW code {code} beyond dictionary {nxt}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > expect:
            raise ValueError("LZW stream decodes past the image size")
    return out


def _gif_encode(doc_id: int) -> bytes:
    """Build a real GIF89a: logical screen descriptor, 16-color global
    palette, a Graphic Control Extension (the decoder must SKIP extension
    blocks), one image descriptor, LZW-compressed pixel indices, trailer."""
    import struct

    w = _GIF_W_BASE + doc_id % _GIF_W_MOD
    h = _GIF_H_BASE + doc_id % _GIF_H_MOD
    mcs = 4  # 16-color palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | 0x03)  # global color table, 2^(3+1) = 16 entries
    out += b"\x00\x00"       # bg color, aspect
    for i in range(_GIF_NCOLORS):
        out += bytes(_gif_palette(i))
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    indices = [_gif_index(doc_id, x, y) for y in range(h) for x in range(w)]
    out.append(mcs)
    out += _gif_lzw_compress(indices, mcs)
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes):
    """Parse a GIF87a/89a with a global color table and one non-interlaced
    image from its bytes alone; returns ``(width, height, pixels)`` with
    ``pixels`` an (h*w, 3) uint8 RGB ndarray in top-down row-major order.
    Skips extension blocks, de-sub-blocks the LZW stream, and runs the
    full variable-width LZW decode. Raises ``ValueError`` on malformed
    payloads (corrupt blobs must fail loudly, not yield garbage stats)."""
    import struct

    import numpy as np

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    off = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if off + 3 * n > len(data):
            raise ValueError("truncated global color table")
        palette = np.frombuffer(data, np.uint8, 3 * n, off).reshape(n, 3)
        off += 3 * n
    while off < len(data):
        b0 = data[off]
        off += 1
        if b0 == 0x21:  # extension: label + sub-blocks
            off += 1
            while off < len(data) and data[off] != 0:
                off += 1 + data[off]
            off += 1
        elif b0 == 0x2C:
            break
        elif b0 == 0x3B:
            raise ValueError("trailer before any image data")
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    else:
        raise ValueError("no image descriptor")
    if off + 9 > len(data):
        raise ValueError("truncated image descriptor")
    left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, off)
    off += 9
    if ipacked & 0x80:
        raise ValueError("local color tables unsupported")
    if ipacked & 0x40:
        raise ValueError("interlaced GIFs unsupported")
    if palette is None:
        raise ValueError("no color table")
    if (left, top, w, h) != (0, 0, sw, sh):
        raise ValueError("sub-rectangle images unsupported")
    if off >= len(data):
        raise ValueError("missing LZW minimum code size")
    mcs = data[off]
    off += 1
    if not 2 <= mcs <= 8:
        raise ValueError(f"bad LZW minimum code size {mcs}")
    stream = bytearray()
    while True:
        if off >= len(data):
            raise ValueError("unterminated image sub-blocks")
        ln = data[off]
        off += 1
        if ln == 0:
            break
        stream += data[off : off + ln]
        off += ln
    idx = _gif_lzw_decompress(bytes(stream), mcs, w * h)
    if len(idx) != w * h:
        raise ValueError(f"decoded {len(idx)} pixels, expected {w * h}")
    arr = np.asarray(idx, dtype=np.int64)
    if arr.max() >= len(palette):
        raise ValueError("palette index out of range")
    return int(w), int(h), palette[arr]


#: Output contract of the GIF decode kernel.
GIF_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, mid_row_sum_r bigint"
)


def decode_gif_stats(images: DataFrame) -> DataFrame:
    """``mapInArrow`` decode kernel: (doc_id, media BINARY) → decoded
    dimensions, exact per-channel sums, and the middle row's red sum
    (proves pixel ORDER survives the LZW round-trip, not just totals)."""
    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            ws, hs, sr, sg, sb, mid = [], [], [], [], [], []
            for v in blobs:
                w, h, px = decode_gif(v.as_py())
                s = px.astype("int64").sum(axis=0)
                mrow = px.reshape(h, w, 3)[h // 2, :, 0].astype("int64")
                ws.append(w)
                hs.append(h)
                sr.append(int(s[0]))
                sg.append(int(s[1]))
                sb.append(int(s[2]))
                mid.append(int(mrow.sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                    pa.array(sr, type=pa.int64()),
                    pa.array(sg, type=pa.int64()),
                    pa.array(sb, type=pa.int64()),
                    pa.array(mid, type=pa.int64()),
                ],
                names=[
                    "doc_id", "width", "height",
                    "sum_r", "sum_g", "sum_b", "mid_row_sum_r",
                ],
            )

    return images.mapInArrow(fn, GIF_STATS_SCHEMA)


def multimodal_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DICTIONARY-compressed image decode end to end — the codec class PNG
    (zlib/LZ77+Huffman) doesn't cover: plant deterministic 16-color GIF89a
    payloads for 1-in-5 documents (real variable-width LZW with dictionary
    growth and periodic CLEAR resets, palette table, extension block,
    sub-blocked stream), decode them back from bytes alone with
    :func:`decode_gif`, and report per (width, height): image count, exact
    per-channel sums, mean brightness, and the exact middle-row red sum.
    The DuckDB oracle recomputes from the palette/index FORMULA (never the
    bytes), so every LZW detail — code widths, the late-change growth
    rule, KwKwK, dictionary resets, sub-block reassembly — is
    value-checked: one wrong code shifts the whole remaining pixel stream.

    Scale shape: map-only until the final tiny groupBy (20 shape groups);
    blobs are built and decoded inside the scan stage and never shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _gif_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _GIF_SAMPLE_MOD == _GIF_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")
    stats = decode_gif_stats(images)
    n_px = F.sum(F.col("width").cast("long") * F.col("height"))
    return (
        stats.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("sum_r").alias("sum_r"),
            F.sum("sum_g").alias("sum_g"),
            F.sum("sum_b").alias("sum_b"),
            # div-safe: n_px = planted GIF width x height, positive
            F.round(
                (F.sum("sum_r") + F.sum("sum_g") + F.sum("sum_b"))
                / (n_px * 3.0),
                4,
            ).alias("avg_brightness"),
            F.sum("mid_row_sum_r").alias("mid_row_sum_r"),
        )
        .orderBy("width", "height")
    )


_GIF_DECODE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_GIF_W_BASE} + doc_id % {_GIF_W_MOD} AS w,
         {_GIF_H_BASE} + doc_id % {_GIF_H_MOD} AS h
  FROM documents WHERE doc_id % {_GIF_SAMPLE_MOD} = {_GIF_SAMPLE_RES}
),
px AS (
  SELECT d.doc_id, d.w, d.h, gx.x, gy.y
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_GIF_W_BASE + _GIF_W_MOD - 2})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_GIF_H_BASE + _GIF_H_MOD - 2})) AS y) gy
    ON gy.y < d.h
),
vals AS (
  SELECT doc_id, w, h, x, y,
         (17 * ((doc_id + 3 * x + 7 * y) % {_GIF_NCOLORS})) % 256 AS r,
         (11 * ((doc_id + 3 * x + 7 * y) % {_GIF_NCOLORS}) + 5) % 256 AS g,
         (7 * ((doc_id + 3 * x + 7 * y) % {_GIF_NCOLORS}) + 13) % 256 AS b
  FROM px
)
SELECT CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       COUNT(DISTINCT doc_id) AS n_images,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       -- div-safe: COUNT(*) of a GROUP BY group is >= 1
       ROUND(CAST(SUM(r) + SUM(g) + SUM(b) AS DOUBLE) / (COUNT(*) * 3.0), 4)
         AS avg_brightness,
       CAST(SUM(CASE WHEN y = h // 2 THEN r ELSE 0 END) AS BIGINT)
         AS mid_row_sum_r
FROM vals
GROUP BY w, h
ORDER BY width, height
"""


# --------------------------------------------------------------------------
# Y4M scene-cut detection (temporal analysis over decoded video frames)
# --------------------------------------------------------------------------

#: luma shift planted at the mid-clip frame — the "scene cut".
_CUT_SHIFT = 128
#: mean-abs-luma-diff threshold separating cut pairs (~128) from the
#: smooth +5/frame drift (~10 including mod-256 wrap pixels).
_CUT_MAD_T = 64.0


def _y4m_encode_cut(doc_id: int) -> bytes:
    """Planted clip WITH a scene cut: same geometry and smooth luma drift
    as :func:`_y4m_encode`, plus a +{shift} luma shift from the mid-clip
    frame onward (pure arithmetic — the oracle replays both halves)."""
    import numpy as np

    w, h, n = _y4m_geometry(doc_id)
    cut = n // 2
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode())
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)[:, None]
    cxs = np.arange(w // 2, dtype=np.int64)
    cys = np.arange(h // 2, dtype=np.int64)[:, None]
    for f in range(n):
        shift = _CUT_SHIFT if f >= cut else 0
        out += b"FRAME\n"
        out += (((doc_id + 5 * f + 3 * xs + 7 * ys + shift) % 256)
                .astype(np.uint8).tobytes())
        out += (((2 * doc_id + f + 3 * cxs + cys) % 256)
                .astype(np.uint8).tobytes())
        out += (((doc_id + 11 * f + cxs + 2 * cys) % 256)
                .astype(np.uint8).tobytes())
    return bytes(out)


def multimodal_y4m_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCENE-CUT DETECTION — the first TEMPORAL video operator (the frame
    decoders are spatial): plant clips whose luma drifts smoothly +5 per
    frame except for one +{shift} shift at the mid-clip frame, decode them
    with the shared YUV4MPEG2 parser, and flag a cut wherever the mean
    absolute luma difference between consecutive frames exceeds
    {t} (smooth pairs sit near 10 — including the mod-256 wrap pixels —
    cut pairs near 128). Per frame-count group: clips, frame pairs, cuts
    detected, and the mean MAD on cut vs non-cut pairs. The oracle
    replays the pixel formulas for BOTH halves in SQL, so the detector's
    inputs are value-checked, not just its verdicts — and pytest pins
    exactly one cut per clip at the planted position.

    Scale shape: frame differencing is vectorized numpy inside the
    map-only decode kernel (consecutive frames of one clip are adjacent
    bytes in one blob — no shuffle sees a frame); the aggregate is 4
    rows."""
    import numpy as np
    import pyarrow as pa

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(
                        lambda d: _y4m_encode_cut(int(d))
                    ),
                }
            )

    def diffs(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            blobs = b.column(b.schema.get_field_index("media"))
            nf, pair, sad, npx = [], [], [], []
            for v in blobs:
                w, h, frames = decode_y4m(v.as_py())
                for i in range(1, len(frames)):
                    d = np.abs(
                        frames[i][0].astype(np.int64)
                        - frames[i - 1][0].astype(np.int64)
                    )
                    nf.append(len(frames))
                    pair.append(i)
                    sad.append(int(d.sum()))
                    npx.append(int(d.size))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(nf, type=pa.int32()),
                    pa.array(pair, type=pa.int32()),
                    pa.array(sad, type=pa.int64()),
                    pa.array(npx, type=pa.int64()),
                ],
                names=["n_frames", "pair", "sad", "n_px"],
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _Y4M_SAMPLE_MOD == _Y4M_SAMPLE_RES)
    )
    clips = docs.mapInPandas(build, "doc_id bigint, media binary")
    pairs = clips.mapInArrow(
        diffs, "n_frames int, pair int, sad long, n_px long"
    )
    # div-safe: n_px = decoded width x height of a planted frame, positive
    mad = F.col("sad") / F.col("n_px")
    is_cut = mad > _CUT_MAD_T
    return (
        pairs.groupBy("n_frames")
        .agg(
            # each clip contributes n_frames - 1 pairs
            # div-safe: planted clips have n_frames >= 3, so the divisor
            # n_frames - 1 >= 2
            (
                F.count(F.lit(1)) / (F.col("n_frames") - 1)
            ).cast("long").alias("n_clips"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(is_cut.cast("long")).alias("n_cuts"),
            F.round(
                F.avg(F.when(is_cut, mad)), 4
            ).alias("avg_mad_cut"),
            F.round(
                F.avg(F.when(~is_cut, mad)), 4
            ).alias("avg_mad_smooth"),
        )
        .orderBy("n_frames")
    )


_Y4M_CUTS_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_Y4M_W_BASE} + 2 * (doc_id % {_Y4M_W_MOD}) AS w,
         {_Y4M_H_BASE} + 2 * (doc_id % {_Y4M_H_MOD}) AS h,
         {_Y4M_F_BASE} + doc_id % {_Y4M_F_MOD} AS n
  FROM documents
  WHERE doc_id % {_Y4M_SAMPLE_MOD} = {_Y4M_SAMPLE_RES}
),
px AS (
  SELECT d.doc_id, d.w, d.h, d.n, gf.f, gx.x, gy.y
  FROM docs d
  JOIN (SELECT unnest(generate_series(1, {_Y4M_F_BASE + _Y4M_F_MOD - 2})) AS f) gf
    ON gf.f < d.n
  JOIN (SELECT unnest(generate_series(0, {_Y4M_W_BASE + 2 * (_Y4M_W_MOD - 1) - 1})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_Y4M_H_BASE + 2 * (_Y4M_H_MOD - 1) - 1})) AS y) gy
    ON gy.y < d.h
),
d AS (
  SELECT doc_id, n, f,
         ABS(((doc_id + 5 * f + 3 * x + 7 * y
               + CASE WHEN f >= n // 2 THEN {_CUT_SHIFT} ELSE 0 END) % 256)
             - ((doc_id + 5 * (f - 1) + 3 * x + 7 * y
                 + CASE WHEN f - 1 >= n // 2 THEN {_CUT_SHIFT} ELSE 0 END)
                % 256)) AS ad
  FROM px
),
pairs AS (
  SELECT doc_id, n AS n_frames, f AS pair,
         SUM(ad) AS sad, COUNT(*) AS n_px
  FROM d GROUP BY doc_id, n, f
),
scored AS (
  -- div-safe: n_px = planted frame width x height, positive
  SELECT n_frames, CAST(sad AS DOUBLE) / n_px AS mad
  FROM pairs
)
SELECT CAST(n_frames AS INTEGER) AS n_frames,
       -- div-safe: planted clips have n_frames >= 3
       CAST(COUNT(*) / (n_frames - 1) AS BIGINT) AS n_clips,
       COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN mad > {_CUT_MAD_T} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cuts,
       ROUND(AVG(CASE WHEN mad > {_CUT_MAD_T} THEN mad END), 4)
         AS avg_mad_cut,
       ROUND(AVG(CASE WHEN mad <= {_CUT_MAD_T} THEN mad END), 4)
         AS avg_mad_smooth
FROM scored
GROUP BY n_frames
ORDER BY n_frames
"""


# --------------------------------------------------------------------------
# WAV spectral analysis (per-clip DFT bins over the decoded samples)
# --------------------------------------------------------------------------

#: DFT bins analyzed per clip (k = 1..3 cycles over the clip length).
_SPEC_BINS = 3
#: per-clip power rounding before any comparison/aggregation: engine libm
#: cos/sin differ at the last bit, which is ~1e-6 absolute on these 1e10-
#: scale powers — far inside a 2-dp round, so both engines round alike.
_SPEC_ROUND = 2


def wav_spectrum(clips: DataFrame) -> DataFrame:
    """``mapInArrow`` DFT kernel: decode each WAV and compute the exact
    DFT power ``|Σ s_i·e^{-2πik·i/N}|²`` at bins k=1..{bins} with a scalar
    ``math.cos/sin`` loop (the same libm path the SQL replay takes — a
    SIMD-vectorized trig variant could differ beyond the rounding margin).
    Emits per-clip rounded bin powers and the dominant bin (argmax on the
    ROUNDED powers, smaller k on ties — deterministic cross-engine)."""
    import math

    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            rates, powers, doms = [], [[] for _ in range(_SPEC_BINS)], []
            for v in blobs:
                rate, s = decode_wav(v.as_py())
                n = len(s)
                pk = []
                for k in range(1, _SPEC_BINS + 1):
                    re = im = 0.0
                    for i in range(n):
                        # div-safe: decode_wav yields >= 1 sample here (the
                        # loop body only runs when n >= 1)
                        th = 2 * math.pi * k * i / n
                        re += float(s[i]) * math.cos(th)
                        im += float(s[i]) * math.sin(th)
                    p = re * re + im * im
                    pk.append(_round_half_up_f(p, _SPEC_ROUND))
                rates.append(rate)
                for j in range(_SPEC_BINS):
                    powers[j].append(pk[j])
                doms.append(1 + max(range(_SPEC_BINS),
                                    key=lambda j: (pk[j], -j)))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(rates, type=pa.int32()),
                    *[pa.array(powers[j], type=pa.float64())
                      for j in range(_SPEC_BINS)],
                    pa.array(doms, type=pa.int32()),
                ],
                names=["doc_id", "sample_rate",
                       *[f"p{k}" for k in range(1, _SPEC_BINS + 1)],
                       "dominant_bin"],
            )

    schema = (
        "doc_id bigint, sample_rate int, "
        + ", ".join(f"p{k} double" for k in range(1, _SPEC_BINS + 1))
        + ", dominant_bin int"
    )
    return clips.mapInArrow(fn, schema)


def _round_half_up_f(x: float, nd: int) -> float:
    """Half-away-from-zero rounding matching Spark F.round / DuckDB ROUND
    (Python's builtin round is banker's and diverges on exact halves)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), rounding=ROUND_HALF_UP)
    )


def multimodal_wav_spectrum_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECTRAL feature extraction over decoded audio — the step after
    :func:`multimodal_wav_decode_stats`'s time-domain stats that a real
    audio-curation pipeline takes (tone/speech/music heuristics all start
    from band energies): per planted clip, the exact DFT power at the
    first {bins} bins, and per sample rate: clip count, the mean bin
    powers, and how many clips each bin dominates. The DuckDB oracle
    recomputes the full DFT from the planted sample FORMULA with SQL
    ``COS/SIN`` sums — so the decode AND the transform are value-checked.

    Scale shape: the O(N·K) per-clip transform runs inside the map-only
    decode kernel (no shuffle sees a sample); the aggregate is 3 rows."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _wav_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _WAV_SAMPLE_MOD == _WAV_SAMPLE_RES)
    )
    clips = docs.mapInPandas(build, "doc_id bigint, media binary")
    spec = wav_spectrum(clips)
    return (
        spec.groupBy("sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            *[
                F.round(F.avg(f"p{k}"), _SPEC_ROUND).alias(f"avg_p{k}")
                for k in range(1, _SPEC_BINS + 1)
            ],
            *[
                F.sum((F.col("dominant_bin") == k).cast("long")).alias(
                    f"n_dom{k}"
                )
                for k in range(1, _SPEC_BINS + 1)
            ],
        )
        .orderBy("sample_rate")
    )


_WAV_SPECTRUM_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_WAV_RATE_BASE} * (1 + doc_id % {_WAV_RATE_MOD}) AS rate,
         {_WAV_N_BASE} + doc_id % {_WAV_N_MOD} AS n
  FROM documents
  WHERE doc_id % {_WAV_SAMPLE_MOD} = {_WAV_SAMPLE_RES}
),
samples AS (
  SELECT d.doc_id, d.rate, d.n, gi.i,
         (d.doc_id * 31 + gi.i * 17) % 4001 - 2000 AS s
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_WAV_N_BASE + _WAV_N_MOD - 2})) AS i) gi
    ON gi.i < d.n
),
sums AS (
  SELECT doc_id, rate, k,
         -- div-safe: n >= {_WAV_N_BASE} (planted clip length)
         SUM(s * COS(2 * PI() * k * i / n)) AS re,
         SUM(s * SIN(2 * PI() * k * i / n)) AS im
  FROM samples, (SELECT unnest(generate_series(1, {_SPEC_BINS})) AS k) ks
  GROUP BY doc_id, rate, k, n
),
bins AS (
  SELECT doc_id, rate, k, ROUND(re * re + im * im, {_SPEC_ROUND}) AS p
  FROM sums
),
wide AS (
  SELECT doc_id, rate,
         MAX(CASE WHEN k = 1 THEN p END) AS p1,
         MAX(CASE WHEN k = 2 THEN p END) AS p2,
         MAX(CASE WHEN k = 3 THEN p END) AS p3
  FROM bins GROUP BY doc_id, rate
),
dom AS (
  SELECT doc_id, rate, p1, p2, p3,
         CASE WHEN p1 >= p2 AND p1 >= p3 THEN 1
              WHEN p2 >= p3 THEN 2 ELSE 3 END AS dominant_bin
  FROM wide
)
SELECT CAST(rate AS INTEGER) AS sample_rate,
       COUNT(*) AS n_clips,
       ROUND(AVG(p1), {_SPEC_ROUND}) AS avg_p1,
       ROUND(AVG(p2), {_SPEC_ROUND}) AS avg_p2,
       ROUND(AVG(p3), {_SPEC_ROUND}) AS avg_p3,
       CAST(SUM(CASE WHEN dominant_bin = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dom1,
       CAST(SUM(CASE WHEN dominant_bin = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dom2,
       CAST(SUM(CASE WHEN dominant_bin = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dom3
FROM dom
GROUP BY rate
ORDER BY sample_rate
"""


# --------------------------------------------------------------------------
# Audio near-dup fingerprinting via constellation/landmark hashing (r16):
# the Shazam scheme (Wang 2003, "An Industrial-Strength Audio Search
# Algorithm") — per-frame spectral peaks form a constellation; peak PAIRS
# within a small target zone become landmark hashes (f1, f2, dt); matching
# is an equi-join on the hash followed by time-offset voting. Completes
# the modality matrix: text has MinHash, images pHash — audio now has a
# transform-invariant near-dup detector (amplitude scaling and time
# shifting both preserve the landmarks).
# --------------------------------------------------------------------------

#: bounded planted corpus: audio clips for docs with doc_id < _CONST_DOCS
#: and doc_id % MOD == RES (40 base clips at any sf).
_CONST_DOCS, _CONST_MOD, _CONST_RES = 200, 5, 3
#: STFT framing: _CONST_BASE_FRAMES frames of _CONST_FLEN samples each.
_CONST_FLEN = 32
_CONST_BASE_FRAMES = 14
#: planted twin: drop the first _CONST_TWIN_DROP frames (time shift) and
#: scale every sample by _CONST_SCALE (loudness change) — the two
#: transforms a re-encoded copy of a clip typically carries. Twins are
#: re-keyed +_CONST_TWIN_OFF.
_CONST_TWIN_DROP = 2
_CONST_SCALE = 2
_CONST_TWIN_OFF = 1000000
#: DFT bins searched for the per-frame peak (1..15 of a 32-sample frame).
_CONST_BINS = 15
#: target zone: a peak pairs with the peaks of the next 1.._CONST_DT frames.
_CONST_DT = 3
#: rounding of frame-bin powers before the argmax (libm last-bit margin —
#: same analysis as _SPEC_ROUND above).
_CONST_ROUND = 2
#: verified match: at least this many landmarks aligned at ONE time offset.
_CONST_MIN_VOTES = 10


#: per-frame tone selection: an integer mix through a LARGE prime modulus
#: before the bin reduction, so no two docs under the corpus bound share a
#: tone sequence (a plain small-modulus mix would collide docs with equal
#: residues and collapse the corpus into one constellation — the r16
#: first-draft defect: every clip peaked at bin 1 and all twins "matched"
#: the lowest base id). Arithmetic mixes failed twice more (a linear-in-t
#: mix gives docs spaced Δ a TIME-SHIFTED identical sequence, and even a
#: quadratic mix collided two docs through the final small-modulus
#: reduction), so the tone comes from the repo's portable 60-bit md5 hash
#: — the same cross-engine-exact primitive every sketch here uses.
#: base amplitude; twins carry _CONST_SCALE × this (inside int16).
_CONST_AMP = 1000


def _const_frame_bin(src: int, t: int) -> int:
    """Tone bin (1..{bins}) of frame ``t`` of clip ``src`` — the 60-bit
    md5 arithmetic of ``operators.md5_long``, replayed verbatim by the
    DuckDB oracle via ``duck_md5_long``."""
    return 1 + (
        int(hashlib.md5(f"{src}|{t}".encode()).hexdigest()[:15], 16)
        % _CONST_BINS
    )


def _const_clip_samples(src: int, twin: bool):
    """int16 samples of a planted clip: each {flen}-sample frame is an
    integer SQUARE WAVE at the frame's tone bin (``+A`` where
    ``(j·f) % {flen} < {half}``, ``-A`` otherwise — zero-DC, fundamental
    at bin f, strongest harmonic 1/3 of it, so the per-frame DFT peak IS
    the tone). The twin drops the first {d} frames and doubles the
    amplitude — landmark-preserving transforms with exactly-integer
    samples (no trig anywhere near the encoder, so both engines rebuild
    identical sample values)."""
    import numpy as np

    drop = _CONST_TWIN_DROP if twin else 0
    amp = _CONST_AMP * (_CONST_SCALE if twin else 1)
    nf = _CONST_BASE_FRAMES - drop
    j = np.arange(_CONST_FLEN, dtype=np.int64)
    frames = []
    for t in range(drop, drop + nf):
        f = _const_frame_bin(src, t)
        frames.append(
            np.where((j * f) % _CONST_FLEN < _CONST_FLEN // 2, amp, -amp)
        )
    return np.concatenate(frames).astype("<i2")


_const_frame_bin.__doc__ = _const_frame_bin.__doc__.format(
    bins=_CONST_BINS
)
_const_clip_samples.__doc__ = _const_clip_samples.__doc__.format(
    d=_CONST_TWIN_DROP,
    flen=_CONST_FLEN,
    half=_CONST_FLEN // 2,
)


def _const_wav_bytes(samples) -> bytes:
    """Real 16-bit PCM mono WAV bytes at 8 kHz (same RIFF layout as
    :func:`_wav_encode`)."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16
    )
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def _const_peaks(clips: DataFrame) -> DataFrame:
    """``mapInArrow`` STFT-peak kernel: decode each WAV, split into
    {flen}-sample frames, compute the exact DFT power at bins
    k = 1..{bins} per frame with the same scalar ``math.cos/sin`` loop as
    :func:`wav_spectrum` (libm parity with the SQL replay), and emit the
    per-frame PEAK bin — argmax on the {rnd}-dp-rounded powers, smaller k
    on ties. One (clip, frame, peak) row per frame; samples never leave
    the kernel."""
    import math

    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(b.schema.get_field_index("clip_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            out_id, out_t, out_f = [], [], []
            for cid, v in zip(ids, blobs):
                _rate, s = decode_wav(v.as_py())
                nf = len(s) // _CONST_FLEN
                for t in range(nf):
                    base = t * _CONST_FLEN
                    best_k, best_p = 0, None
                    for k in range(1, _CONST_BINS + 1):
                        re = im = 0.0
                        for j in range(_CONST_FLEN):
                            # div-safe: _CONST_FLEN is a positive constant
                            th = 2 * math.pi * k * j / _CONST_FLEN
                            x = float(s[base + j])
                            re += x * math.cos(th)
                            im += x * math.sin(th)
                        p = _round_half_up_f(re * re + im * im,
                                             _CONST_ROUND)
                        if best_p is None or p > best_p:
                            best_k, best_p = k, p
                    out_id.append(cid.as_py())
                    out_t.append(t)
                    out_f.append(best_k)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_t, type=pa.int32()),
                    pa.array(out_f, type=pa.int32()),
                ],
                names=["clip_id", "t", "f"],
            )

    return clips.mapInArrow(fn, "clip_id bigint, t int, f int")


_const_peaks.__doc__ = _const_peaks.__doc__.format(
    flen=_CONST_FLEN, bins=_CONST_BINS, rnd=_CONST_ROUND
)


def audio_constellation_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AUDIO NEAR-DUP via constellation/landmark hashing (Wang 2003): for
    every planted clip, per-frame spectral peaks (the constellation) are
    paired with the peaks of the next 1..{dt} frames into landmark hashes
    ``(f1, f2, dt)``; twin clips (time-shifted by {drop} frames AND
    amplitude-scaled ×{scale} — both landmark-preserving transforms) are
    matched against the base corpus by an EQUI-JOIN on the hash, and each
    candidate pair is verified by time-offset voting: a real near-dup
    aligns many landmarks at ONE offset, chance collisions scatter. Per
    twin: the best-voted base clip, its vote count, the twin's landmark
    count, and whether the match is verified-correct (>= {mv} aligned
    votes AND the true source).

    Scale shape — the MinHash discipline on a new modality: candidates
    come ONLY from the landmark-hash equi-join (never clip×clip), votes
    are a groupBy on (twin, base, offset), and the verify is an aggregate
    over candidates. At 100 TB the landmark table is ~3 rows per frame of
    audio and the hash key widens with frame size (production: 10-bit
    f1/f2 + 12-bit dt), keeping bucket fan-out flat."""
    from pyspark.sql import Window

    from datafusion_impl_spark.operators import materialize

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(
            (F.col("doc_id") < _CONST_DOCS)
            & (F.col("doc_id") % _CONST_MOD == _CONST_RES)
        )
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                src = int(d)
                rows.append(
                    (src, _const_wav_bytes(_const_clip_samples(src, False)))
                )
                rows.append(
                    (
                        src + _CONST_TWIN_OFF,
                        _const_wav_bytes(_const_clip_samples(src, True)),
                    )
                )
            yield pd.DataFrame(rows, columns=["clip_id", "media"])

    clips = docs.mapInPandas(build, "clip_id bigint, media binary")
    peaks = materialize(_const_peaks(clips))
    dts = spark.range(1, _CONST_DT + 1).select(
        F.col("id").cast("int").alias("dt")
    )
    a = peaks.select("clip_id", "t", F.col("f").alias("f1"))
    b = peaks.select(
        "clip_id", F.col("t").alias("t2"), F.col("f").alias("f2")
    )
    lms = (
        a.crossJoin(F.broadcast(dts))
        .join(b, ["clip_id"])
        .filter(F.col("t2") == F.col("t") + F.col("dt"))
        .select(
            "clip_id",
            "t",
            (
                (F.col("f1") * (_CONST_BINS + 1) + F.col("f2"))
                * (_CONST_DT + 1)
                + F.col("dt")
            ).alias("h"),
        )
    )
    lms = materialize(lms)
    tw = lms.filter(F.col("clip_id") >= _CONST_TWIN_OFF).select(
        F.col("clip_id").alias("twin_doc"),
        F.col("t").alias("tt"),
        "h",
    )
    ba = lms.filter(F.col("clip_id") < _CONST_TWIN_OFF).select(
        F.col("clip_id").alias("base_id"),
        F.col("t").alias("tb"),
        "h",
    )
    votes = (
        tw.join(ba, "h")
        .select(
            "twin_doc", "base_id", (F.col("tb") - F.col("tt")).alias("off")
        )
        .groupBy("twin_doc", "base_id", "off")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    pair = votes.groupBy("twin_doc", "base_id").agg(
        F.max("v").alias("votes")
    )
    wbest = Window.partitionBy("twin_doc").orderBy(
        F.desc("votes"), F.asc("base_id")
    )
    best = (
        pair.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    nlm = lms.groupBy("clip_id").agg(F.count(F.lit(1)).alias("n_landmarks"))
    return (
        best.join(
            nlm.withColumnRenamed("clip_id", "twin_doc"), "twin_doc"
        )
        .select(
            "twin_doc",
            F.col("base_id").alias("matched_doc"),
            F.col("votes").cast("long").alias("votes"),
            F.col("n_landmarks").cast("long").alias("n_landmarks"),
            (
                (F.col("votes") >= _CONST_MIN_VOTES)
                & (F.col("base_id") == F.col("twin_doc") - _CONST_TWIN_OFF)
            ).cast("int").alias("verified_correct"),
        )
        .orderBy("twin_doc")
    )


audio_constellation_near_dup.__doc__ = (
    audio_constellation_near_dup.__doc__.format(
        dt=_CONST_DT,
        drop=_CONST_TWIN_DROP,
        scale=_CONST_SCALE,
        mv=_CONST_MIN_VOTES,
    )
)

# Oracle: replay the plant arithmetic — samples from the shared formula,
# per-frame DFT with SQL COS/SIN (libm parity at 2 dp), rounded-argmax
# peaks, landmark pairing, hash join, offset voting — the full pipeline
# value-checked end to end.
_CONSTELLATION_SQL = f"""
WITH docs AS (
  SELECT doc_id AS src FROM documents
  WHERE doc_id < {_CONST_DOCS} AND doc_id % {_CONST_MOD} = {_CONST_RES}
),
clips AS (
  SELECT src AS clip_id, src,
         {_CONST_BASE_FRAMES * _CONST_FLEN} AS n, 0 AS tdrop,
         {_CONST_AMP} AS amp
  FROM docs
  UNION ALL
  SELECT src + {_CONST_TWIN_OFF}, src,
         {(_CONST_BASE_FRAMES - _CONST_TWIN_DROP) * _CONST_FLEN},
         {_CONST_TWIN_DROP}, {_CONST_AMP * _CONST_SCALE}
  FROM docs
),
fbins AS (
  SELECT c.clip_id, c.amp, c.n, tf.tt,
         1 + {duck_md5_long(
             "CAST(c.src AS VARCHAR) || '|' || CAST(tf.tt AS VARCHAR)"
         )} % {_CONST_BINS} AS f
  FROM clips c
  JOIN (SELECT unnest(generate_series(0,
         {_CONST_BASE_FRAMES - 1})) AS tt) tf
    ON tf.tt >= c.tdrop AND tf.tt < c.tdrop + c.n // {_CONST_FLEN}
),
samples AS (
  SELECT fb.clip_id,
         (fb.tt - c.tdrop) * {_CONST_FLEN} + gj.j AS i,
         CASE WHEN (gj.j * fb.f) % {_CONST_FLEN} < {_CONST_FLEN // 2}
              THEN fb.amp ELSE -fb.amp END AS s
  FROM fbins fb
  JOIN clips c ON c.clip_id = fb.clip_id
  JOIN (SELECT unnest(generate_series(0, {_CONST_FLEN - 1})) AS j) gj
    ON true
),
sums AS (
  SELECT clip_id, i // {_CONST_FLEN} AS t, k,
         SUM(s * COS(2 * PI() * k * (i % {_CONST_FLEN}) / {_CONST_FLEN}))
           AS re,
         SUM(s * SIN(2 * PI() * k * (i % {_CONST_FLEN}) / {_CONST_FLEN}))
           AS im
  FROM samples,
       (SELECT unnest(generate_series(1, {_CONST_BINS})) AS k) ks
  GROUP BY clip_id, i // {_CONST_FLEN}, k
),
pw AS (
  SELECT clip_id, t, k, ROUND(re * re + im * im, {_CONST_ROUND}) AS p
  FROM sums
),
peaks AS (
  SELECT clip_id, t, k AS f FROM (
    SELECT clip_id, t, k,
           ROW_NUMBER() OVER (PARTITION BY clip_id, t
                              ORDER BY p DESC, k) AS rn
    FROM pw
  ) WHERE rn = 1
),
lms AS (
  SELECT a.clip_id, a.t,
         (a.f * {_CONST_BINS + 1} + b.f) * {_CONST_DT + 1} + d.dt AS h
  FROM peaks a
  JOIN (SELECT unnest(generate_series(1, {_CONST_DT})) AS dt) d ON true
  JOIN peaks b ON b.clip_id = a.clip_id AND b.t = a.t + d.dt
),
votes AS (
  SELECT tw.clip_id AS twin_doc, ba.clip_id AS base_id,
         ba.t - tw.t AS off, COUNT(*) AS v
  FROM lms tw JOIN lms ba ON ba.h = tw.h
  WHERE tw.clip_id >= {_CONST_TWIN_OFF}
    AND ba.clip_id < {_CONST_TWIN_OFF}
  GROUP BY tw.clip_id, ba.clip_id, ba.t - tw.t
),
pair AS (
  SELECT twin_doc, base_id, MAX(v) AS votes
  FROM votes GROUP BY twin_doc, base_id
),
best AS (
  SELECT twin_doc, base_id, votes FROM (
    SELECT twin_doc, base_id, votes,
           ROW_NUMBER() OVER (PARTITION BY twin_doc
                              ORDER BY votes DESC, base_id) AS rn
    FROM pair
  ) WHERE rn = 1
),
nlm AS (SELECT clip_id, COUNT(*) AS n FROM lms GROUP BY clip_id)
SELECT b.twin_doc,
       b.base_id AS matched_doc,
       CAST(b.votes AS BIGINT) AS votes,
       CAST(nlm.n AS BIGINT) AS n_landmarks,
       CAST(CASE WHEN b.votes >= {_CONST_MIN_VOTES}
                  AND b.base_id = b.twin_doc - {_CONST_TWIN_OFF}
                 THEN 1 ELSE 0 END AS INTEGER) AS verified_correct
FROM best b JOIN nlm ON nlm.clip_id = b.twin_doc
ORDER BY twin_doc
"""


# --------------------------------------------------------------------------
# Video near-dup via frame-gradient fingerprints + temporal voting (r16):
# completes the near-dup modality matrix (text MinHash, image pHash, audio
# constellation — now video). Per frame: a brightness-INVARIANT spatial
# fingerprint (the sign pattern of adjacent block-mean differences — a
# uniform luma shift cancels in every difference); per clip pair: an
# equi-join on the fingerprint plus time-offset voting, so a re-encoded
# copy (frames dropped, brightness shifted) aligns its whole tail at one
# offset while chance fingerprint collisions scatter. Unlike the audio
# constellation, frames need no landmark PAIRING: a 47-bit spatial
# fingerprint is already selective, the temporal vote supplies the rest.
# --------------------------------------------------------------------------

#: bounded planted corpus: video for docs with doc_id < _VID_DOCS and
#: doc_id % MOD == RES (40 base clips at any sf).
_VID_DOCS, _VID_MOD, _VID_RES = 200, 5, 4
#: geometry: W×H luma, BLK×BLK constant-valued blocks, FRAMES per clip.
_VID_W, _VID_H, _VID_BLK = 16, 12, 2
_VID_FRAMES = 16
#: twin transform: drop the first _VID_DROP frames + add _VID_SHIFT to
#: every luma sample (block values stay < 256 — no wrap).
_VID_DROP = 3
_VID_SHIFT = 25
_VID_TWIN_OFF = 1000000
#: block values (md5-derived, 0..199) leave headroom for the shift.
_VID_BV_MOD = 200
#: verified match: aligned frame votes at one offset.
_VID_MIN_VOTES = 8


def _vid_block_value(src: int, f: int, bx: int, by: int) -> int:
    """Luma of the (bx, by) block of frame ``f`` of clip ``src`` — the
    portable 60-bit md5 arithmetic, replayed verbatim by the oracle."""
    return (
        int(
            hashlib.md5(f"{src}|{f}|{bx}|{by}".encode()).hexdigest()[:15],
            16,
        )
        % _VID_BV_MOD
    )


def _vid_y4m_bytes(src: int, twin: bool) -> bytes:
    """Real YUV4MPEG2 bytes: {w}x{h} C420 clips whose luma is constant
    within each {b}x{b} block (the md5 block value; twins add
    +{s} everywhere and start {d} frames in), chroma flat 128."""
    import numpy as np

    drop = _VID_DROP if twin else 0
    shift = _VID_SHIFT if twin else 0
    nbx, nby = _VID_W // _VID_BLK, _VID_H // _VID_BLK
    out = [
        f"YUV4MPEG2 W{_VID_W} H{_VID_H} F25:1 Ip A1:1 C420\n".encode()
    ]
    cpx = (_VID_W // 2) * (_VID_H // 2)
    for f in range(drop, _VID_FRAMES):
        y = np.empty((_VID_H, _VID_W), dtype=np.uint8)
        for by in range(nby):
            for bx in range(nbx):
                y[
                    by * _VID_BLK:(by + 1) * _VID_BLK,
                    bx * _VID_BLK:(bx + 1) * _VID_BLK,
                ] = _vid_block_value(src, f, bx, by) + shift
        out.append(b"FRAME\n")
        out.append(y.tobytes())
        out.append(bytes([128]) * cpx * 2)
    return b"".join(out)


_vid_y4m_bytes.__doc__ = _vid_y4m_bytes.__doc__.format(
    w=_VID_W, h=_VID_H, b=_VID_BLK, s=_VID_SHIFT, d=_VID_DROP
)


def _vid_fingerprints(clips: DataFrame) -> DataFrame:
    """``mapInArrow`` kernel: decode each Y4M with the shared parser and
    emit one fingerprint row per frame — bit i set iff block-mean i+1 >
    block-mean i in raster order (brightness-shift invariant; exact
    integer block means, so both engines agree bit-for-bit)."""
    import numpy as np
    import pyarrow as pa

    nbx, nby = _VID_W // _VID_BLK, _VID_H // _VID_BLK

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(b.schema.get_field_index("clip_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            out_id, out_t, out_fp = [], [], []
            for cid, v in zip(ids, blobs):
                w, h, frames = decode_y4m(v.as_py())
                if (w, h) != (_VID_W, _VID_H):
                    raise ValueError("unexpected planted geometry")
                for t, fr in enumerate(frames):
                    y = np.asarray(fr[0], dtype=np.int64).reshape(h, w)
                    means = (
                        y.reshape(nby, _VID_BLK, nbx, _VID_BLK)
                        .sum(axis=(1, 3)) // (_VID_BLK * _VID_BLK)
                    ).reshape(-1)
                    fp = 0
                    for i in range(len(means) - 1):
                        if means[i + 1] > means[i]:
                            fp |= 1 << i
                    out_id.append(cid.as_py())
                    out_t.append(t)
                    out_fp.append(fp)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_t, type=pa.int32()),
                    pa.array(out_fp, type=pa.int64()),
                ],
                names=["clip_id", "t", "fp"],
            )

    return clips.mapInArrow(fn, "clip_id bigint, t int, fp bigint")


def video_fingerprint_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VIDEO NEAR-DUP via per-frame gradient fingerprints + temporal
    offset voting: decode every planted clip, fingerprint each frame
    with the sign pattern of adjacent block-mean differences (invariant
    to the uniform brightness shift a re-encode applies), equi-join twin
    frames against base frames on the fingerprint, and vote on the time
    offset — a true copy (first {d} frames dropped, +{s} luma) aligns
    all {m} surviving frames at one offset. Per twin: best-voted base,
    votes, frame count, verified-correct flag ({mv}+ aligned votes AND
    the true source).

    Scale shape: same discipline as MinHash/pHash/constellation —
    candidates ONLY from the fingerprint equi-join (never clip×clip),
    votes one groupBy, verdicts one aggregate; frames never shuffle (the
    fingerprint leaves the decode kernel at 1 row per frame)."""
    from pyspark.sql import Window

    from datafusion_impl_spark.operators import materialize

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(
            (F.col("doc_id") < _VID_DOCS)
            & (F.col("doc_id") % _VID_MOD == _VID_RES)
        )
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                src = int(d)
                rows.append((src, _vid_y4m_bytes(src, False)))
                rows.append(
                    (src + _VID_TWIN_OFF, _vid_y4m_bytes(src, True))
                )
            yield pd.DataFrame(rows, columns=["clip_id", "media"])

    clips = docs.mapInPandas(build, "clip_id bigint, media binary")
    fps = materialize(_vid_fingerprints(clips))
    tw = fps.filter(F.col("clip_id") >= _VID_TWIN_OFF).select(
        F.col("clip_id").alias("twin_doc"),
        F.col("t").alias("tt"),
        "fp",
    )
    ba = fps.filter(F.col("clip_id") < _VID_TWIN_OFF).select(
        F.col("clip_id").alias("base_id"),
        F.col("t").alias("tb"),
        "fp",
    )
    votes = (
        tw.join(ba, "fp")
        .select(
            "twin_doc", "base_id", (F.col("tb") - F.col("tt")).alias("off")
        )
        .groupBy("twin_doc", "base_id", "off")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    pair = votes.groupBy("twin_doc", "base_id").agg(
        F.max("v").alias("votes")
    )
    wbest = Window.partitionBy("twin_doc").orderBy(
        F.desc("votes"), F.asc("base_id")
    )
    best = (
        pair.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    nfr = fps.groupBy("clip_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return (
        best.join(
            nfr.withColumnRenamed("clip_id", "twin_doc"), "twin_doc"
        )
        .select(
            "twin_doc",
            F.col("base_id").alias("matched_doc"),
            F.col("votes").cast("long").alias("votes"),
            F.col("n_frames").cast("long").alias("n_frames"),
            (
                (F.col("votes") >= _VID_MIN_VOTES)
                & (F.col("base_id") == F.col("twin_doc") - _VID_TWIN_OFF)
            ).cast("int").alias("verified_correct"),
        )
        .orderBy("twin_doc")
    )


video_fingerprint_near_dup.__doc__ = video_fingerprint_near_dup.__doc__.format(
    d=_VID_DROP,
    s=_VID_SHIFT,
    m=_VID_FRAMES - _VID_DROP,
    mv=_VID_MIN_VOTES,
)

_VID_NBLK = (_VID_W // _VID_BLK) * (_VID_H // _VID_BLK)

# Oracle: block values from the shared md5 arithmetic, fingerprints as
# SUM(2^i) over the same sign pattern, then the identical voting SQL.
_VIDEO_NEAR_DUP_SQL = f"""
WITH docs AS (
  SELECT doc_id AS src FROM documents
  WHERE doc_id < {_VID_DOCS} AND doc_id % {_VID_MOD} = {_VID_RES}
),
clips AS (
  SELECT src AS clip_id, src, 0 AS fdrop FROM docs
  UNION ALL
  SELECT src + {_VID_TWIN_OFF}, src, {_VID_DROP} FROM docs
),
blocks AS (
  SELECT c.clip_id, gf.f - c.fdrop AS t, gb.b,
         {duck_md5_long(
             "CAST(c.src AS VARCHAR) || '|' || CAST(gf.f AS VARCHAR)"
             " || '|' || CAST(gb.b % " + str(_VID_W // _VID_BLK)
             + " AS VARCHAR) || '|' || CAST(gb.b // "
             + str(_VID_W // _VID_BLK) + " AS VARCHAR)"
         )} % {_VID_BV_MOD} AS bv
  FROM clips c
  JOIN (SELECT unnest(generate_series(0, {_VID_FRAMES - 1})) AS f) gf
    ON gf.f >= c.fdrop
  JOIN (SELECT unnest(generate_series(0, {_VID_NBLK - 1})) AS b) gb
    ON true
),
fps AS (
  SELECT a.clip_id, a.t,
         CAST(SUM(CASE WHEN b.bv > a.bv
                       THEN CAST(POW(2, a.b) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS fp
  FROM blocks a
  JOIN blocks b ON b.clip_id = a.clip_id AND b.t = a.t
               AND b.b = a.b + 1
  GROUP BY a.clip_id, a.t
),
votes AS (
  SELECT tw.clip_id AS twin_doc, ba.clip_id AS base_id,
         ba.t - tw.t AS off, COUNT(*) AS v
  FROM fps tw JOIN fps ba ON ba.fp = tw.fp
  WHERE tw.clip_id >= {_VID_TWIN_OFF} AND ba.clip_id < {_VID_TWIN_OFF}
  GROUP BY tw.clip_id, ba.clip_id, ba.t - tw.t
),
pair AS (
  SELECT twin_doc, base_id, MAX(v) AS votes
  FROM votes GROUP BY twin_doc, base_id
),
best AS (
  SELECT twin_doc, base_id, votes FROM (
    SELECT twin_doc, base_id, votes,
           ROW_NUMBER() OVER (PARTITION BY twin_doc
                              ORDER BY votes DESC, base_id) AS rn
    FROM pair
  ) WHERE rn = 1
),
nfr AS (SELECT clip_id, COUNT(DISTINCT t) AS n FROM blocks GROUP BY clip_id)
SELECT b.twin_doc,
       b.base_id AS matched_doc,
       CAST(b.votes AS BIGINT) AS votes,
       CAST(nfr.n AS BIGINT) AS n_frames,
       CAST(CASE WHEN b.votes >= {_VID_MIN_VOTES}
                  AND b.base_id = b.twin_doc - {_VID_TWIN_OFF}
                 THEN 1 ELSE 0 END AS INTEGER) AS verified_correct
FROM best b JOIN nfr ON nfr.clip_id = b.twin_doc
ORDER BY twin_doc
"""


# --------------------------------------------------------------------------
# Mel filterbank energies (the audio-feature step after the raw spectrum)
# --------------------------------------------------------------------------

#: DFT bins feeding the filterbank (k = 1..6 cycles over the clip length —
#: well under Nyquist for the >= 48-sample planted clips).
_MEL_BINS = 6
#: triangular mel filters.
_MEL_FILTERS = 3
#: log-mel rounding (values are ~log10(1e10) ≈ 10; 4 dp leaves ~9 orders of
#: margin over last-bit libm drift).
_MEL_ROUND = 4
#: Cross-row aggregation of the rounded per-clip log-mels is done as an
#: EXACT DECIMAL sum (cast each 4-dp multiple to DECIMAL(16,4), SUM, cast
#: the identical decimal to DOUBLE — no re-ROUND step). Re-rounding an
#: average of k-dp multiples is the boundary landmine this repo hit twice
#: in r13: the true mean can sit EXACTLY on a half-boundary (observed:
#: rate-24000 filter-2 mean landed 1.5e-11 from x.xxxx5, flipping with
#: partial-agg sum order), where engine ROUNDs disagree.


def _mel_weights() -> list[list[float]]:
    """Triangular filterbank weights ``w[m][k]`` computed ONCE at module
    import in plain Python and injected into BOTH engines as 6-dp literals —
    the mel transcendentals (``2595·log10(1+f/700)``) never run inside
    either engine, so there is no cross-engine libm surface in the weights.

    Bin k stands for the k-th harmonic of the fixed-length analysis frame
    (mapped to a nominal ``k·1000 Hz`` axis); real pipelines use fixed
    frame lengths, which makes the bin→Hz map a constant exactly like
    this."""
    import math

    def mel(f: float) -> float:
        return 2595.0 * math.log10(1.0 + f / 700.0)

    lo, hi = mel(1000.0), mel(_MEL_BINS * 1000.0)
    edges = [lo + (hi - lo) * j / (_MEL_FILTERS + 1) for j in range(_MEL_FILTERS + 2)]
    w = []
    for m in range(_MEL_FILTERS):
        e0, e1, e2 = edges[m], edges[m + 1], edges[m + 2]
        row = []
        for k in range(1, _MEL_BINS + 1):
            mk = mel(k * 1000.0)
            if e0 < mk <= e1:
                # div-safe: edges are strictly increasing (mel is monotone
                # and lo < hi), so e1 - e0 > 0
                v = (mk - e0) / (e1 - e0)
            elif e1 < mk < e2:
                # div-safe: strictly increasing edges, e2 - e1 > 0
                v = (e2 - mk) / (e2 - e1)
            else:
                v = 0.0
            row.append(_round_half_up_f(v, 6))
        w.append(row)
    return w


def wav_spectrum_bins(clips: DataFrame, n_bins: int) -> DataFrame:
    """``mapInArrow`` DFT kernel, the :func:`wav_spectrum` transform
    generalized to ``n_bins`` bins: per clip, decode and emit the rounded
    DFT powers ``p1..p{n_bins}`` (same scalar ``math.cos/sin`` loop — the
    libm path the SQL replay takes)."""
    import math

    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            rates: list[int] = []
            powers: list[list[float]] = [[] for _ in range(n_bins)]
            for v in blobs:
                rate, s = decode_wav(v.as_py())
                n = len(s)
                rates.append(rate)
                for k in range(1, n_bins + 1):
                    re = im = 0.0
                    for i in range(n):
                        # div-safe: decode_wav yields >= 1 sample here (the
                        # loop body only runs when n >= 1)
                        th = 2 * math.pi * k * i / n
                        re += float(s[i]) * math.cos(th)
                        im += float(s[i]) * math.sin(th)
                    powers[k - 1].append(
                        _round_half_up_f(re * re + im * im, _SPEC_ROUND)
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(rates, type=pa.int32()),
                    *[pa.array(powers[j], type=pa.float64())
                      for j in range(n_bins)],
                ],
                names=["doc_id", "sample_rate",
                       *[f"p{k}" for k in range(1, n_bins + 1)]],
            )

    schema = (
        "doc_id bigint, sample_rate int, "
        + ", ".join(f"p{k} double" for k in range(1, n_bins + 1))
    )
    return clips.mapInArrow(fn, schema)


def audio_mel_filterbank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mel-filterbank feature extraction — the canonical audio featurizer
    (the front half of MFCC) a speech-data curation pipeline runs after the
    raw spectrum: per planted clip, {f} triangular mel filters pool the
    first {b} DFT bin powers into log-energies
    ``log10(Σ_k w_mk·p_k + 1)``, and per sample rate the report gives the
    clip count, exact decimal-summed log-mel energies, and how many clips each filter
    dominates. The DuckDB oracle recomputes the DFT from the planted sample
    FORMULA and applies the SAME 6-dp literal weights, so decode, transform,
    and filterbank are all value-checked.

    Cross-engine determinism: bin powers are rounded to {sr} dp inside the
    kernel (libm trig margin), the weighted pool is the same left-to-right
    chain of literal·power products in both engines (IEEE754-identical),
    and the log-mel is rounded to {r} dp before the argmax/mean.

    Scale shape: the O(N·K) transform runs inside the map-only decode
    kernel; the filterbank is a JVM-side codegen projection over the
    kernel's {b} bin columns; the aggregate is 3 rows."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _wav_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _WAV_SAMPLE_MOD == _WAV_SAMPLE_RES)
    )
    clips = docs.mapInPandas(build, "doc_id bigint, media binary")
    spec = wav_spectrum_bins(clips, _MEL_BINS)
    w = _mel_weights()
    mel_cols = []
    for m in range(_MEL_FILTERS):
        e = F.lit(w[m][0]) * F.col("p1")
        for k in range(2, _MEL_BINS + 1):
            e = e + F.lit(w[m][k - 1]) * F.col(f"p{k}")
        mel_cols.append(
            F.round(F.log10(e + F.lit(1.0)), _MEL_ROUND).alias(f"m{m + 1}")
        )
    feats = spec.select("doc_id", "sample_rate", *mel_cols)
    dom = F.when(
        (F.col("m1") >= F.col("m2")) & (F.col("m1") >= F.col("m3")), F.lit(1)
    ).when(F.col("m2") >= F.col("m3"), F.lit(2)).otherwise(F.lit(3))
    feats = feats.withColumn("dominant_filter", dom)
    return (
        feats.groupBy("sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            *[
                F.sum(F.col(f"m{m}").cast("decimal(16,4)"))
                .cast("double")
                .alias(f"sum_m{m}")
                for m in range(1, _MEL_FILTERS + 1)
            ],
            *[
                F.sum((F.col("dominant_filter") == m).cast("long")).alias(
                    f"n_dom{m}"
                )
                for m in range(1, _MEL_FILTERS + 1)
            ],
        )
        .orderBy("sample_rate")
    )


audio_mel_filterbank_stats.__doc__ = audio_mel_filterbank_stats.__doc__.format(
    f=_MEL_FILTERS, b=_MEL_BINS, sr=_SPEC_ROUND, r=_MEL_ROUND
)


def _mel_sql() -> str:
    w = _mel_weights()
    mel_exprs = ",\n         ".join(
        "ROUND(LOG10("
        + " + ".join(f"{w[m][k - 1]!r} * p{k}" for k in range(1, _MEL_BINS + 1))
        + f" + 1.0), {_MEL_ROUND}) AS m{m + 1}"
        for m in range(_MEL_FILTERS)
    )
    p_cols = ",\n         ".join(
        f"MAX(CASE WHEN k = {k} THEN p END) AS p{k}"
        for k in range(1, _MEL_BINS + 1)
    )
    return f"""
WITH docs AS (
  SELECT doc_id,
         {_WAV_RATE_BASE} * (1 + doc_id % {_WAV_RATE_MOD}) AS rate,
         {_WAV_N_BASE} + doc_id % {_WAV_N_MOD} AS n
  FROM documents
  WHERE doc_id % {_WAV_SAMPLE_MOD} = {_WAV_SAMPLE_RES}
),
samples AS (
  SELECT d.doc_id, d.rate, d.n, gi.i,
         (d.doc_id * 31 + gi.i * 17) % 4001 - 2000 AS s
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_WAV_N_BASE + _WAV_N_MOD - 2})) AS i) gi
    ON gi.i < d.n
),
sums AS (
  SELECT doc_id, rate, k,
         -- div-safe: n >= {_WAV_N_BASE} (planted clip length)
         SUM(s * COS(2 * PI() * k * i / n)) AS re,
         SUM(s * SIN(2 * PI() * k * i / n)) AS im
  FROM samples, (SELECT unnest(generate_series(1, {_MEL_BINS})) AS k) ks
  GROUP BY doc_id, rate, k, n
),
bins AS (
  SELECT doc_id, rate, k, ROUND(re * re + im * im, {_SPEC_ROUND}) AS p
  FROM sums
),
wide AS (
  SELECT doc_id, rate,
         {p_cols}
  FROM bins GROUP BY doc_id, rate
),
mels AS (
  SELECT doc_id, rate,
         {mel_exprs}
  FROM wide
),
dom AS (
  SELECT doc_id, rate, m1, m2, m3,
         CASE WHEN m1 >= m2 AND m1 >= m3 THEN 1
              WHEN m2 >= m3 THEN 2 ELSE 3 END AS dominant_filter
  FROM mels
)
SELECT CAST(rate AS INTEGER) AS sample_rate,
       COUNT(*) AS n_clips,
       CAST(SUM(CAST(m1 AS DECIMAL(16,4))) AS DOUBLE) AS sum_m1,
       CAST(SUM(CAST(m2 AS DECIMAL(16,4))) AS DOUBLE) AS sum_m2,
       CAST(SUM(CAST(m3 AS DECIMAL(16,4))) AS DOUBLE) AS sum_m3,
       CAST(SUM(CASE WHEN dominant_filter = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dom1,
       CAST(SUM(CASE WHEN dominant_filter = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dom2,
       CAST(SUM(CASE WHEN dominant_filter = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dom3
FROM dom
GROUP BY rate
ORDER BY sample_rate
"""


# --------------------------------------------------------------------------
# Audio resampling (rate normalization before feature extraction)
# --------------------------------------------------------------------------

#: every clip is resampled to this rate (speech pipelines normalize to one
#: rate — usually 16 kHz — before featurization; the planted corpus mixes
#: 8/16/24 kHz, so the operator exercises up-, identity- and down-sampling).
_RESAMPLE_RATE = 16000
#: per-clip resampled-signal stats rounding (values <= 2000; the only
#: cross-engine noise is ~100-term sum ordering, ~1e-11 absolute).
_RESAMPLE_ROUND = 4


def audio_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio RATE NORMALIZATION end to end — the step between decode and
    featurization that makes a mixed-rate corpus usable: decode each
    planted WAV, linear-interpolation resample it to {rate} Hz inside the
    map-only kernel (output length ``(n−1)·R // r + 1``; sample ``j`` reads
    position ``j·r/R`` as ``s[i] + (s[i+1] − s[i])·frac``), and report per
    source rate: clip count, total output samples, and the exact decimal
    sums of per-clip mean amplitude and energy. The DuckDB oracle re-derives every output sample
    from the planted sample FORMULA with the same interpolation arithmetic,
    so the decoder AND the resampler's index/fraction math are
    value-checked.

    Determinism: positions and fractions are single IEEE divisions of
    exact integers (bit-identical cross-engine); the output length uses
    INTEGER division in both engines; per-clip means round at {r} dp (the
    sum-order margin is ~1e-11 on these magnitudes).

    Scale shape: decode + resample run inside the scan-stage kernel (blobs
    and samples never shuffle); the aggregate is 3 rate groups."""
    import pyarrow as pa

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _wav_encode(int(d))),
                }
            )

    def resample(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import math

        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            rates, ms, amps, eners = [], [], [], []
            for v in blobs:
                rate, s = decode_wav(v.as_py())
                n = len(s)
                m = (n - 1) * _RESAMPLE_RATE // rate + 1
                amp = ener = 0.0
                for j in range(m):
                    # div-safe: _RESAMPLE_RATE is a positive constant
                    pos = j * rate / float(_RESAMPLE_RATE)
                    i = int(math.floor(pos))
                    frac = pos - math.floor(pos)
                    i2 = min(i + 1, n - 1)
                    val = float(s[i]) + (float(s[i2]) - float(s[i])) * frac
                    amp += val
                    ener += val * val
                rates.append(rate)
                ms.append(m)
                # div-safe: m = (n-1)*R//r + 1 >= 1
                amps.append(_round_half_up_f(amp / m, _RESAMPLE_ROUND))
                eners.append(_round_half_up_f(ener / m, _RESAMPLE_ROUND))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(rates, type=pa.int32()),
                    pa.array(ms, type=pa.int32()),
                    pa.array(amps, type=pa.float64()),
                    pa.array(eners, type=pa.float64()),
                ],
                names=["doc_id", "sample_rate", "n_out", "mean_amp",
                       "mean_energy"],
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _WAV_SAMPLE_MOD == _WAV_SAMPLE_RES)
    )
    clips = docs.mapInPandas(build, "doc_id bigint, media binary")
    out = clips.mapInArrow(
        resample,
        "doc_id bigint, sample_rate int, n_out int, mean_amp double, "
        "mean_energy double",
    )
    return (
        out.groupBy("sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_out").cast("long").alias("total_out_samples"),
            # exact DECIMAL sums of the 4-dp per-clip means (see the mel
            # filterbank note: re-rounded averages of k-dp multiples can
            # sit exactly on half-boundaries)
            F.sum(F.col("mean_amp").cast("decimal(16,4)"))
            .cast("double")
            .alias("sum_amp"),
            F.sum(F.col("mean_energy").cast("decimal(20,4)"))
            .cast("double")
            .alias("sum_energy"),
        )
        .orderBy("sample_rate")
    )


audio_resample_linear.__doc__ = audio_resample_linear.__doc__.format(
    rate=_RESAMPLE_RATE, r=_RESAMPLE_ROUND
)

#: max planted clip length and max resampled length (for the oracle grid).
_RS_MAX_N = _WAV_N_BASE + _WAV_N_MOD - 1
_RS_MAX_M = (_RS_MAX_N - 1) * _RESAMPLE_RATE // _WAV_RATE_BASE + 1

_RESAMPLE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_WAV_RATE_BASE} * (1 + doc_id % {_WAV_RATE_MOD}) AS rate,
         {_WAV_N_BASE} + doc_id % {_WAV_N_MOD} AS n
  FROM documents
  WHERE doc_id % {_WAV_SAMPLE_MOD} = {_WAV_SAMPLE_RES}
),
lens AS (
  SELECT doc_id, rate, n,
         (n - 1) * {_RESAMPLE_RATE} // rate + 1 AS m
  FROM docs
),
outpos AS (
  SELECT d.doc_id, d.rate, d.n, d.m, gj.j,
         -- div-safe: the resample target rate is a positive constant
         gj.j * d.rate / CAST({_RESAMPLE_RATE} AS DOUBLE) AS pos
  FROM lens d
  JOIN (SELECT unnest(generate_series(0, {_RS_MAX_M - 1})) AS j) gj
    ON gj.j < d.m
),
vals AS (
  SELECT doc_id, rate, m,
         (doc_id * 31 + CAST(FLOOR(pos) AS BIGINT) * 17) % 4001 - 2000
           + (((doc_id * 31
                + LEAST(CAST(FLOOR(pos) AS BIGINT) + 1, n - 1) * 17) % 4001
               - 2000)
              - ((doc_id * 31 + CAST(FLOOR(pos) AS BIGINT) * 17) % 4001
                 - 2000)) * (pos - FLOOR(pos)) AS val
  FROM outpos
),
per_clip AS (
  SELECT doc_id, rate, m,
         -- div-safe: m = (n-1)*R//r + 1 >= 1
         ROUND(SUM(val) / m, {_RESAMPLE_ROUND}) AS mean_amp,
         ROUND(SUM(val * val) / m, {_RESAMPLE_ROUND}) AS mean_energy
  FROM vals GROUP BY doc_id, rate, m
)
SELECT CAST(rate AS INTEGER) AS sample_rate,
       COUNT(*) AS n_clips,
       CAST(SUM(m) AS BIGINT) AS total_out_samples,
       CAST(SUM(CAST(mean_amp AS DECIMAL(16,4))) AS DOUBLE) AS sum_amp,
       CAST(SUM(CAST(mean_energy AS DECIMAL(20,4))) AS DOUBLE) AS sum_energy
FROM per_clip
GROUP BY rate
ORDER BY sample_rate
"""


# --------------------------------------------------------------------------
# Energy-based voice-activity detection + speech-segment census (r13
# verdict #4: the audio-curation gate every speech pipeline runs before
# transcription — Sohn-style energy VAD simplified to the frame-energy
# threshold core, then gaps-and-islands segment merging)
# --------------------------------------------------------------------------

#: samples per VAD analysis frame (10 ms at 8 kHz).
_VAD_FRAME = 80
#: frames per planted clip: 6 + doc_id % 7 (so clips span 6..12 frames and
#: the island structure varies per clip).
_VAD_FRAMES_BASE, _VAD_FRAMES_MOD = 6, 7
#: per-frame speech gate: frame f of doc d is SPEECH iff
#: (d*7 + f*13) % 5 < 3 (13 ≡ 3 is invertible mod 5, so every 5
#: consecutive frames hit all residues — every clip has both classes).
_VAD_SPEECH_LT = 3
#: voiced decision: integer frame energy (sum of squared samples) above
#: this. Planted margins are wide — speech frames measure >= ~12.3e6
#: (arithmetic progression of step 17 spanning ±2000), silence frames
#: (amplitudes ±20) at most 80*400 = 32_000.
_VAD_THRESH_SUMSQ = 800_000


def _vad_samples(doc_id: int):
    """Deterministic int16 samples for the planted VAD clip — the formula
    the DuckDB oracle replays in SQL: frame f speech-gated as above;
    speech samples ride the ±2000 ramp ``(d*31 + i*17) % 4001 - 2000``,
    silence samples the ±20 ramp ``(d*31 + i*17) % 41 - 20``."""
    import numpy as np

    n = (_VAD_FRAMES_BASE + doc_id % _VAD_FRAMES_MOD) * _VAD_FRAME
    i = np.arange(n, dtype=np.int64)
    f = i // _VAD_FRAME
    speech = (doc_id * 7 + f * 13) % 5 < _VAD_SPEECH_LT
    ramp = doc_id * 31 + i * 17
    s = np.where(speech, ramp % 4001 - 2000, ramp % 41 - 20)
    return s.astype("<i2")


def _vad_encode(doc_id: int) -> bytes:
    """Planted VAD clip as a real 16-bit PCM mono WAV (same RIFF layout as
    :func:`_wav_encode`; rate reuses the 8/16/24 kHz mix)."""
    import struct

    rate = _WAV_RATE_BASE * (1 + doc_id % _WAV_RATE_MOD)
    data = _vad_samples(doc_id).tobytes()
    hdr = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def wav_frame_energies(clips: DataFrame) -> DataFrame:
    """``mapInArrow`` kernel: (doc_id, media BINARY) → one row per
    ANALYSIS FRAME with its exact integer energy (sum of squared int16
    samples over the {frame}-sample frame). The decode is per-blob Python
    by nature; the framing/energy math is vectorized numpy (reshape +
    row-sum). Emitting frame rows (not segments) keeps the stateful part
    of VAD — the island merge — in JVM window functions downstream."""
    import numpy as np
    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            dids, rates, fidx, sq = [], [], [], []
            for d, v in zip(doc_ids, blobs):
                rate, s = decode_wav(v.as_py())
                if len(s) % _VAD_FRAME:
                    raise ValueError(
                        "clip length not frame-aligned: "
                        f"{len(s)} % {_VAD_FRAME} != 0"
                    )
                e = (
                    s.astype("int64").reshape(-1, _VAD_FRAME) ** 2
                ).sum(axis=1)
                dids.extend([d.as_py()] * len(e))
                rates.extend([rate] * len(e))
                fidx.extend(range(len(e)))
                sq.extend(int(x) for x in e)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(dids, type=pa.int64()),
                    pa.array(rates, type=pa.int32()),
                    pa.array(fidx, type=pa.int32()),
                    pa.array(sq, type=pa.int64()),
                ],
                names=["doc_id", "sample_rate", "frame_idx", "sum_sq"],
            )

    return clips.mapInArrow(
        fn,
        "doc_id bigint, sample_rate int, frame_idx int, sum_sq bigint",
    )


wav_frame_energies.__doc__ = wav_frame_energies.__doc__.format(
    frame=_VAD_FRAME
)


def audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based VOICE-ACTIVITY DETECTION + speech-segment census — the
    audio-curation gate a speech pipeline runs before transcription
    (silence-heavy clips are dropped; segment boundaries become the ASR
    work units): plant WAV clips with deterministic SPEECH and SILENCE
    frames, decode them, take each frame's exact integer energy in the
    Arrow kernel, threshold it ({thresh} on the 80-sample sum of squares —
    planted speech frames sit >= ~12.3e6, silence <= 32e3, so the decision
    is never borderline), then merge consecutive voiced frames into
    segments with the gaps-and-islands idiom — ``frame_idx −
    row_number()`` over the per-clip voiced stream is constant exactly
    within a run — all in JVM window functions. Reported per sample rate:
    clip count, frame totals, voiced counts, segment count, the longest
    segment, and the corpus speech ratio. The DuckDB oracle replays the
    planted sample FORMULA through the identical framing, threshold, and
    island logic, so decode, energy, and merge are all value-checked.

    Scale shape: decode + framing are map-only in the scan stage (blobs
    never shuffle; frame rows are ~n/80 of sample count); the island
    window partitions by doc_id (clip-local state, no global sort); the
    final aggregate is 3 rate groups. At 100 TB this is the standard
    two-phase segment census: per-clip windows, then a tiny rollup."""
    from pyspark.sql import Window

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _vad_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _WAV_SAMPLE_MOD == _WAV_SAMPLE_RES)
    )
    clips = docs.mapInPandas(build, "doc_id bigint, media binary")
    frames = wav_frame_energies(clips).withColumn(
        "voiced", F.col("sum_sq") > _VAD_THRESH_SUMSQ
    )

    per_clip = frames.groupBy("doc_id", "sample_rate").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames")
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    segments = (
        frames.filter(F.col("voiced"))
        .withColumn("island", F.col("frame_idx") - F.row_number().over(w))
        .groupBy("doc_id", "island")
        .agg(F.count(F.lit(1)).cast("long").alias("seg_len"))
    )
    clip_vad = segments.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("seg_len").alias("voiced_frames"),
        F.max("seg_len").alias("longest_segment"),
    )
    census = per_clip.join(clip_vad, "doc_id", "left").select(
        "sample_rate",
        "n_frames",
        F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
        F.coalesce("voiced_frames", F.lit(0)).alias("voiced_frames"),
        F.coalesce("longest_segment", F.lit(0)).alias("longest_segment"),
    )
    return (
        census.groupBy("sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_frames").alias("total_frames"),
            F.sum("voiced_frames").alias("voiced_frames"),
            F.sum("n_segments").alias("n_segments"),
            F.max("longest_segment").alias("max_segment_frames"),
            F.round(
                # div-safe: every planted clip carries >= 6 frames
                F.sum("voiced_frames") / F.sum("n_frames").cast("double"),
                6,
            ).alias("speech_ratio"),
        )
        .orderBy("sample_rate")
    )


audio_vad_segments.__doc__ = audio_vad_segments.__doc__.format(
    thresh=_VAD_THRESH_SUMSQ
)

_VAD_MAX_SAMPLES = (_VAD_FRAMES_BASE + _VAD_FRAMES_MOD - 1) * _VAD_FRAME

_VAD_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_WAV_RATE_BASE} * (1 + doc_id % {_WAV_RATE_MOD}) AS rate,
         ({_VAD_FRAMES_BASE} + doc_id % {_VAD_FRAMES_MOD}) * {_VAD_FRAME}
           AS n
  FROM documents
  WHERE doc_id % {_WAV_SAMPLE_MOD} = {_WAV_SAMPLE_RES}
),
samp AS (
  SELECT d.doc_id, d.rate, d.n, gi.i, gi.i // {_VAD_FRAME} AS f,
         CASE WHEN (d.doc_id * 7 + (gi.i // {_VAD_FRAME}) * 13) % 5
                   < {_VAD_SPEECH_LT}
              THEN (d.doc_id * 31 + gi.i * 17) % 4001 - 2000
              ELSE (d.doc_id * 31 + gi.i * 17) % 41 - 20
         END AS s
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_VAD_MAX_SAMPLES - 1})) AS i) gi
    ON gi.i < d.n
),
frame AS (
  SELECT doc_id, rate, f, SUM(s * s) AS sum_sq,
         SUM(s * s) > {_VAD_THRESH_SUMSQ} AS voiced
  FROM samp GROUP BY doc_id, rate, f
),
per_clip AS (
  SELECT doc_id, rate, COUNT(*) AS n_frames FROM frame GROUP BY 1, 2
),
islands AS (
  SELECT doc_id, f,
         f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS island
  FROM frame WHERE voiced
),
segments AS (
  SELECT doc_id, island, COUNT(*) AS seg_len
  FROM islands GROUP BY doc_id, island
),
clip_vad AS (
  SELECT doc_id, COUNT(*) AS n_segments, SUM(seg_len) AS voiced_frames,
         MAX(seg_len) AS longest_segment
  FROM segments GROUP BY doc_id
)
SELECT CAST(p.rate AS INTEGER) AS sample_rate,
       COUNT(*) AS n_clips,
       CAST(SUM(p.n_frames) AS BIGINT) AS total_frames,
       CAST(SUM(COALESCE(c.voiced_frames, 0)) AS BIGINT) AS voiced_frames,
       CAST(SUM(COALESCE(c.n_segments, 0)) AS BIGINT) AS n_segments,
       CAST(MAX(COALESCE(c.longest_segment, 0)) AS BIGINT)
         AS max_segment_frames,
       -- div-safe: every planted clip carries >= {_VAD_FRAMES_BASE} frames
       ROUND(SUM(COALESCE(c.voiced_frames, 0))
             / CAST(SUM(p.n_frames) AS DOUBLE), 6) AS speech_ratio
FROM per_clip p LEFT JOIN clip_vad c ON p.doc_id = c.doc_id
GROUP BY p.rate
ORDER BY sample_rate
"""


# --------------------------------------------------------------------------
# Bilinear resize (the thumbnail/normalization step of an image pipeline)
# --------------------------------------------------------------------------

#: fixed target size every image is resized to (vision models take a fixed
#: input resolution; the planted 8-12 x 6-8 sources all downscale).
_RESIZE_W, _RESIZE_H = 4, 3
#: rounding for per-image resized channel means (values <= 255; the only
#: cross-engine noise is 12-term sum ordering, ~1e-13 absolute).
_RESIZE_ROUND = 6


def resize_bilinear_means(images: DataFrame) -> DataFrame:
    """``mapInArrow`` resize kernel: (doc_id, media BINARY) → decode the BMP
    and bilinear-resample it to {w}x{h}, emitting the per-image mean of each
    resized channel. The sampling arithmetic is written as the EXACT
    expression sequence the SQL oracle uses — ``sx = (x2+0.5)·w/{w}.0-0.5``,
    floor/frac, LEAST/GREATEST edge clamps, and a left-associated 4-term
    bilinear blend — so both engines produce bit-identical per-pixel values
    and only the 12-term mean ordering needs the {r}-dp round."""
    import math

    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            ws, hs = [], []
            means: list[list[float]] = [[], [], []]
            for v in blobs:
                w, h, flat = decode_bmp(v.as_py())
                px = flat.reshape(h, w, 3)
                sums = [0.0, 0.0, 0.0]
                for y2 in range(_RESIZE_H):
                    # div-safe: _RESIZE_H is a positive constant
                    sy = (y2 + 0.5) * h / float(_RESIZE_H) - 0.5
                    y0 = math.floor(sy)
                    fy = sy - y0
                    ya = min(max(int(y0), 0), h - 1)
                    yb = min(max(int(y0) + 1, 0), h - 1)
                    for x2 in range(_RESIZE_W):
                        # div-safe: _RESIZE_W is a positive constant
                        sx = (x2 + 0.5) * w / float(_RESIZE_W) - 0.5
                        x0 = math.floor(sx)
                        fx = sx - x0
                        xa = min(max(int(x0), 0), w - 1)
                        xb = min(max(int(x0) + 1, 0), w - 1)
                        for c in range(3):
                            pa_v = float(px[ya, xa, c])
                            pb_v = float(px[ya, xb, c])
                            pc_v = float(px[yb, xa, c])
                            pd_v = float(px[yb, xb, c])
                            sums[c] += (
                                (pa_v * (1 - fx)) * (1 - fy)
                                + (pb_v * fx) * (1 - fy)
                                + (pc_v * (1 - fx)) * fy
                                + (pd_v * fx) * fy
                            )
                ws.append(w)
                hs.append(h)
                for c in range(3):
                    means[c].append(
                        _round_half_up_f(
                            # div-safe: fixed positive target-pixel count
                            sums[c] / float(_RESIZE_W * _RESIZE_H),
                            _RESIZE_ROUND,
                        )
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                    *[pa.array(means[c], type=pa.float64()) for c in range(3)],
                ],
                names=["doc_id", "width", "height", "r_mean", "g_mean",
                       "b_mean"],
            )

    return images.mapInArrow(
        fn,
        "doc_id bigint, width int, height int, "
        "r_mean double, g_mean double, b_mean double",
    )


resize_bilinear_means.__doc__ = resize_bilinear_means.__doc__.format(
    w=_RESIZE_W, h=_RESIZE_H, r=_RESIZE_ROUND
)


def multimodal_resize_bilinear_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE end to end — the normalization step every vision-data
    pipeline runs between decode and feature extraction: plant real 24-bit
    BMPs for 1-in-4 documents, decode them from bytes alone, bilinear-
    resample each to a fixed {w}x{h} thumbnail inside the map-only kernel,
    and report per source (width, height) shape: image count and the exact
    decimal-summed resized channel means. The DuckDB oracle re-derives every output pixel
    from the planted pixel FORMULA with the same sampling arithmetic — so
    decode AND the resampler's coordinate math (half-pixel centers, edge
    clamps, fractional blend) are value-checked.

    Scale shape: decode + resize run inside the scan-stage kernel (blobs
    never shuffle); the aggregate is 15 shape groups."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _bmp_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _BMP_SAMPLE_MOD == 0)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")
    resized = resize_bilinear_means(images)
    return (
        resized.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            # exact DECIMAL sums of the 6-dp per-image means — re-rounding
            # an AVG of 6-dp multiples sat EXACTLY on 6-dp half-boundaries
            # here (132.5555555), a cross-engine coin flip
            F.sum(F.col("r_mean").cast("decimal(16,6)"))
            .cast("double")
            .alias("sum_r"),
            F.sum(F.col("g_mean").cast("decimal(16,6)"))
            .cast("double")
            .alias("sum_g"),
            F.sum(F.col("b_mean").cast("decimal(16,6)"))
            .cast("double")
            .alias("sum_b"),
        )
        .orderBy("width", "height")
    )


multimodal_resize_bilinear_stats.__doc__ = (
    multimodal_resize_bilinear_stats.__doc__.format(w=_RESIZE_W, h=_RESIZE_H)
)


def _resize_sql() -> str:
    def chan(expr_x: str, expr_y: str, ch: str) -> str:
        f = {
            "r": f"(doc_id + 3 * {expr_x} + 7 * {expr_y}) % 256",
            "g": f"(3 * doc_id + 5 * {expr_x} + 2 * {expr_y}) % 256",
            "b": f"(doc_id + {expr_x} * {expr_y}) % 256",
        }
        return f[ch]

    blends = ",\n         ".join(
        f"({chan('xa', 'ya', c)} * (1 - fx)) * (1 - fy)"
        f" + ({chan('xb', 'ya', c)} * fx) * (1 - fy)"
        f" + ({chan('xa', 'yb', c)} * (1 - fx)) * fy"
        f" + ({chan('xb', 'yb', c)} * fx) * fy AS v_{c}"
        for c in "rgb"
    )
    means = ",\n         ".join(
        f"ROUND(SUM(v_{c}) / {float(_RESIZE_W * _RESIZE_H)!r},"
        f" {_RESIZE_ROUND}) AS {c}_mean"
        for c in "rgb"
    )
    return f"""
WITH docs AS (
  SELECT doc_id,
         {_BMP_W_BASE} + doc_id % {_BMP_W_MOD} AS w,
         {_BMP_H_BASE} + doc_id % {_BMP_H_MOD} AS h
  FROM documents WHERE doc_id % {_BMP_SAMPLE_MOD} = 0
),
grid AS (
  SELECT gx.x2, gy.y2
  FROM (SELECT unnest(generate_series(0, {_RESIZE_W - 1})) AS x2) gx,
       (SELECT unnest(generate_series(0, {_RESIZE_H - 1})) AS y2) gy
),
coords AS (
  SELECT doc_id, w, h, x2, y2,
         (x2 + 0.5) * w / {float(_RESIZE_W)!r} - 0.5 AS sx,
         (y2 + 0.5) * h / {float(_RESIZE_H)!r} - 0.5 AS sy
  FROM docs, grid
),
fracs AS (
  SELECT doc_id, w, h, x2, y2,
         sx - FLOOR(sx) AS fx, sy - FLOOR(sy) AS fy,
         LEAST(GREATEST(CAST(FLOOR(sx) AS INTEGER), 0), w - 1) AS xa,
         LEAST(GREATEST(CAST(FLOOR(sx) AS INTEGER) + 1, 0), w - 1) AS xb,
         LEAST(GREATEST(CAST(FLOOR(sy) AS INTEGER), 0), h - 1) AS ya,
         LEAST(GREATEST(CAST(FLOOR(sy) AS INTEGER) + 1, 0), h - 1) AS yb
  FROM coords
),
vals AS (
  SELECT doc_id, w, h,
         {blends}
  FROM fracs
),
per_img AS (
  SELECT doc_id, w, h,
         {means}
  FROM vals GROUP BY doc_id, w, h
)
SELECT CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       COUNT(*) AS n_images,
       CAST(SUM(CAST(r_mean AS DECIMAL(16,6))) AS DOUBLE) AS sum_r,
       CAST(SUM(CAST(g_mean AS DECIMAL(16,6))) AS DOUBLE) AS sum_g,
       CAST(SUM(CAST(b_mean AS DECIMAL(16,6))) AS DOUBLE) AS sum_b
FROM per_img
GROUP BY w, h
ORDER BY width, height
"""


# --------------------------------------------------------------------------
# Histogram equalization (contrast normalization before feature extraction)
# --------------------------------------------------------------------------


def multimodal_hist_equalization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image HISTOGRAM EQUALIZATION of the red channel — the classic
    contrast normalization a vision pipeline applies between decode and
    featurization: remap each level v to
    ``round((cdf(v) − cdf_min) · 255 / (N − cdf_min))`` where ``cdf`` is
    the image's own cumulative histogram and ``cdf_min`` its darkest
    occupied level's count. Per (width, height) shape: image count, exact
    pre/post channel sums, and the summed distinct-level counts before and
    after (the spread the remap is supposed to widen toward the full
    0-255 range).

    Cross-engine exactness: the remap is computed ENTIRELY in integer
    arithmetic — half-up rounding as ``(num·510 + den) // (2·den)`` over
    exact counts — so there is no floating point anywhere in the operator
    and the DuckDB replay (pixel formula → per-image histogram → window
    cdf → the same integer remap) matches bit-for-bit by construction.

    Scale shape: decode + per-image equalization run inside the map-only
    kernel (a 256-entry table per image, numpy-side); the aggregate is 15
    shape groups. The oracle's window cdf partitions by doc_id — bounded
    per-image groups."""
    import numpy as np
    import pyarrow as pa

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _bmp_encode(int(d))),
                }
            )

    def equalize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            ws, hs, pre, post, dpre, dpost = [], [], [], [], [], []
            for v in blobs:
                w, h, px = decode_bmp(v.as_py())
                r = px[:, 0].astype(np.int64)
                n = int(r.size)
                counts = np.bincount(r, minlength=256)
                cdf = np.cumsum(counts)
                occupied = counts > 0
                cdf_min = int(cdf[occupied.argmax()])  # darkest level count
                den = max(n - cdf_min, 1)
                num = (cdf - cdf_min) * 255
                # integer half-up rounding: (num*2 + den) // (2*den)
                levels = (num * 2 + den) // (2 * den)
                out = levels[r]
                ws.append(w)
                hs.append(h)
                pre.append(int(r.sum()))
                post.append(int(out.sum()))
                dpre.append(int(occupied.sum()))
                dpost.append(int(np.unique(levels[occupied]).size))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                    pa.array(pre, type=pa.int64()),
                    pa.array(post, type=pa.int64()),
                    pa.array(dpre, type=pa.int64()),
                    pa.array(dpost, type=pa.int64()),
                ],
                names=["doc_id", "width", "height", "sum_pre", "sum_post",
                       "levels_pre", "levels_post"],
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _BMP_SAMPLE_MOD == 0)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")
    eq = images.mapInArrow(
        equalize,
        "doc_id bigint, width int, height int, sum_pre bigint, "
        "sum_post bigint, levels_pre bigint, levels_post bigint",
    )
    return (
        eq.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("sum_pre").cast("long").alias("sum_pre"),
            F.sum("sum_post").cast("long").alias("sum_post"),
            F.sum("levels_pre").cast("long").alias("levels_pre"),
            F.sum("levels_post").cast("long").alias("levels_post"),
        )
        .orderBy("width", "height")
    )


_HISTEQ_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_BMP_W_BASE} + doc_id % {_BMP_W_MOD} AS w,
         {_BMP_H_BASE} + doc_id % {_BMP_H_MOD} AS h
  FROM documents WHERE doc_id % {_BMP_SAMPLE_MOD} = 0
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (d.doc_id + 3 * gx.x + 7 * gy.y) % 256 AS v
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_BMP_W_BASE + _BMP_W_MOD - 2})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_BMP_H_BASE + _BMP_H_MOD - 2})) AS y) gy
    ON gy.y < d.h
),
hist AS (
  SELECT doc_id, w, h, v, COUNT(*) AS cnt FROM px GROUP BY 1, 2, 3, 4
),
cdf AS (
  SELECT doc_id, w, h, v, cnt,
         SUM(cnt) OVER (PARTITION BY doc_id ORDER BY v) AS cdf,
         FIRST_VALUE(cnt) OVER (PARTITION BY doc_id ORDER BY v) AS cdf_min
  FROM hist
),
remap AS (
  SELECT doc_id, w, h, v, cnt,
         -- integer half-up: (num*2 + den) // (2*den); den >= 1 via GREATEST
         CAST(((cdf - cdf_min) * 255 * 2
               + GREATEST(w * h - cdf_min, 1))
              -- div-safe: GREATEST(..., 1) >= 1
              // (2 * GREATEST(w * h - cdf_min, 1)) AS BIGINT) AS post_v
  FROM cdf
),
per_img AS (
  SELECT doc_id, w, h,
         CAST(SUM(v * cnt) AS BIGINT) AS sum_pre,
         CAST(SUM(post_v * cnt) AS BIGINT) AS sum_post,
         COUNT(*) AS levels_pre,
         COUNT(DISTINCT post_v) AS levels_post
  FROM remap GROUP BY 1, 2, 3
)
SELECT CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       COUNT(*) AS n_images,
       CAST(SUM(sum_pre) AS BIGINT) AS sum_pre,
       CAST(SUM(sum_post) AS BIGINT) AS sum_post,
       CAST(SUM(levels_pre) AS BIGINT) AS levels_pre,
       CAST(SUM(levels_post) AS BIGINT) AS levels_post
FROM per_img
GROUP BY w, h
ORDER BY width, height
"""


# --------------------------------------------------------------------------
# TAR / WebDataset shard round-trip (the training-corpus container format)
# --------------------------------------------------------------------------

#: WebDataset sharding: documents hash into this many tar shards.
_TAR_SHARDS = 24


def _tar_header(name: str, size: int) -> bytes:
    """POSIX ustar member header: octal size field, magic/version, and the
    spec's checksum (header summed with the checksum field as 8 spaces)."""
    h = bytearray(512)
    nb = name.encode()
    if len(nb) > 100:
        raise ValueError("member name too long for the ustar name field")
    h[0 : len(nb)] = nb
    h[100:108] = b"0000644\x00"          # mode
    h[108:116] = b"0000000\x00"          # uid
    h[116:124] = b"0000000\x00"          # gid
    h[124:136] = f"{size:011o}".encode() + b"\x00"
    h[136:148] = b"00000000000\x00"      # mtime (deterministic)
    h[148:156] = b" " * 8                # chksum placeholder
    h[156] = ord("0")                    # typeflag: regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(h)


def _tar_build(members: list[tuple[str, bytes]]) -> bytes:
    """Assemble a tar archive: header + NUL-padded payload per member,
    then the two end-of-archive zero blocks."""
    out = bytearray()
    for name, payload in members:
        out += _tar_header(name, len(payload))
        out += payload
        pad = (-len(payload)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def _tar_scan(data: bytes) -> list[tuple[str, int]]:
    """Parse a tar archive from bytes alone: walk 512-byte headers, VERIFY
    each header checksum, skip payload blocks, stop at the end-of-archive
    zero block. Returns (member name, size) pairs; raises ``ValueError``
    on corrupt headers (a flipped size byte would desync every later
    member, so the checksum gate matters)."""
    off = 0
    out: list[tuple[str, int]] = []
    while off + 512 <= len(data):
        block = data[off : off + 512]
        if block == b"\x00" * 512:
            return out
        stored = int(block[148:156].split(b"\x00")[0].strip() or b"0", 8)
        calc = sum(block[:148]) + 8 * 32 + sum(block[156:])
        if stored != calc:
            raise ValueError(f"tar header checksum mismatch at offset {off}")
        name = block[:100].split(b"\x00")[0].decode()
        size = int(block[124:136].split(b"\x00")[0].strip(), 8)
        out.append((name, size))
        off += 512 + size + ((-size) % 512)
    raise ValueError("unterminated tar archive")


def multimodal_tar_webdataset_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEBDATASET round-trip — the container format large multimodal
    training corpora actually ship in (tar shards whose consecutive
    members share a basename per sample): hash-shard the documents into
    {shards} tars, ASSEMBLE each shard as a real POSIX ustar archive
    (octal size fields, checksummed headers, NUL padding, end blocks)
    with two members per sample (``<doc_id>.txt`` = the text,
    ``<doc_id>.cls`` = the source label), then SCAN the shards back from
    bytes alone — checksum-verifying every header — and report per shard:
    members, samples, exact payload bytes, and the archive size, which the
    DuckDB oracle recomputes from the 512-byte block FORMULA (a single
    mis-written octal size field desyncs every later member, so the
    round-trip is self-proving).

    Scale shape: shard assembly is ``applyInPandas`` over the shard key —
    ONE shuffle of the payload (exactly what a distributed WebDataset
    writer does); the scan is map-only over shard blobs; the final
    aggregate is {shards} rows."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text",
        (F.col("doc_id") % _TAR_SHARDS).cast("int").alias("shard_id"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members: list[tuple[str, bytes]] = []
        for r in pdf.itertuples():
            members.append((f"{r.doc_id}.txt", r.text.encode()))
            members.append((f"{r.doc_id}.cls", r.source.encode()))
        return pd.DataFrame(
            {"shard_id": [int(pdf["shard_id"].iloc[0])],
             "tar": [_tar_build(members)]}
        )

    shards = docs.groupBy("shard_id").applyInPandas(
        build, "shard_id int, tar binary"
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                members = _tar_scan(bytes(r.tar))
                samples = {n.rsplit(".", 1)[0] for n, _ in members}
                rows.append(
                    (int(r.shard_id), len(members), len(samples),
                     sum(s for _, s in members), len(bytes(r.tar)))
                )
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "n_members", "n_samples",
                         "payload_bytes", "tar_bytes"],
            )

    stats = shards.mapInPandas(
        scan,
        "shard_id int, n_members long, n_samples long, "
        "payload_bytes long, tar_bytes long",
    )
    return stats.select(
        "shard_id",
        "n_members",
        "n_samples",
        "payload_bytes",
        "tar_bytes",
        (F.col("tar_bytes") % 512 == 0).alias("block_aligned"),
    ).orderBy("shard_id")


_TAR_SCAN_SQL = f"""
WITH m AS (
  SELECT CAST(doc_id % {_TAR_SHARDS} AS INTEGER) AS shard_id,
         strlen(text) AS txt_b, strlen(source) AS cls_b
  FROM documents
)
SELECT shard_id,
       2 * COUNT(*) AS n_members,
       COUNT(*) AS n_samples,
       CAST(SUM(txt_b + cls_b) AS BIGINT) AS payload_bytes,
       -- per member: 512-byte header + payload NUL-padded to 512; plus the
       -- two end-of-archive zero blocks
       CAST(SUM(512 + CAST(CEIL(txt_b / 512.0) AS BIGINT) * 512
                + 512 + CAST(CEIL(cls_b / 512.0) AS BIGINT) * 512)
            + 1024 AS BIGINT) AS tar_bytes,
       TRUE AS block_aligned
FROM m
GROUP BY shard_id
ORDER BY shard_id
"""


# --------------------------------------------------------------------------
# Baseline JPEG decode (DCT + Huffman) — transform-coded capstone of the
# decoder lineage (BMP → PNG/zlib → GIF/LZW → JPEG)
# --------------------------------------------------------------------------

_JPEG_W_BASE, _JPEG_W_MOD = 16, 11   # width  = 16 + doc_id % 11 — 16..26
_JPEG_H_BASE, _JPEG_H_MOD = 9, 13    # height =  9 + doc_id % 13 — 9..21
_JPEG_SAMPLE_MOD = 5                 # plant 1-in-5 docs as JPEG images
_JPEG_SAMPLE_RES = 1                 # (residue 1: disjoint from the GIF set)

#: Planted quantized-coefficient lattice. Only (u,v) ∈ {(0,0),(0,4),(4,0),
#: (4,4)} are nonzero: cos((2t+1)·4π/16) = ±√2/2 with sign pattern
#: [+,−,−,+,+,−,−,+], so with Q=8 at the AC positions and Q=16 at DC every
#: IDCT output pixel is an EXACT small integer — the oracle replays the
#: pixel FORMULA in integer SQL while the decoder runs the general float
#: IDCT. The Huffman/zigzag layout this lattice produces exercises DC
#: prediction (per-block varying DC), mid-block runs, ZRL (gap 14→39 is 24
#: zeros), double-ZRL (gap 0→39 when both earlier ACs are zero), and EOB.
_JPEG_SIGN = (1, -1, -1, 1, 1, -1, -1, 1)


def _jpeg_zigzag() -> list[tuple[int, int]]:
    """The JPEG zigzag scan order as (u, v) pairs: diagonals u+v = s, odd
    diagonals walked with u ascending, even ones descending."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        us = [u for u in range(8) if 0 <= s - u < 8]
        for u in (us if s % 2 else reversed(us)):
            order.append((u, s - u))
    return order


_JPEG_ZIGZAG = _jpeg_zigzag()


def _jpeg_qtable() -> list[int]:
    """Quantization table in ZIGZAG order (how DQT stores it): 16 at DC,
    8 at the three planted AC positions, arbitrary valid steps elsewhere
    (they multiply zeros)."""
    q = {(0, 0): 16, (0, 4): 8, (4, 0): 8, (4, 4): 8}
    return [q.get((u, v), 5 + u + v) for (u, v) in _JPEG_ZIGZAG]


def _jpeg_coeffs(doc_id: int, bx: int, by: int) -> dict[tuple[int, int], int]:
    """Planted QUANTIZED coefficients for block (bx, by) — pure arithmetic
    the oracle recomputes in SQL. (0,4) varies along x, (4,0) along y."""
    return {
        (0, 0): (doc_id + 5 * bx + 3 * by) % 32 - 16,
        (0, 4): (doc_id + bx) % 7 - 3,
        (4, 0): (doc_id + by) % 5 - 2,
        (4, 4): (doc_id + bx + by) % 9 - 4,
    }


#: DC diff size categories 0..5 (planted diffs span [-31, 31]), flat 3-bit.
_JPEG_DC_SYMBOLS = tuple(range(6))
_JPEG_DC_LENGTHS = (3,) * 6
#: AC symbols ordered by planted frequency — like the spec's Annex K
#: tables, common symbols get short unary-style codes (lengths 1..10) and
#: the rare tail sits at length 13 behind the all-ones prefix. The long
#: 1-runs of the tail codes are what drives real scans into the 0xFF00
#: byte-stuffing path (a flat short-code table never emits 8 aligned
#: 1-bits, leaving destuffing untested).
_JPEG_AC_SYMBOLS = (
    0x00, 0x92, 0x32, 0xF0, 0x83, 0x82, 0x91, 0x31, 0x81, 0xC3,  # len 1..10
    0xC2, 0xC1, 0xD2, 0xD1, 0x63, 0x62, 0x61,                    # len 13
)
_JPEG_AC_LENGTHS = tuple(range(1, 11)) + (13,) * 7


def _jpeg_canonical(
    symbols: tuple[int, ...], lengths: tuple[int, ...]
) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (JPEG C.2): symbols listed in ascending
    code-length order get consecutive codes, left-shifted at each length
    step; the all-ones code of the maximum length stays unused. Returns
    symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, prev = 0, lengths[0]
    for sym, length in zip(symbols, lengths):
        code <<= length - prev
        prev = length
        out[sym] = (code, length)
        code += 1
    assert code <= (1 << prev) - 1, "canonical table would use all-ones code"
    return out


def _jpeg_dht(
    tc_th: int, symbols: tuple[int, ...], lengths: tuple[int, ...]
) -> bytes:
    """A DHT segment (16 per-length counts + symbol list in length order)."""
    import struct

    counts = [0] * 16
    for length in lengths:
        counts[length - 1] += 1
    payload = bytes([tc_th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


class _JpegBitWriter:
    """MSB-first bit packer with 0xFF→0xFF00 byte stuffing (JPEG ECS rule);
    the final partial byte is padded with 1-bits per the spec."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def finish(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            final = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(final)
            if final == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _jpeg_encode(doc_id: int, qtable: list[int] | None = None) -> bytes:
    """Build a real baseline grayscale JFIF: SOI, APP0, DQT (zigzag), SOF0,
    two DHTs (DC+AC), SOS, the entropy-coded segment (Huffman + magnitude
    bits + byte stuffing + DC prediction across blocks), EOI. Edge blocks
    are coded in full and cropped by the decoder (w, h are deliberately not
    multiples of 8). ``qtable`` (zigzag order) overrides the planted table
    — the quantized COEFFICIENTS are table-independent, so the same scan
    bytes pair with any valid DQT (the QF-estimation plant uses this)."""
    import struct

    w = _JPEG_W_BASE + doc_id % _JPEG_W_MOD
    h = _JPEG_H_BASE + doc_id % _JPEG_H_MOD
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += (
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
        + bytes(qtable if qtable is not None else _jpeg_qtable())
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    out += _jpeg_dht(0x00, _JPEG_DC_SYMBOLS, _JPEG_DC_LENGTHS)
    out += _jpeg_dht(0x10, _JPEG_AC_SYMBOLS, _JPEG_AC_LENGTHS)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    dc_codes = _jpeg_canonical(_JPEG_DC_SYMBOLS, _JPEG_DC_LENGTHS)
    ac_codes = _jpeg_canonical(_JPEG_AC_SYMBOLS, _JPEG_AC_LENGTHS)
    wtr = _JpegBitWriter()
    pred = 0
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            co = _jpeg_coeffs(doc_id, bx, by)
            diff = co[(0, 0)] - pred
            pred = co[(0, 0)]
            size = abs(diff).bit_length()
            wtr.put(*dc_codes[size])
            if size:
                wtr.put(diff if diff > 0 else diff + (1 << size) - 1, size)
            run = 0
            for k in range(1, 64):
                v = co.get(_JPEG_ZIGZAG[k], 0)
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    wtr.put(*ac_codes[0xF0])
                    run -= 16
                size = abs(v).bit_length()
                wtr.put(*ac_codes[(run << 4) | size])
                wtr.put(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if run:
                wtr.put(*ac_codes[0x00])
    out += wtr.finish()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(data: bytes):
    """Decode a BASELINE (SOF0) grayscale JFIF from its bytes alone:
    marker walk (APPn/COM skipped), 8-bit DQT tables, canonical Huffman
    tables rebuilt from DHT length counts, entropy decode with 0xFF00
    destuffing / DC prediction / ZRL / EOB, dequantize in zigzag order,
    dezigzag, float separable IDCT, +128 level shift, clamp, and crop the
    MCU padding back to (h, w). Returns ``(width, height, pixels)`` with
    ``pixels`` an (h, w) uint8 ndarray. Raises ``ValueError`` on anything
    malformed or non-baseline (progressive SOF2, multi-component color,
    16-bit DQT, restart intervals) — corrupt blobs must fail loudly."""
    import struct

    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = comps = scan_tabs = None
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG stream (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected a marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before any scan data")
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:  # DQT — possibly several tables per segment
            o = 0
            while o < len(seg):
                if seg[o] >> 4 != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if o + 65 > len(seg):
                    raise ValueError("truncated DQT")
                qtables[seg[o] & 15] = np.frombuffer(
                    seg, np.uint8, 64, o + 1
                ).astype(np.int32)
                o += 65
        elif marker == 0xC0:  # SOF0 — baseline sequential
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if w == 0 or h == 0:
                raise ValueError("empty image")
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF0 component list")
            comps = [
                (seg[6 + 3 * c], seg[7 + 3 * c] >> 4,
                 seg[7 + 3 * c] & 15, seg[8 + 3 * c])
                for c in range(ncomp)
            ]
            samps = tuple((hs, vs) for _, hs, vs, _ in comps)
            if samps not in (((1, 1),), ((2, 2), (1, 1), (1, 1))):
                raise ValueError(
                    "only grayscale or YCbCr 4:2:0 baseline supported"
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0xff{marker:02x} unsupported")
        elif marker == 0xC4:  # DHT — rebuild canonical codes from counts
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                counts = seg[o + 1 : o + 17]
                if len(counts) != 16:
                    raise ValueError("truncated DHT")
                syms = seg[o + 17 : o + 17 + sum(counts)]
                if len(syms) != sum(counts):
                    raise ValueError("truncated DHT symbol list")
                table: dict[tuple[int, int], int] = {}
                code, i = 0, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[i]
                        i += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
                o += 17 + len(syms)
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif 0xE0 <= marker <= 0xEF or marker == 0xFE:
            pass  # APPn / COM
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if comps is None or ns != len(comps):
                raise ValueError("scan must cover all frame components")
            scan_tabs = {
                seg[1 + 2 * c]: (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                for c in range(ns)
            }
            if tuple(seg[1 + 2 * ns : 4 + 2 * ns]) != (0, 63, 0):
                raise ValueError("non-baseline spectral selection")
            pos += seg_len
            break
        else:
            raise ValueError(f"unsupported marker 0xff{marker:02x}")
        pos += seg_len
    if w is None or comps is None:
        raise ValueError("missing SOF0 before SOS")
    for cid, _, _, cqid in comps:
        if cqid not in qtables:
            raise ValueError("missing quantization table for a component")
        if cid not in scan_tabs:
            raise ValueError("SOS does not cover a frame component")
        dci, aci = scan_tabs[cid]
        if (0, dci) not in huff or (1, aci) not in huff:
            raise ValueError("missing Huffman table referenced by SOS")
    # destuff the entropy-coded segment up to the terminating marker
    body = bytearray()
    i = pos
    end_marker = None
    while i < len(data):
        if data[i] == 0xFF:
            if i + 1 >= len(data):
                raise ValueError("dangling 0xFF at end of scan")
            if data[i + 1] == 0x00:
                body.append(0xFF)
                i += 2
                continue
            end_marker = data[i + 1]
            break
        body.append(data[i])
        i += 1
    if end_marker != 0xD9:
        raise ValueError("scan not terminated by EOI")

    nbits = len(body) * 8
    bitpos = 0

    def read_bits(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            raise ValueError("truncated entropy-coded segment")
        v = 0
        for _ in range(width):
            v = (v << 1) | ((body[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    def read_huff(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | read_bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def extend(bits: int, size: int) -> int:
        return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1

    u = np.arange(8)
    # div-safe: sqrt(2) is a positive constant
    cu = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
    basis = 0.5 * cu[:, None] * np.cos(
        (2 * np.arange(8)[None, :] + 1) * u[:, None] * np.pi / 16.0
    )  # basis[u, y]; spatial = basis.T @ S @ basis
    zz_u = np.array([p[0] for p in _JPEG_ZIGZAG])
    zz_v = np.array([p[1] for p in _JPEG_ZIGZAG])

    def decode_block(qt, dctab, actab, pred):
        coeffs = np.zeros(64, np.float64)
        size = read_huff(dctab)
        pred += extend(read_bits(size), size) if size else 0
        coeffs[0] = pred * qt[0]
        k = 1
        while k < 64:
            sym = read_huff(actab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 15
            if size == 0:
                raise ValueError(f"invalid AC symbol 0x{sym:02x}")
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            coeffs[k] = extend(read_bits(size), size) * qt[k]
            k += 1
        mat = np.zeros((8, 8), np.float64)
        mat[zz_u, zz_v] = coeffs
        return basis.T @ mat @ basis + 128.0, pred

    # interleaved MCU scan (a 1-component frame degenerates to raster 8×8)
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), np.float64)
        for cid, hs, vs, _ in comps
    }
    preds = {cid: 0 for cid, _, _, _ in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, hs, vs, cqid in comps:
                qt = qtables[cqid].astype(np.float64)
                dci, aci = scan_tabs[cid]
                for iy in range(vs):
                    for ix in range(hs):
                        blk, preds[cid] = decode_block(
                            qt, huff[(0, dci)], huff[(1, aci)], preds[cid]
                        )
                        y0, x0 = (my * vs + iy) * 8, (mx * hs + ix) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
    if len(comps) == 1:
        px = (
            np.clip(np.round(planes[comps[0][0]]), 0, 255)
            .astype(np.uint8)[:h, :w]
        )
        return int(w), int(h), px
    # YCbCr 4:2:0 → RGB (JFIF constants); chroma upsampled by 2× pixel
    # replication — with the planted DC-only chroma every 8×8 chroma block
    # is flat, so the upsampling kernel choice cannot change any pixel
    lum = planes[comps[0][0]][:h, :w]
    cb = np.repeat(np.repeat(planes[comps[1][0]], 2, 0), 2, 1)[:h, :w] - 128.0
    cr = np.repeat(np.repeat(planes[comps[2][0]], 2, 0), 2, 1)[:h, :w] - 128.0
    rgb = np.stack(
        [
            lum + 1.402 * cr,
            lum - 0.344136 * cb - 0.714136 * cr,
            lum + 1.772 * cb,
        ],
        axis=-1,
    )
    px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return int(w), int(h), px


#: Output contract of the JPEG decode kernel.
JPEG_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "sum_px bigint, mid_row_sum bigint, mid_col_sum bigint"
)


def decode_jpeg_stats(images: DataFrame) -> DataFrame:
    """``mapInArrow`` decode kernel: (doc_id, media BINARY) → decoded
    dimensions, the exact pixel sum, and the middle row's / middle
    column's sums (pixel ORDER must survive Huffman + IDCT + crop in both
    axes, not just totals)."""
    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            ws, hs, tot, mrow, mcol = [], [], [], [], []
            for v in blobs:
                w, h, px = decode_jpeg(v.as_py())
                p64 = px.astype("int64")
                ws.append(w)
                hs.append(h)
                tot.append(int(p64.sum()))
                mrow.append(int(p64[h // 2, :].sum()))
                mcol.append(int(p64[:, w // 2].sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                    pa.array(tot, type=pa.int64()),
                    pa.array(mrow, type=pa.int64()),
                    pa.array(mcol, type=pa.int64()),
                ],
                names=[
                    "doc_id", "width", "height",
                    "sum_px", "mid_row_sum", "mid_col_sum",
                ],
            )

    return images.mapInArrow(fn, JPEG_STATS_SCHEMA)


def multimodal_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM-coded image decode end to end — the codec class the
    dictionary formats (GIF/LZW, PNG/zlib) don't cover: plant deterministic
    baseline grayscale JFIF payloads for 1-in-5 documents (real DCT-domain
    coefficients, canonical Huffman DC+AC tables, zigzag, ZRL runs, DC
    prediction across blocks, byte stuffing, MCU edge-padding), decode
    them back from bytes alone with :func:`decode_jpeg` (general float
    IDCT), and report per (width, height): image count, exact pixel sum,
    mean intensity, and the exact middle-row / middle-column sums. The
    coefficients live on an exactly-IDCT-able lattice (DC plus ACs at
    (0,4)/(4,0)/(4,4), where the cosines are ±√2/2), so the DuckDB oracle
    recomputes every pixel in INTEGER SQL — one wrong Huffman bit, run
    length, predictor update, or dequant step shifts the remaining stream
    and diverges the sums.

    Scale shape: map-only until the final tiny groupBy (width×height shape
    groups); blobs are built and decoded inside the scan stage and never
    shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(lambda d: _jpeg_encode(int(d))),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _JPEG_SAMPLE_MOD == _JPEG_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")
    stats = decode_jpeg_stats(images)
    n_px = F.sum(F.col("width").cast("long") * F.col("height"))
    return (
        stats.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("sum_px").alias("sum_px"),
            # div-safe: n_px = planted JPEG width x height, positive
            F.round(F.sum("sum_px") / n_px, 4).alias("avg_intensity"),
            F.sum("mid_row_sum").alias("mid_row_sum"),
            F.sum("mid_col_sum").alias("mid_col_sum"),
        )
        .orderBy("width", "height")
    )


_JPEG_DECODE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_JPEG_W_BASE} + doc_id % {_JPEG_W_MOD} AS w,
         {_JPEG_H_BASE} + doc_id % {_JPEG_H_MOD} AS h
  FROM documents WHERE doc_id % {_JPEG_SAMPLE_MOD} = {_JPEG_SAMPLE_RES}
),
px AS (
  SELECT d.doc_id, d.w, d.h, gx.x, gy.y
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_JPEG_W_BASE + _JPEG_W_MOD - 2})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_JPEG_H_BASE + _JPEG_H_MOD - 2})) AS y) gy
    ON gy.y < d.h
),
vals AS (
  SELECT doc_id, w, h, x, y,
         128
         + 2 * ((doc_id + 5 * (x // 8) + 3 * (y // 8)) % 32 - 16)
         + ((doc_id + (x // 8)) % 7 - 3)
             * (CASE WHEN (x % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
         + ((doc_id + (y // 8)) % 5 - 2)
             * (CASE WHEN (y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
         + ((doc_id + (x // 8) + (y // 8)) % 9 - 4)
             * (CASE WHEN (x % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
             * (CASE WHEN (y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
         AS p
  FROM px
)
SELECT CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       COUNT(DISTINCT doc_id) AS n_images,
       CAST(SUM(p) AS BIGINT) AS sum_px,
       -- div-safe: COUNT(*) of a GROUP BY group is >= 1
       ROUND(CAST(SUM(p) AS DOUBLE) / COUNT(*), 4) AS avg_intensity,
       CAST(SUM(CASE WHEN y = h // 2 THEN p ELSE 0 END) AS BIGINT)
         AS mid_row_sum,
       CAST(SUM(CASE WHEN x = w // 2 THEN p ELSE 0 END) AS BIGINT)
         AS mid_col_sum
FROM vals
GROUP BY w, h
ORDER BY width, height
"""


# --------------------------------------------------------------------------
# JPEG quality-factor estimation (r14): the compression-quality census an
# image-curation pipeline runs before training (low-QF recompressed images
# are dropped or down-weighted) — invert the public IJG quality scaling
# (libjpeg jcparam.c) from the DQT bytes alone
# --------------------------------------------------------------------------

#: the spec's Annex-K luminance quantization table, NATURAL (row-major)
#: order — the base every IJG-style encoder scales by the quality factor.
_IJG_BASE_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
#: planted quality factor: 35 + doc_id % 56 → 35..90. In this range no
#: entry clamps (max scaled value 171 < 255, min 2 > 1) and every QF's
#: table is DISTINCT (pytest-pinned), so the estimator can identify the
#: exact factor.
_QF_BASE, _QF_MOD = 35, 56


def _ijg_scale(qf: int) -> int:
    """IJG scale factor S per jcparam.c: 5000/QF below 50 (integer
    division), 200 − 2·QF at and above."""
    return 5000 // qf if qf < 50 else 200 - 2 * qf


def _ijg_qtable_natural(qf: int) -> list[int]:
    """The IJG-scaled luminance table in NATURAL order:
    ``clamp((base·S + 50) // 100, 1, 255)`` per entry."""
    s = _ijg_scale(qf)
    return [
        max(1, min(255, (b * s + 50) // 100)) for b in _IJG_BASE_LUMA
    ]


def _jpegq_encode(doc_id: int) -> bytes:
    """The QF-estimation plant: the standard grayscale baseline encode
    (:func:`_jpeg_encode` — same scan bytes; quantized coefficients are
    table-independent) carrying the IJG-scaled table for this doc's
    planted quality factor, stored in zigzag order as DQT requires."""
    qf = _QF_BASE + doc_id % _QF_MOD
    nat = _ijg_qtable_natural(qf)
    zz = [nat[u * 8 + v] for (u, v) in _JPEG_ZIGZAG]
    return _jpeg_encode(doc_id, qtable=zz)


def _jpeg_read_dqt0(data: bytes) -> list[int]:
    """Marker-walk a JFIF stream up to SOS and return 8-bit DQT table 0 in
    ZIGZAG order (same walk discipline as :func:`decode_jpeg`, scoped to
    the one segment the estimator needs). Raises ``ValueError`` loudly on
    malformed streams."""
    import struct

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG stream (no DQT before SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected a marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD9, 0xDA):
            raise ValueError("no 8-bit DQT table 0 before scan data")
        (seg_len,) = struct.unpack_from(">H", data, pos)
        if pos + seg_len > len(data):
            raise ValueError("truncated segment")
        if marker == 0xDB:
            body = data[pos + 2:pos + seg_len]
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4:
                    raise ValueError("16-bit quantization tables unsupported")
                if off + 65 > len(body):
                    raise ValueError("truncated DQT")
                if (pq_tq & 0x0F) == 0:
                    return list(body[off + 1:off + 65])
                off += 65
        pos += seg_len


def multimodal_jpeg_quality_estimate(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """JPEG QUALITY-FACTOR ESTIMATION from bytes alone — the curation
    signal image pipelines use to drop or down-weight heavily-recompressed
    images (the tactic behind identify-style "estimated quality"): plant
    real baseline JPEGs whose DQT is the IJG-scaled Annex-K luminance
    table at QF = {base} + doc_id % {mod}, then in the Arrow kernel parse
    the DQT back with a marker walk, regenerate all 100 candidate IJG
    tables, and identify the planted factor by exact table match (in the
    planted range no entry clamps and every candidate is distinct, so the
    inverse is unique — pytest-pinned). Census per estimated QF: image
    count, the parsed table's checksum (the DuckDB oracle REBUILDS the
    IJG scaling arithmetic in SQL and must land on the same sum — the
    cross-engine proof the estimator read real bytes), and the planted
    dimension sums.

    Scale shape: map-only encode + parse in the scan stage; the aggregate
    is one row per distinct QF (≤ {mod})."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(
                        lambda d: _jpegq_encode(int(d))
                    ),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _JPEG_SAMPLE_MOD == _JPEG_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")

    def estimate(batches):
        import pyarrow as pa

        candidates = {
            qf: tuple(
                _ijg_qtable_natural(qf)[u * 8 + v]
                for (u, v) in _JPEG_ZIGZAG
            )
            for qf in range(1, 101)
        }
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            dids, qfs, qsums, ws, hs = [], [], [], [], []
            for d, v in zip(doc_ids, blobs):
                zz = tuple(_jpeg_read_dqt0(v.as_py()))
                est = -1
                for qf, cand in candidates.items():
                    if cand == zz:
                        est = qf
                        break
                wdec, hdec, _px = decode_jpeg(v.as_py())
                dids.append(d.as_py())
                qfs.append(est)
                qsums.append(int(sum(zz)))
                ws.append(wdec)
                hs.append(hdec)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(dids, type=pa.int64()),
                    pa.array(qfs, type=pa.int32()),
                    pa.array(qsums, type=pa.int64()),
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                ],
                names=["doc_id", "qf_est", "qtable_sum", "width", "height"],
            )

    stats = images.mapInArrow(
        estimate,
        "doc_id bigint, qf_est int, qtable_sum bigint, "
        "width int, height int",
    )
    return (
        stats.groupBy("qf_est")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.max("qtable_sum").alias("qtable_sum"),
            F.sum(F.col("width").cast("long")).alias("sum_width"),
            F.sum(F.col("height").cast("long")).alias("sum_height"),
        )
        .orderBy("qf_est")
    )


multimodal_jpeg_quality_estimate.__doc__ = (
    multimodal_jpeg_quality_estimate.__doc__.format(
        base=_QF_BASE, mod=_QF_MOD
    )
)

_JPEGQF_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_QF_BASE} + doc_id % {_QF_MOD} AS qf,
         {_JPEG_W_BASE} + doc_id % {_JPEG_W_MOD} AS w,
         {_JPEG_H_BASE} + doc_id % {_JPEG_H_MOD} AS h
  FROM documents
  WHERE doc_id % {_JPEG_SAMPLE_MOD} = {_JPEG_SAMPLE_RES}
),
base(b) AS (VALUES {", ".join(f"({b})" for b in _IJG_BASE_LUMA)}),
qsum AS (
  SELECT d.qf,
         SUM(GREATEST(1, LEAST(255,
             (b.b * (CASE WHEN d.qf < 50 THEN 5000 // d.qf
                          ELSE 200 - 2 * d.qf END) + 50) // 100
         ))) AS qtable_sum
  FROM (SELECT DISTINCT qf FROM docs) d CROSS JOIN base b
  GROUP BY d.qf
)
SELECT CAST(d.qf AS INTEGER) AS qf_est,
       COUNT(*) AS n_images,
       CAST(q.qtable_sum AS BIGINT) AS qtable_sum,
       CAST(SUM(d.w) AS BIGINT) AS sum_width,
       CAST(SUM(d.h) AS BIGINT) AS sum_height
FROM docs d JOIN qsum q ON q.qf = d.qf
GROUP BY d.qf, q.qtable_sum
ORDER BY qf_est
"""


# --------------------------------------------------------------------------
# EXIF / APP1 metadata census (r15): the metadata layer of the
# image-curation story — marker-walk to APP1, parse the TIFF container
# BOTH-endian, and census orientation / dimensions / timestamps. Parity
# target: the metadata pass crawl pipelines run before any decode
# (reference capability class: binary-source scan + typed extraction,
# /root/reference/spark-groupby-analysis.md). Public layout per the Exif
# 2.3 / TIFF 6.0 specs.
# --------------------------------------------------------------------------

_EXIF_SAMPLE_RES = 3          # doc_id % 5 == 3 (gray=1, color=2, GIF=0)
#: IFD0 value area starts after header(8) + count(2) + 5 entries(60) +
#: next-IFD pointer(4) = 74 bytes into the TIFF blob.
_EXIF_VALUE_AREA = 74


def _exif_dt_string(doc_id: int) -> str:
    """The planted ``YYYY:MM:DD HH:MM:SS`` timestamp (19 chars), all six
    fields doc-derived so min/max/distinct censuses have real spread."""
    return (
        f"{2020 + doc_id % 6:04d}:{1 + doc_id % 12:02d}:"
        f"{1 + doc_id % 28:02d} {doc_id % 24:02d}:"
        f"{doc_id % 60:02d}:{doc_id % 60:02d}"
    )


def _exif_app1(doc_id: int) -> bytes:
    """Build the APP1 Exif segment: ``Exif\0\0`` + a TIFF blob whose
    byte order ALTERNATES by doc parity (``II`` little-endian for even
    ids, ``MM`` big-endian for odd — both-endian parsing is exercised on
    every run), carrying IFD0 with five spec-layout entries sorted by
    tag: ImageWidth (0x0100 SHORT), ImageLength (0x0101 SHORT), Make
    (0x010F ASCII, value-area offset), Orientation (0x0112 SHORT),
    DateTime (0x0132 ASCII[20], value-area offset). The Make string's
    length varies with ``doc_id % 4`` and the value area is even-padded
    per TIFF 6.0, so the DateTime entry's stored OFFSET is doc-varying
    byte arithmetic the DuckDB oracle replays exactly."""
    import struct

    bo = "<" if doc_id % 2 == 0 else ">"
    w = _JPEG_W_BASE + doc_id % _JPEG_W_MOD
    h = _JPEG_H_BASE + doc_id % _JPEG_H_MOD
    orient = 1 + doc_id % 8
    make = ("CAM" + "X" * (doc_id % 4)).encode() + b"\x00"
    make_padded = make + b"\x00" * (len(make) % 2)
    dt = _exif_dt_string(doc_id).encode() + b"\x00"
    assert len(dt) == 20
    dt_off = _EXIF_VALUE_AREA + len(make_padded)

    def short_entry(tag: int, val: int) -> bytes:
        # TIFF 6.0: values <= 4 bytes live LEFT-justified in the field
        return struct.pack(bo + "HHIH", tag, 3, 1, val) + b"\x00\x00"

    def ascii_entry(tag: int, count: int, off: int) -> bytes:
        return struct.pack(bo + "HHII", tag, 2, count, off)

    ifd = (
        struct.pack(bo + "H", 5)
        + short_entry(0x0100, w)
        + short_entry(0x0101, h)
        + ascii_entry(0x010F, len(make), _EXIF_VALUE_AREA)
        + short_entry(0x0112, orient)
        + ascii_entry(0x0132, 20, dt_off)
        + struct.pack(bo + "I", 0)
    )
    tiff = (
        (b"II" if bo == "<" else b"MM")
        + struct.pack(bo + "H", 42)
        + struct.pack(bo + "I", 8)
        + ifd
        + make_padded
        + dt
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def _exif_encode(doc_id: int) -> bytes:
    """A real baseline JPEG (the standard grayscale plant) with the APP1
    Exif segment spliced immediately after SOI, where the Exif spec puts
    it."""
    base = _jpeg_encode(doc_id)
    return base[:2] + _exif_app1(doc_id) + base[2:]


def _exif_parse(data: bytes) -> dict:
    """Marker-walk to the APP1 Exif segment and parse the TIFF container:
    endianness from the ``II``/``MM`` header, magic 42, IFD0 entry walk
    with left-justified inline SHORTs and value-area offsets for ASCII
    values. Returns the logical fields plus the RAW byte facts the oracle
    replays (the DateTime entry's stored offset, the APP1 segment length
    field). Raises ``ValueError`` loudly on malformed streams — truncated
    segments, bad byte-order marker, bad magic, out-of-bounds offsets,
    unterminated ASCII values."""
    import struct

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos, tiff, app1_len = 2, None, -1
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG stream (no Exif APP1)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected a marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD9, 0xDA):
            raise ValueError("no Exif APP1 segment before scan data")
        (seg_len,) = struct.unpack_from(">H", data, pos)
        if pos + seg_len > len(data):
            raise ValueError("truncated segment")
        if marker == 0xE1 and data[pos + 2:pos + 8] == b"Exif\x00\x00":
            tiff = data[pos + 8:pos + seg_len]
            app1_len = seg_len
            break
        pos += seg_len
    if len(tiff) < 8:
        raise ValueError("truncated TIFF header")
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"bad TIFF byte-order marker: {tiff[:2]!r}")
    if struct.unpack_from(bo + "H", tiff, 2)[0] != 42:
        raise ValueError("bad TIFF magic (expected 42)")
    (ifd_off,) = struct.unpack_from(bo + "I", tiff, 4)
    if ifd_off + 2 > len(tiff):
        raise ValueError("IFD0 offset out of bounds")
    (n_entries,) = struct.unpack_from(bo + "H", tiff, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(tiff):
        raise ValueError("truncated IFD0 entry table")
    out = {"byte_order": tiff[:2].decode(), "app1_len": app1_len}

    def ascii_at(off: int, count: int) -> str:
        if off + count > len(tiff):
            raise ValueError("ASCII value offset out of bounds")
        raw = tiff[off:off + count]
        if not raw.endswith(b"\x00"):
            raise ValueError("unterminated ASCII value")
        return raw[:-1].decode()

    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", tiff, at)
        if tag == 0x0100 and typ == 3:
            out["width"] = struct.unpack_from(bo + "H", tiff, at + 8)[0]
        elif tag == 0x0101 and typ == 3:
            out["height"] = struct.unpack_from(bo + "H", tiff, at + 8)[0]
        elif tag == 0x0112 and typ == 3:
            out["orientation"] = struct.unpack_from(
                bo + "H", tiff, at + 8
            )[0]
        elif tag == 0x010F and typ == 2:
            (off,) = struct.unpack_from(bo + "I", tiff, at + 8)
            out["make"] = ascii_at(off, count)
        elif tag == 0x0132 and typ == 2:
            (off,) = struct.unpack_from(bo + "I", tiff, at + 8)
            out["dt"] = ascii_at(off, count)
            out["dt_offset"] = off
    missing = {"width", "height", "orientation", "make", "dt"} - set(out)
    if missing:
        raise ValueError(f"IFD0 missing expected tags: {sorted(missing)}")
    return out


def multimodal_exif_metadata_census(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """EXIF/APP1 METADATA CENSUS — the metadata pass an image-curation
    pipeline runs before any pixel work (orientation fixing, dimension
    sanity, capture-time dedup windows): plant real baseline JPEGs
    carrying an APP1 Exif segment (TIFF container, byte order alternating
    ``II``/``MM`` by doc parity), then in the Arrow kernel marker-walk to
    APP1 and parse IFD0 — orientation, Exif dimensions, Make, DateTime —
    plus the RAW byte facts (the DateTime entry's stored value-area
    offset, the APP1 segment length). Census per orientation: image and
    little-endian counts, dimension sums, the offset/length sums (the
    DuckDB oracle REPLAYS the TIFF value-area offset arithmetic
    byte-exactly — proof the kernel read real bytes, the
    jpeg-quality-estimate pattern), capture-time min/max and distinct
    years.

    Scale shape: map-only encode + parse in the scan stage; the aggregate
    is one row per orientation (<= 8)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(
                        lambda d: _exif_encode(int(d))
                    ),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _JPEG_SAMPLE_MOD == _EXIF_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")

    def parse(batches):
        import pyarrow as pa

        for b in batches:
            blobs = b.column(b.schema.get_field_index("media"))
            cols = {k: [] for k in (
                "byte_order", "orientation", "width", "height",
                "year", "dt", "dt_offset", "app1_len",
            )}
            for v in blobs:
                m = _exif_parse(v.as_py())
                cols["byte_order"].append(m["byte_order"])
                cols["orientation"].append(m["orientation"])
                cols["width"].append(m["width"])
                cols["height"].append(m["height"])
                cols["year"].append(int(m["dt"][:4]))
                cols["dt"].append(m["dt"])
                cols["dt_offset"].append(m["dt_offset"])
                cols["app1_len"].append(m["app1_len"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols["byte_order"], type=pa.string()),
                    pa.array(cols["orientation"], type=pa.int32()),
                    pa.array(cols["width"], type=pa.int32()),
                    pa.array(cols["height"], type=pa.int32()),
                    pa.array(cols["year"], type=pa.int32()),
                    pa.array(cols["dt"], type=pa.string()),
                    pa.array(cols["dt_offset"], type=pa.int64()),
                    pa.array(cols["app1_len"], type=pa.int64()),
                ],
                names=[
                    "byte_order", "orientation", "width", "height",
                    "year", "dt", "dt_offset", "app1_len",
                ],
            )

    meta = images.mapInArrow(
        parse,
        "byte_order string, orientation int, width int, height int, "
        "year int, dt string, dt_offset bigint, app1_len bigint",
    )
    return (
        meta.groupBy("orientation")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum((F.col("byte_order") == "II").cast("long")).alias(
                "n_little_endian"
            ),
            F.sum(F.col("width").cast("long")).alias("sum_width"),
            F.sum(F.col("height").cast("long")).alias("sum_height"),
            F.sum("dt_offset").alias("dt_offset_sum"),
            F.sum("app1_len").alias("app1_len_sum"),
            F.countDistinct("year").alias("n_years"),
            F.min("dt").alias("min_dt"),
            F.max("dt").alias("max_dt"),
        )
        .orderBy("orientation")
    )


_EXIF_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         1 + doc_id % 8 AS orientation,
         {_JPEG_W_BASE} + doc_id % {_JPEG_W_MOD} AS w,
         {_JPEG_H_BASE} + doc_id % {_JPEG_H_MOD} AS h,
         -- TIFF value-area arithmetic, byte-exact: Make is
         -- 'CAM' + (doc_id mod 4) X's + NUL, even-padded, so DateTime's
         -- stored offset is {_EXIF_VALUE_AREA} + padded length
         {_EXIF_VALUE_AREA} + 2 * ((5 + doc_id % 4) // 2) AS dt_offset,
         -- APP1 length field = 2 (itself) + 6 (Exif id) + TIFF bytes
         -- (value area + padded Make + 20-byte DateTime)
         2 + 6 + {_EXIF_VALUE_AREA} + 2 * ((5 + doc_id % 4) // 2) + 20
           AS app1_len,
         2020 + doc_id % 6 AS year,
         printf('%04d:%02d:%02d %02d:%02d:%02d',
                2020 + doc_id % 6, 1 + doc_id % 12, 1 + doc_id % 28,
                doc_id % 24, doc_id % 60, doc_id % 60) AS dt
  FROM documents
  WHERE doc_id % {_JPEG_SAMPLE_MOD} = {_EXIF_SAMPLE_RES}
)
SELECT CAST(orientation AS INTEGER) AS orientation,
       COUNT(*) AS n_images,
       CAST(count_if(doc_id % 2 = 0) AS BIGINT) AS n_little_endian,
       CAST(SUM(w) AS BIGINT) AS sum_width,
       CAST(SUM(h) AS BIGINT) AS sum_height,
       CAST(SUM(dt_offset) AS BIGINT) AS dt_offset_sum,
       CAST(SUM(app1_len) AS BIGINT) AS app1_len_sum,
       CAST(COUNT(DISTINCT year) AS BIGINT) AS n_years,
       MIN(dt) AS min_dt,
       MAX(dt) AS max_dt
FROM docs
GROUP BY orientation
ORDER BY orientation
"""


# --------------------------------------------------------------------------
# EXIF orientation normalization (r15): the pixel half of the EXIF story
# — decode the stored image, read the orientation tag, and upright the
# pixels with the standard 8-case coordinate map (identity, mirrors,
# 180/90/270 rotations, transpose/transverse). The census carries an
# arrangement-SENSITIVE positional checksum so a wrong (or skipped)
# transform diverges even though the pixel SUM is invariant.
# --------------------------------------------------------------------------

#: (x', y') -> (x, y) source-coordinate map per EXIF orientation o, on a
#: stored w×h image; orientations 5-8 swap output dims to (h, w). Shared
#: definitionally by the kernel (fancy indexing) and the oracle (CASE
#: expressions) — the map IS the spec of "upright".
_EXIF_ORIENT_MAP = {
    1: lambda w, h, xo, yo: (xo, yo),
    2: lambda w, h, xo, yo: (w - 1 - xo, yo),
    3: lambda w, h, xo, yo: (w - 1 - xo, h - 1 - yo),
    4: lambda w, h, xo, yo: (xo, h - 1 - yo),
    5: lambda w, h, xo, yo: (yo, xo),
    6: lambda w, h, xo, yo: (yo, h - 1 - xo),
    7: lambda w, h, xo, yo: (w - 1 - yo, h - 1 - xo),
    8: lambda w, h, xo, yo: (w - 1 - yo, xo),
}


def _exif_upright(px, orientation: int):
    """Upright an (h, w) pixel array per the orientation tag using the
    shared coordinate map (vectorized fancy indexing, no np.rot90 — the
    map is the single source of truth)."""
    import numpy as np

    h, w = px.shape
    if orientation not in _EXIF_ORIENT_MAP:
        raise ValueError(f"invalid EXIF orientation {orientation}")
    ow, oh = (w, h) if orientation <= 4 else (h, w)
    xo, yo = np.meshgrid(np.arange(ow), np.arange(oh))
    x, y = _EXIF_ORIENT_MAP[orientation](w, h, xo, yo)
    return px[y, x]


def multimodal_exif_orientation_normalize(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """EXIF ORIENTATION NORMALIZATION — what an image pipeline does with
    the orientation tag: decode the planted EXIF-bearing JPEGs (every one
    of the 8 orientations occurs by construction), apply the standard
    upright coordinate map, and census per orientation: output dims
    (swapped for 5-8), the transform-invariant pixel sum, the
    arrangement-SENSITIVE positional checksum ``Σ p(x',y')·(y'·out_w +
    x' + 1)``, and both extreme corners of the uprighted image. The
    DuckDB oracle replays the planted pixel formula AT THE MAPPED SOURCE
    COORDINATES — a wrong case branch, a flipped axis, or a skipped
    transform all diverge the checksum.

    Scale shape: map-only decode + remap; one row per orientation."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(
                        lambda d: _exif_encode(int(d))
                    ),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _JPEG_SAMPLE_MOD == _EXIF_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")

    def normalize(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            blobs = b.column(b.schema.get_field_index("media"))
            orients, ows, ohs, sums, poss, c00, cll = (
                [], [], [], [], [], [], []
            )
            for v in blobs:
                raw = v.as_py()
                o = _exif_parse(raw)["orientation"]
                _w, _h, px = decode_jpeg(raw)
                up = _exif_upright(px.astype(np.int64), o)
                oh, ow = up.shape
                pos = np.arange(1, oh * ow + 1).reshape(oh, ow)
                orients.append(o)
                ows.append(ow)
                ohs.append(oh)
                sums.append(int(up.sum()))
                poss.append(int((up * pos).sum()))
                c00.append(int(up[0, 0]))
                cll.append(int(up[-1, -1]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(orients, type=pa.int32()),
                    pa.array(ows, type=pa.int32()),
                    pa.array(ohs, type=pa.int32()),
                    pa.array(sums, type=pa.int64()),
                    pa.array(poss, type=pa.int64()),
                    pa.array(c00, type=pa.int64()),
                    pa.array(cll, type=pa.int64()),
                ],
                names=["orientation", "out_w", "out_h", "px_sum",
                       "pos_checksum", "corner00", "corner_last"],
            )

    stats = images.mapInArrow(
        normalize,
        "orientation int, out_w int, out_h int, px_sum bigint, "
        "pos_checksum bigint, corner00 bigint, corner_last bigint",
    )
    return (
        stats.groupBy("orientation")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.col("out_w").cast("long")).alias("sum_out_w"),
            F.sum(F.col("out_h").cast("long")).alias("sum_out_h"),
            F.sum("px_sum").alias("px_sum"),
            F.sum("pos_checksum").alias("pos_checksum"),
            F.sum("corner00").alias("corner00_sum"),
            F.sum("corner_last").alias("corner_last_sum"),
        )
        .orderBy("orientation")
    )


def _exif_orient_sql() -> str:
    # the planted-pixel closed form f(doc_id, x, y) — identical to the
    # decode oracle's vals expression
    f = """128
         + 2 * ((doc_id + 5 * (sx // 8) + 3 * (sy // 8)) % 32 - 16)
         + ((doc_id + (sx // 8)) % 7 - 3)
             * (CASE WHEN (sx % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
         + ((doc_id + (sy // 8)) % 5 - 2)
             * (CASE WHEN (sy % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
         + ((doc_id + (sx // 8) + (sy // 8)) % 9 - 4)
             * (CASE WHEN (sx % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
             * (CASE WHEN (sy % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)"""
    return f"""
WITH docs AS (
  SELECT doc_id,
         1 + doc_id % 8 AS o,
         {_JPEG_W_BASE} + doc_id % {_JPEG_W_MOD} AS w,
         {_JPEG_H_BASE} + doc_id % {_JPEG_H_MOD} AS h
  FROM documents
  WHERE doc_id % {_JPEG_SAMPLE_MOD} = {_EXIF_SAMPLE_RES}
),
dims AS (
  SELECT doc_id, o, w, h,
         CASE WHEN o <= 4 THEN w ELSE h END AS ow,
         CASE WHEN o <= 4 THEN h ELSE w END AS oh
  FROM docs
),
px AS (
  SELECT d.*, gx.xo, gy.yo
  FROM dims d
  JOIN (SELECT unnest(generate_series(0,
          {max(_JPEG_W_BASE + _JPEG_W_MOD, _JPEG_H_BASE + _JPEG_H_MOD) - 2}
        )) AS xo) gx ON gx.xo < d.ow
  JOIN (SELECT unnest(generate_series(0,
          {max(_JPEG_W_BASE + _JPEG_W_MOD, _JPEG_H_BASE + _JPEG_H_MOD) - 2}
        )) AS yo) gy ON gy.yo < d.oh
),
mapped AS (
  SELECT doc_id, o, ow, oh, xo, yo,
         CASE o WHEN 1 THEN xo          WHEN 2 THEN w - 1 - xo
                WHEN 3 THEN w - 1 - xo  WHEN 4 THEN xo
                WHEN 5 THEN yo          WHEN 6 THEN yo
                WHEN 7 THEN w - 1 - yo  WHEN 8 THEN w - 1 - yo END AS sx,
         CASE o WHEN 1 THEN yo          WHEN 2 THEN yo
                WHEN 3 THEN h - 1 - yo  WHEN 4 THEN h - 1 - yo
                WHEN 5 THEN xo          WHEN 6 THEN h - 1 - xo
                WHEN 7 THEN h - 1 - xo  WHEN 8 THEN xo END AS sy
  FROM px
),
vals AS (
  SELECT doc_id, o, ow, oh, xo, yo,
         {f} AS p
  FROM mapped
)
SELECT CAST(o AS INTEGER) AS orientation,
       COUNT(DISTINCT doc_id) AS n_images,
       CAST(SUM(CASE WHEN xo = 0 AND yo = 0 THEN ow ELSE 0 END) AS BIGINT)
         AS sum_out_w,
       CAST(SUM(CASE WHEN xo = 0 AND yo = 0 THEN oh ELSE 0 END) AS BIGINT)
         AS sum_out_h,
       CAST(SUM(p) AS BIGINT) AS px_sum,
       CAST(SUM(p * (yo * ow + xo + 1)) AS BIGINT) AS pos_checksum,
       CAST(SUM(CASE WHEN xo = 0 AND yo = 0 THEN p ELSE 0 END) AS BIGINT)
         AS corner00_sum,
       CAST(SUM(CASE WHEN xo = ow - 1 AND yo = oh - 1 THEN p ELSE 0 END)
            AS BIGINT) AS corner_last_sum
FROM vals
GROUP BY o
ORDER BY orientation
"""


# --------------------------------------------------------------------------
# DC-only 1/8-scale thumbnail decode (r15): libjpeg's DCT-scaling fast
# path — entropy-decode every block (the bitstream must be walked
# anyway) but reconstruct ONLY the DC coefficient: one pixel per 8×8
# block, no dequant table application beyond DC, no IDCT. The thumbnail
# serving path every image pipeline runs before deciding to full-decode.
# --------------------------------------------------------------------------


def decode_jpeg_dc(data: bytes):
    """Decode a baseline GRAYSCALE JFIF at scale 1/8: full marker walk +
    Huffman entropy decode (ACs are consumed to keep bit position, then
    discarded), DC prediction, and the DC-only IDCT identity
    ``pixel = clamp(dc_quant·qstep/8 + 128)`` — one pixel per block.
    Returns ``(tw, th, thumb)`` with ``thumb`` a (th, tw) int64 ndarray
    of ceil(w/8)×ceil(h/8) pixels. Raises ``ValueError`` loudly on
    malformed or non-grayscale-baseline streams (the color path has its
    own full decoder; the thumbnail op only plants gray)."""
    import struct

    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qdc: dict[int, int] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    dc_id = ac_id = q_id = None
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG stream (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected a marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before any scan data")
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:
            o = 0
            while o < len(seg):
                if seg[o] >> 4 != 0:
                    raise ValueError("16-bit DQT unsupported")
                if o + 65 > len(seg):
                    raise ValueError("truncated DQT")
                qdc[seg[o] & 15] = seg[o + 1]  # zigzag[0] IS the DC step
                o += 65
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or ncomp != 1:
                raise ValueError("DC thumbnail path is grayscale-only")
            if w == 0 or h == 0:
                raise ValueError("empty image")
            q_id = seg[8]
        elif marker == 0xC4:
            o = 0
            while o < len(seg):
                tc, th_ = seg[o] >> 4, seg[o] & 15
                counts = seg[o + 1:o + 17]
                syms = seg[o + 17:o + 17 + sum(counts)]
                if len(counts) != 16 or len(syms) != sum(counts):
                    raise ValueError("truncated DHT")
                table: dict[tuple[int, int], int] = {}
                code, i = 0, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[i]
                        i += 1
                        code += 1
                    code <<= 1
                huff[(tc, th_)] = table
                o += 17 + len(syms)
        elif marker == 0xDA:
            if seg[0] != 1 or w is None:
                raise ValueError("single-component scan expected")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 15
            pos += seg_len
            break
        elif 0xE0 <= marker <= 0xEF or marker == 0xFE:
            pass
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        else:
            raise ValueError(f"unsupported marker 0xff{marker:02x}")
        pos += seg_len
    if q_id not in qdc or (0, dc_id) not in huff or (1, ac_id) not in huff:
        raise ValueError("missing DQT/DHT tables for the scan")
    body = bytearray()
    i = pos
    end_marker = None
    while i < len(data):
        if data[i] == 0xFF:
            if data[i + 1:i + 2] == b"\x00":
                body.append(0xFF)
                i += 2
                continue
            end_marker = data[i + 1] if i + 1 < len(data) else None
            break
        body.append(data[i])
        i += 1
    if end_marker != 0xD9:
        raise ValueError("scan not terminated by EOI")
    nbits, bitpos = len(body) * 8, 0

    def read_bits(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            raise ValueError("truncated entropy-coded segment")
        v = 0
        for _ in range(width):
            v = (v << 1) | ((body[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    def read_huff(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | read_bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def extend(v: int, t: int) -> int:
        return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

    tw, th = (w + 7) // 8, (h + 7) // 8
    thumb = np.zeros((th, tw), np.int64)
    pred = 0
    qstep = qdc[q_id]
    for by in range(th):
        for bx in range(tw):
            t = read_huff(huff[(0, dc_id)])
            pred += extend(read_bits(t), t)
            # consume (and discard) the ACs to keep the bit position
            k = 1
            while k < 64:
                sym = read_huff(huff[(1, ac_id)])
                if sym == 0x00:     # EOB
                    break
                run, size = sym >> 4, sym & 15
                if size == 0 and run != 15:
                    raise ValueError("invalid AC symbol")
                k += run + 1
                if size:
                    read_bits(size)
                k += 0 if size else 0
            # DC-only IDCT: every pixel of the block is dc·qstep/8 + 128;
            # planted DC steps are multiples of 8 so this is exact here,
            # and we round half-AWAY-from-zero (sign-symmetric integer
            # form) like the full decoder's clamp path
            val = pred * qstep
            mag = (abs(val) + 4) // 8
            pix = (mag if val >= 0 else -mag) + 128
            thumb[by, bx] = min(255, max(0, pix))
    return tw, th, thumb


def multimodal_jpeg_dc_thumbnail(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """1/8-SCALE THUMBNAIL CENSUS via DC-only decode — the first pass of
    every image-triage pipeline (libjpeg ``scale_denom=8``): the entropy
    stream is fully walked (DC prediction needs every block) but no
    dequant/IDCT runs; one pixel per 8×8 block. Census per thumbnail
    shape: image count, exact thumb pixel sum, an arrangement-sensitive
    positional checksum, and the corner pixel sums — the oracle replays
    the planted DC lattice ``128 + 2·((doc_id + 5bx + 3by) mod 32 − 16)``
    per block, so a DC-prediction slip in ANY block diverges it."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(
                        lambda d: _jpeg_encode(int(d))
                    ),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _JPEG_SAMPLE_MOD == _JPEG_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            blobs = b.column(b.schema.get_field_index("media"))
            tws, ths, sums, poss, c00 = [], [], [], [], []
            for v in blobs:
                tw, th, thumb = decode_jpeg_dc(v.as_py())
                pos = np.arange(1, th * tw + 1).reshape(th, tw)
                tws.append(tw)
                ths.append(th)
                sums.append(int(thumb.sum()))
                poss.append(int((thumb * pos).sum()))
                c00.append(int(thumb[0, 0]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(tws, type=pa.int32()),
                    pa.array(ths, type=pa.int32()),
                    pa.array(sums, type=pa.int64()),
                    pa.array(poss, type=pa.int64()),
                    pa.array(c00, type=pa.int64()),
                ],
                names=["tw", "th", "px_sum", "pos_checksum", "corner00"],
            )

    stats = images.mapInArrow(
        kernel,
        "tw int, th int, px_sum bigint, pos_checksum bigint, "
        "corner00 bigint",
    )
    return (
        stats.groupBy("tw", "th")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("px_sum").alias("px_sum"),
            F.sum("pos_checksum").alias("pos_checksum"),
            F.sum("corner00").alias("corner00_sum"),
        )
        .orderBy("tw", "th")
    )


_JPEG_DC_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         ({_JPEG_W_BASE} + doc_id % {_JPEG_W_MOD} + 7) // 8 AS tw,
         ({_JPEG_H_BASE} + doc_id % {_JPEG_H_MOD} + 7) // 8 AS th
  FROM documents WHERE doc_id % {_JPEG_SAMPLE_MOD} = {_JPEG_SAMPLE_RES}
),
blocks AS (
  SELECT d.doc_id, d.tw, d.th, gx.bx, gy.by,
         128 + 2 * ((d.doc_id + 5 * gx.bx + 3 * gy.by) % 32 - 16) AS p
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, 3)) AS bx) gx ON gx.bx < d.tw
  JOIN (SELECT unnest(generate_series(0, 2)) AS by) gy ON gy.by < d.th
)
SELECT CAST(tw AS INTEGER) AS tw,
       CAST(th AS INTEGER) AS th,
       COUNT(DISTINCT doc_id) AS n_images,
       CAST(SUM(p) AS BIGINT) AS px_sum,
       CAST(SUM(p * (by * tw + bx + 1)) AS BIGINT) AS pos_checksum,
       CAST(SUM(CASE WHEN bx = 0 AND by = 0 THEN p ELSE 0 END) AS BIGINT)
         AS corner00_sum
FROM blocks
GROUP BY tw, th
ORDER BY tw, th
"""


# --------------------------------------------------------------------------
# Color JPEG decode (YCbCr 4:2:0, interleaved MCUs) — the dominant web
# image shape, on top of the grayscale baseline machinery
# --------------------------------------------------------------------------

_JPEGC_W_BASE, _JPEGC_W_MOD = 16, 9   # width  = 16 + doc_id % 9 — 16..24
_JPEGC_H_BASE, _JPEGC_H_MOD = 16, 7   # height = 16 + doc_id % 7 — 16..22
_JPEGC_SAMPLE_MOD = 5                 # plant 1-in-5 docs as color JPEGs
_JPEGC_SAMPLE_RES = 2                 # (disjoint from gray %5=1, GIF %5=0)

#: Chroma DC quantizer — deliberately DIFFERENT from the luma table's 16 so
#: a decoder that routes the wrong quant table to a component diverges.
_JPEGC_CHROMA_QDC = 24


def _jpegc_chroma_dc(doc_id: int, mx: int, my: int) -> tuple[int, int]:
    """Planted quantized chroma DC per MCU (the only nonzero chroma
    coefficients): values in {-8,-4,0,4,8}, i.e. Cb'/Cr' offsets in
    {-24,-12,0,12,24} after ×{qdc}/8 — chosen so every YCbCr→RGB rounding
    lands ≥ 0.028 away from a .5 boundary (pinned by pytest), making the
    float conversion exactly replayable in integer-driven SQL."""
    cb = 4 * ((doc_id + mx + 2 * my) % 5 - 2)
    cr = 4 * ((doc_id + 2 * mx + my) % 5 - 2)
    return cb, cr


def _jpegc_qtable_chroma() -> list[int]:
    """Chroma quantization table in zigzag order (DC = {qdc}, the rest
    arbitrary valid steps — chroma ACs are planted zero)."""
    return [
        _JPEGC_CHROMA_QDC if (u, v) == (0, 0) else 7 + u + v
        for (u, v) in _JPEG_ZIGZAG
    ]


#: Chroma DC sizes 0..5 (diffs span ±16); chroma AC table is EOB-only.
_JPEGC_CDC_SYMBOLS = tuple(range(6))
_JPEGC_CDC_LENGTHS = (3,) * 6
_JPEGC_CAC_SYMBOLS = (0x00,)
_JPEGC_CAC_LENGTHS = (1,)


def _jpegc_encode(doc_id: int) -> bytes:
    """Build a real baseline COLOR JFIF: 4:2:0 subsampling (Y 2×2, Cb/Cr
    1×1), two DQT tables in ONE segment, four Huffman tables in ONE DHT
    segment (DC/AC × luma/chroma), and an interleaved MCU scan
    (Y00 Y01 Y10 Y11 Cb Cr per MCU) with per-component DC predictors. The
    luma blocks carry the grayscale coefficient lattice at global block
    coordinates; chroma blocks are DC-only (flat per MCU)."""
    import struct

    w = _JPEGC_W_BASE + doc_id % _JPEGC_W_MOD
    h = _JPEGC_H_BASE + doc_id % _JPEGC_H_MOD
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += (
        b"\xff\xdb" + struct.pack(">H", 2 + 65 * 2)
        + b"\x00" + bytes(_jpeg_qtable())
        + b"\x01" + bytes(_jpegc_qtable_chroma())
    )
    out += (
        b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    )

    def dht_payload(tc_th, symbols, lengths):
        counts = [0] * 16
        for length in lengths:
            counts[length - 1] += 1
        return bytes([tc_th]) + bytes(counts) + bytes(symbols)

    dht = (
        dht_payload(0x00, _JPEG_DC_SYMBOLS, _JPEG_DC_LENGTHS)
        + dht_payload(0x10, _JPEG_AC_SYMBOLS, _JPEG_AC_LENGTHS)
        + dht_payload(0x01, _JPEGC_CDC_SYMBOLS, _JPEGC_CDC_LENGTHS)
        + dht_payload(0x11, _JPEGC_CAC_SYMBOLS, _JPEGC_CAC_LENGTHS)
    )
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    out += (
        b"\xff\xda" + struct.pack(">HB", 12, 3)
        + b"\x01\x00" + b"\x02\x11" + b"\x03\x11" + b"\x00\x3f\x00"
    )

    dc_codes = _jpeg_canonical(_JPEG_DC_SYMBOLS, _JPEG_DC_LENGTHS)
    ac_codes = _jpeg_canonical(_JPEG_AC_SYMBOLS, _JPEG_AC_LENGTHS)
    cdc_codes = _jpeg_canonical(_JPEGC_CDC_SYMBOLS, _JPEGC_CDC_LENGTHS)
    cac_codes = _jpeg_canonical(_JPEGC_CAC_SYMBOLS, _JPEGC_CAC_LENGTHS)
    wtr = _JpegBitWriter()

    def put_dc(diff, codes):
        size = abs(diff).bit_length()
        wtr.put(*codes[size])
        if size:
            wtr.put(diff if diff > 0 else diff + (1 << size) - 1, size)

    def put_luma_block(bx, by, pred):
        co = _jpeg_coeffs(doc_id, bx, by)
        put_dc(co[(0, 0)] - pred, dc_codes)
        run = 0
        for k in range(1, 64):
            v = co.get(_JPEG_ZIGZAG[k], 0)
            if v == 0:
                run += 1
                continue
            while run >= 16:
                wtr.put(*ac_codes[0xF0])
                run -= 16
            size = abs(v).bit_length()
            wtr.put(*ac_codes[(run << 4) | size])
            wtr.put(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            wtr.put(*ac_codes[0x00])
        return co[(0, 0)]

    mcus_x = (w + 15) // 16
    mcus_y = (h + 15) // 16
    pred_y = pred_cb = pred_cr = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for iy in range(2):
                for ix in range(2):
                    pred_y = put_luma_block(2 * mx + ix, 2 * my + iy, pred_y)
            cb, cr = _jpegc_chroma_dc(doc_id, mx, my)
            put_dc(cb - pred_cb, cdc_codes)
            wtr.put(*cac_codes[0x00])  # EOB — chroma ACs all zero
            pred_cb = cb
            put_dc(cr - pred_cr, cdc_codes)
            wtr.put(*cac_codes[0x00])
            pred_cr = cr
    out += wtr.finish()
    out += b"\xff\xd9"
    return bytes(out)


#: Output contract of the color JPEG decode kernel.
JPEGC_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, "
    "mid_row_sum_r bigint, mid_col_sum_g bigint"
)


def decode_jpeg_color_stats(images: DataFrame) -> DataFrame:
    """``mapInArrow`` decode kernel for color JFIFs: per-channel exact
    sums plus the middle row's R sum and middle column's G sum (pixel
    order must survive the interleaved MCU scan, chroma upsampling, and
    color conversion in both axes)."""
    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            doc_ids = b.column(b.schema.get_field_index("doc_id"))
            blobs = b.column(b.schema.get_field_index("media"))
            ws, hs, sr, sg, sb, mrow, mcol = [], [], [], [], [], [], []
            for v in blobs:
                w, h, px = decode_jpeg(v.as_py())
                p64 = px.astype("int64")
                ws.append(w)
                hs.append(h)
                sr.append(int(p64[:, :, 0].sum()))
                sg.append(int(p64[:, :, 1].sum()))
                sb.append(int(p64[:, :, 2].sum()))
                mrow.append(int(p64[h // 2, :, 0].sum()))
                mcol.append(int(p64[:, w // 2, 1].sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(ws, type=pa.int32()),
                    pa.array(hs, type=pa.int32()),
                    pa.array(sr, type=pa.int64()),
                    pa.array(sg, type=pa.int64()),
                    pa.array(sb, type=pa.int64()),
                    pa.array(mrow, type=pa.int64()),
                    pa.array(mcol, type=pa.int64()),
                ],
                names=[
                    "doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
                    "mid_row_sum_r", "mid_col_sum_g",
                ],
            )

    return images.mapInArrow(fn, JPEGC_STATS_SCHEMA)


def multimodal_jpeg_color_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR JPEG decode end to end — the dominant web image format in its
    real shape: YCbCr with 4:2:0 chroma subsampling, interleaved MCUs,
    separate luma/chroma quantization and Huffman tables, per-component DC
    prediction, and the JFIF YCbCr→RGB conversion. Luma carries the
    grayscale coefficient lattice (exactly-IDCT-able); chroma is DC-only
    so each 8×8 chroma block is flat and the ×2 upsampling is kernel-
    independent; planted chroma offsets keep every conversion rounding
    ≥ 0.028 from a .5 boundary, so the DuckDB oracle replays every RGB
    pixel exactly — a wrong table routing, MCU interleave order, predictor
    stream, or conversion constant diverges the channel sums.

    Scale shape: map-only until the final tiny groupBy; blobs never
    shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["doc_id"].map(
                        lambda d: _jpegc_encode(int(d))
                    ),
                }
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _JPEGC_SAMPLE_MOD == _JPEGC_SAMPLE_RES)
    )
    images = docs.mapInPandas(build, "doc_id bigint, media binary")
    stats = decode_jpeg_color_stats(images)
    n_px = F.sum(F.col("width").cast("long") * F.col("height"))
    return (
        stats.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("sum_r").alias("sum_r"),
            F.sum("sum_g").alias("sum_g"),
            F.sum("sum_b").alias("sum_b"),
            # div-safe: n_px = planted JPEG width x height, positive
            F.round(
                (F.sum("sum_r") + F.sum("sum_g") + F.sum("sum_b"))
                / (n_px * 3.0),
                4,
            ).alias("avg_brightness"),
            F.sum("mid_row_sum_r").alias("mid_row_sum_r"),
            F.sum("mid_col_sum_g").alias("mid_col_sum_g"),
        )
        .orderBy("width", "height")
    )


_JPEGC_DECODE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         {_JPEGC_W_BASE} + doc_id % {_JPEGC_W_MOD} AS w,
         {_JPEGC_H_BASE} + doc_id % {_JPEGC_H_MOD} AS h
  FROM documents WHERE doc_id % {_JPEGC_SAMPLE_MOD} = {_JPEGC_SAMPLE_RES}
),
px AS (
  SELECT d.doc_id, d.w, d.h, gx.x, gy.y
  FROM docs d
  JOIN (SELECT unnest(generate_series(0, {_JPEGC_W_BASE + _JPEGC_W_MOD - 2})) AS x) gx
    ON gx.x < d.w
  JOIN (SELECT unnest(generate_series(0, {_JPEGC_H_BASE + _JPEGC_H_MOD - 2})) AS y) gy
    ON gy.y < d.h
),
ycc AS (
  SELECT doc_id, w, h, x, y,
         128
         + 2 * ((doc_id + 5 * (x // 8) + 3 * (y // 8)) % 32 - 16)
         + ((doc_id + (x // 8)) % 7 - 3)
             * (CASE WHEN (x % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
         + ((doc_id + (y // 8)) % 5 - 2)
             * (CASE WHEN (y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
         + ((doc_id + (x // 8) + (y // 8)) % 9 - 4)
             * (CASE WHEN (x % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
             * (CASE WHEN (y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
           AS yy,
         -- chroma offsets Cb', Cr': quantized DC × Q({_JPEGC_CHROMA_QDC})/8,
         -- constant per 16×16 MCU (flat DC-only chroma, replicated 2×)
         {_JPEGC_CHROMA_QDC} // 8 * (4 * ((doc_id + (x // 16) + 2 * (y // 16)) % 5 - 2))
           AS cbp,
         {_JPEGC_CHROMA_QDC} // 8 * (4 * ((doc_id + 2 * (x // 16) + (y // 16)) % 5 - 2))
           AS crp
  FROM px
),
vals AS (
  SELECT doc_id, w, h, x, y,
         CAST(ROUND(yy + 1.402 * crp, 0) AS BIGINT) AS r,
         CAST(ROUND(yy - 0.344136 * cbp - 0.714136 * crp, 0) AS BIGINT) AS g,
         CAST(ROUND(yy + 1.772 * cbp, 0) AS BIGINT) AS b
  FROM ycc
)
SELECT CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       COUNT(DISTINCT doc_id) AS n_images,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       -- div-safe: COUNT(*) of a GROUP BY group is >= 1
       ROUND(CAST(SUM(r) + SUM(g) + SUM(b) AS DOUBLE) / (COUNT(*) * 3.0), 4)
         AS avg_brightness,
       CAST(SUM(CASE WHEN y = h // 2 THEN r ELSE 0 END) AS BIGINT)
         AS mid_row_sum_r,
       CAST(SUM(CASE WHEN x = w // 2 THEN g ELSE 0 END) AS BIGINT)
         AS mid_col_sum_g
FROM vals
GROUP BY w, h
ORDER BY width, height
"""


QUERIES = {
    "multimodal_bmp_decode_stats": multimodal_bmp_decode_stats,
    "multimodal_png_decode_stats": multimodal_png_decode_stats,
    "multimodal_png_encode_roundtrip": multimodal_png_encode_roundtrip,
    "multimodal_gif_decode_stats": multimodal_gif_decode_stats,
    "multimodal_jpeg_decode_stats": multimodal_jpeg_decode_stats,
    "multimodal_jpeg_color_stats": multimodal_jpeg_color_stats,
    "multimodal_jpeg_quality_estimate": multimodal_jpeg_quality_estimate,
    "multimodal_jpeg_dc_thumbnail": multimodal_jpeg_dc_thumbnail,
    "multimodal_exif_metadata_census": multimodal_exif_metadata_census,
    "multimodal_exif_orientation_normalize": multimodal_exif_orientation_normalize,
    "multimodal_tar_webdataset_scan": multimodal_tar_webdataset_scan,
    "multimodal_wav_decode_stats": multimodal_wav_decode_stats,
    "audio_peak_normalize_stats": audio_peak_normalize_stats,
    "multimodal_wav_spectrum_stats": multimodal_wav_spectrum_stats,
    "audio_constellation_near_dup": audio_constellation_near_dup,
    "video_fingerprint_near_dup": video_fingerprint_near_dup,
    "audio_mel_filterbank_stats": audio_mel_filterbank_stats,
    "multimodal_resize_bilinear_stats": multimodal_resize_bilinear_stats,
    "audio_resample_linear": audio_resample_linear,
    "audio_vad_segments": audio_vad_segments,
    "multimodal_hist_equalization_stats": multimodal_hist_equalization_stats,
    "multimodal_y4m_scene_cuts": multimodal_y4m_scene_cuts,
    "multimodal_y4m_decode_stats": multimodal_y4m_decode_stats,
    "multimodal_phash_near_dup": multimodal_phash_near_dup,
    "multimodal_chunk_manifest": multimodal_chunk_manifest,
    "multimodal_arrow_features": multimodal_arrow_features,
    "multimodal_media_features": multimodal_media_features,
    "multimodal_frame_samples": multimodal_frame_samples,
    "multimodal_exact_dedup": multimodal_exact_dedup,
}

ORACLES = {
    "multimodal_bmp_decode_stats": _BMP_DECODE_SQL,
    "multimodal_png_decode_stats": _PNG_DECODE_SQL,
    "multimodal_png_encode_roundtrip": _PNG_ENCODE_SQL,
    "multimodal_gif_decode_stats": _GIF_DECODE_SQL,
    "multimodal_jpeg_decode_stats": _JPEG_DECODE_SQL,
    "multimodal_jpeg_color_stats": _JPEGC_DECODE_SQL,
    "multimodal_jpeg_quality_estimate": _JPEGQF_SQL,
    "multimodal_jpeg_dc_thumbnail": _JPEG_DC_SQL,
    "multimodal_exif_metadata_census": _EXIF_SQL,
    "multimodal_exif_orientation_normalize": _exif_orient_sql(),
    "multimodal_tar_webdataset_scan": _TAR_SCAN_SQL,
    "multimodal_wav_decode_stats": _WAV_DECODE_SQL,
    "audio_peak_normalize_stats": _PEAK_NORM_SQL,
    "multimodal_wav_spectrum_stats": _WAV_SPECTRUM_SQL,
    "audio_constellation_near_dup": _CONSTELLATION_SQL,
    "video_fingerprint_near_dup": _VIDEO_NEAR_DUP_SQL,
    "audio_mel_filterbank_stats": _mel_sql(),
    "multimodal_resize_bilinear_stats": _resize_sql(),
    "audio_resample_linear": _RESAMPLE_SQL,
    "audio_vad_segments": _VAD_SQL,
    "multimodal_hist_equalization_stats": _HISTEQ_SQL,
    "multimodal_y4m_scene_cuts": _Y4M_CUTS_SQL,
    "multimodal_y4m_decode_stats": _Y4M_DECODE_SQL,
    "multimodal_phash_near_dup": _PHASH_SQL,
    "multimodal_chunk_manifest": _CHUNK_MANIFEST_SQL,
    "multimodal_arrow_features": _MEDIA_FEATURES_SQL,
    "multimodal_media_features": _MEDIA_FEATURES_SQL,
    "multimodal_frame_samples": _FRAME_SAMPLES_SQL,
    "multimodal_exact_dedup": _media_dedup_oracle(),
}
