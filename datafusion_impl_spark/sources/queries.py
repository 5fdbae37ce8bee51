"""Oracle-checked queries over NON-parquet sources — the source formats the
reference exercises (CSV: ``tests/regexp-tests.rs:14``, ``readme.md:46``)
plus JSON-lines, the one common ingest format that previously had no
``queries()`` entry.

Both are full members of the driver correctness gate:

- the CSV query reads the reference's own golden file and lets DuckDB read
  the SAME file (``read_csv_auto``) — source parity checked end to end, not
  just "the file opens";
- the JSONL query round-trips ``documents`` through a Spark-written
  JSON-lines dataset and aggregates the read-back copy, while the oracle
  computes the same aggregate from the original parquet — any loss in the
  write→read cycle (encoding, null handling, line splitting on embedded
  newlines) shows up as a value mismatch.

Scale notes: JSON scan is Jackson row-at-a-time — 5-10× slower than parquet
and schema inference double-scans, so the reader passes an EXPLICIT schema
(one pass, no inference job) and the write partitions by the session default
(32 files here; at 100 TB the upstream writer's layout). CSV inference is
kept only because matching the reference's ``read_csv`` behavior is the
point of that query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_impl_spark.operators import duck_md5_long, md5_long
from datafusion_impl_spark.sources.registry import load_table, read_csv

__all__ = ["QUERIES", "ORACLES"]

#: The reference's golden CSV (text,expected) — read-only input.
_REF_CSV = "/root/reference/tests/test-data.csv"

#: Where the JSONL round-trip materializes. /tmp, never the read-only
#: testdata tree; keyed by scale-factor directory name so concurrent
#: harnesses at different SFs don't clobber each other.
_JSONL_ROOT = "/tmp/datafusion_impl_spark_jsonl"

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def csv_reference_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with schema inference through the builtin regexp fast path —
    the reference's CSV pipeline (``tests/regexp-tests.rs:14-33``) as an
    oracle-checked query (the reference itself only ``show()``s; its
    ``expected`` column is asserted here by the DuckDB comparison reading
    the same file). sf-independent by design: the source file IS the
    fixture."""
    df = read_csv(spark, _REF_CSV)
    return df.select(
        "text",
        F.col("expected").cast("long").alias("expected"),
        F.regexp_extract("text", r"(\d+)-(\d+)", 1).alias("extracted"),
    ).orderBy("text")


_CSV_GOLDEN_SQL = rf"""
SELECT text,
       CAST(expected AS BIGINT) AS expected,
       regexp_extract(text, '(\d+)-(\d+)', 1) AS extracted
FROM read_csv_auto('{_REF_CSV}')
ORDER BY text
"""


def jsonl_documents_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSON-lines on disk → read back (explicit schema) →
    per-(lang, source) aggregate. The oracle aggregates the ORIGINAL parquet,
    so equality proves the JSONL cycle is lossless — including texts with
    embedded newlines, which the JSON writer escapes to keep one record per
    line."""
    path = os.path.join(_JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "documents")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(_DOCS_SCHEMA).json(path)
    return (
        back.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.length("text")).cast("long").alias("sum_text_len"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
        )
        .orderBy("lang", "source")
    )


_JSONL_ROUNDTRIP_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def orc_lineitem_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem (projected) → ORC on disk → read back → pricing aggregate
    per return flag/status. The oracle aggregates the ORIGINAL parquet, so
    equality proves the ORC cycle preserves values exactly — including
    timestamps (ORC stores its own epoch encoding; a TZ bug here shifts
    l_shipdate and moves rows across the filter boundary) and doubles.
    ORC is columnar with predicate pushdown, so unlike the JSONL case the
    read-back side keeps scan pruning at scale."""
    path = os.path.join(_JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "li_orc")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus", "l_shipdate",
    )
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path).filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(12,4)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * (1 - F.col("l_discount").cast("decimal(12,4)"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.sum("l_orderkey").cast("long").alias("sum_orderkey"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_ORC_ROUNDTRIP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def xml_documents_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → XML on disk (Spark 4's built-in ``xml`` datasource) →
    read back with an explicit schema → per-source aggregate; the oracle
    aggregates the ORIGINAL parquet, so equality proves the XML cycle is
    lossless — entity escaping (&, <, >), embedded newlines, and
    surrounding whitespace (``ignoreSurroundingSpaces=false``: the default
    TRIMS text nodes, which would corrupt documents starting or ending in
    whitespace).

    Scale note: like JSON, XML parsing is row-at-a-time Jackson/StAX — an
    ingest-boundary format, not a compute format. The explicit schema avoids
    the inference double-scan; downstream stages persist to parquet."""
    path = os.path.join(_JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "docs_xml")
    docs = load_table(spark, sf_dir, "documents")
    (
        docs.write.mode("overwrite")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .format("xml")
        .save(path)
    )
    back = (
        spark.read.schema(_DOCS_SCHEMA)
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .format("xml")
        .load(path)
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.length("text")).cast("long").alias("sum_text_len"),
            F.sum(F.length("lang")).cast("long").alias("sum_lang_len"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
        )
        .orderBy("source")
    )


_XML_ROUNDTRIP_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
       CAST(SUM(length(lang)) AS BIGINT) AS sum_lang_len,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents
GROUP BY source
ORDER BY source
"""


_BUCKET_ROOT = "/tmp/datafusion_impl_spark_bucketed"


def compact_small_files_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the table-maintenance operator every
    long-lived 100 TB lake needs (streaming ingest and partitioned writes
    accumulate small files; scan throughput dies by open()/footer overhead).

    Materializes a deliberately over-split 12-file orders layout, then plans
    the compaction RELATIONALLY from per-file stats (`input_file_name()` —
    no driver-side file listing): files ordered by name are bin-packed into
    4 target groups by cumulative row count, and the output is the per-bin
    manifest (file count, rows, exact revenue checksum) a rewrite job would
    execute. At scale the same plan runs per table-partition, each partition's
    file census being a few hundred rows of metadata — the bin-packing window
    runs over an Aggregate output, never over the fact rows.

    The oracle recomputes the identical plan from the files Spark wrote
    (DuckDB ``read_parquet(..., filename=...)``), so file/row/value agreement
    also re-verifies the parquet write path end to end."""
    path = os.path.join(_JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "orders_small")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    orders.repartition(12, F.col("o_orderkey")).write.mode("overwrite").parquet(path)

    from pyspark.sql import Window

    back = spark.read.parquet(path).select(
        F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file"),
        "o_orderkey",
        "o_totalprice",
    )
    per_file = back.groupBy("file").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("price"),
    )
    tot = per_file.agg(F.sum("n_rows").alias("total_rows"))
    # cumulative rows BEFORE each file (files in name order) → start-offset
    # binning into 4 equal-row target groups; windows run over the 12-row
    # file census (bounded: above the per-file Aggregate), not the fact table
    w = Window.orderBy("file").rowsBetween(Window.unboundedPreceding, -1)
    planned = (
        per_file.crossJoin(F.broadcast(tot))
        .withColumn("cum_before", F.coalesce(F.sum("n_rows").over(w), F.lit(0)))
        .withColumn(
            "bin",
            F.floor(F.col("cum_before") * 4 / F.col("total_rows")).cast("int"),
        )
    )
    return (
        planned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.round(F.sum("price").cast("double"), 2).alias("revenue"),
        )
        .orderBy("bin")
    )


def _compact_plan_oracle(sf_tag: str) -> str:
    path = os.path.join(_JSONL_ROOT, sf_tag, "orders_small")
    return f"""
WITH back AS (
  SELECT regexp_extract(filename, '([^/]+)$', 1) AS file, o_orderkey, o_totalprice
  FROM read_parquet('{path}/*.parquet', filename=true)
),
per_file AS (
  SELECT file, COUNT(*) AS n_rows,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS price
  FROM back GROUP BY file
),
tot AS (SELECT SUM(n_rows) AS total_rows FROM per_file),
planned AS (
  SELECT file, n_rows, price,
         COALESCE(SUM(n_rows) OVER (ORDER BY file
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         total_rows
  FROM per_file, tot
)
SELECT CAST(FLOOR(cum_before * 4 / CAST(total_rows AS DOUBLE)) AS INTEGER) AS bin,
       COUNT(*) AS n_files,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS revenue
FROM planned
GROUP BY 1
ORDER BY bin
"""


def bucketed_orders_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB fact-fact join layout, end to end: write ``orders``
    storage-partitioned by ``o_orderpriority`` AND hash-bucketed+sorted on
    ``o_custkey``, write ``customer`` bucketed identically on ``c_custkey``,
    then run a filtered join-aggregate over the read-back tables.

    What the layout buys (asserted by the plan audit in tests/test_scale.py):
    the priority filter becomes a PartitionFilter — directory pruning, no
    data scan of the other priorities — and the custkey join is a sort-merge
    join with NO Exchange on either side, because both scans already expose
    the same hash-bucketed distribution and per-bucket sort. The oracle
    aggregates the ORIGINAL parquet, so equality also proves the
    bucketed write→read cycle is lossless.

    The ``merge`` hint pins the SMJ: at sf0.01 the customer side is tiny
    enough that Spark would broadcast it (both joins are correct; the
    co-located SMJ is the shape under audit because at 100 TB neither side
    broadcasts)."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(_BUCKET_ROOT, tag)
    ob, cb = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spark.sql(f"DROP TABLE IF EXISTS {ob}")
    spark.sql(f"DROP TABLE IF EXISTS {cb}")
    (
        orders.write.mode("overwrite")
        .format("parquet")
        .partitionBy("o_orderpriority")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", os.path.join(base, "orders"))
        .saveAsTable(ob)
    )
    (
        cust.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", os.path.join(base, "customer"))
        .saveAsTable(cb)
    )
    o = spark.table(ob).filter(F.col("o_orderpriority") == "1-URGENT")
    c = spark.table(cb)
    return (
        o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


_BUCKETED_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def parquet_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches, read back as ONE table:
    batch 1 is written with the v1 schema (no ``lang`` column), batch 2 with
    the evolved v2 schema (adds ``lang``), and the union is read with
    ``mergeSchema=true`` — the lakehouse reality that a 100 TB corpus is
    written over months by evolving pipelines and must still scan as a
    single table, with the missing column null-filled for old files.

    The oracle recomputes the same aggregate from the ORIGINAL parquet with
    the evolution emulated in SQL (even doc_ids lose ``lang``), so equality
    proves (a) the write→read cycle is lossless per batch and (b) the merge
    null-fills exactly the v1 rows — no row duplication, loss, or column
    bleed between file schemas.

    Scale note: ``mergeSchema`` reconciles footers at planning time — with
    millions of files, prefer a declared read schema (the merged schema is
    known once evolution lands); per-file column resolution at scan time is
    free either way because parquet is self-describing."""
    path = os.path.join(
        _JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "docs_evo"
    )
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source", "n_chars"
    )
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "n_chars", "lang"
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("lang").alias("n_with_lang"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
        )
        .orderBy("source")
    )


_SCHEMA_EVO_SQL = """
WITH evolved AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN doc_id % 2 = 1 THEN lang END AS lang
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       COUNT(lang) AS n_with_lang,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM evolved
GROUP BY source
ORDER BY source
"""


#: Z-order curve resolution: 8 bits per dimension → 16-bit Morton key.
_Z_BITS = 8
#: Epoch for the date dimension (min o_orderdate in the TPC-H-ish testdata).
_Z_EPOCH = "1995-01-01"


def _zkey_spark(x, y):
    """16-bit Morton (Z-order) interleave of two 8-bit cells, as a pure
    Catalyst integer expression (whole-stage-codegen'd, no UDF)."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _zkey_duck(x: str, y: str) -> str:
    terms = [
        f"(((({x}) >> {i}) & 1) << {2 * i}) + (((({y}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(_Z_BITS)
    ]
    return " + ".join(f"({t})" for t in terms)


def zorder_orders_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout key over ``orders`` on the two pruning
    dimensions a warehouse actually filters by — customer and order day —
    then a per-curve-cell occupancy audit. Sorting files by this key is the
    multi-dimensional clustering trick (Delta/Iceberg ``OPTIMIZE ZORDER
    BY``): a range of the 1-D key covers a RECTANGLE of (custkey, day), so
    min/max file stats prune scans on EITHER dimension, where a plain sort
    prunes only its leading column. The interleave is 16 shift/mask terms of
    whole-stage-codegen'd integer arithmetic — no UDF, identical in DuckDB.

    ``tests/test_sources_sinks.py`` additionally writes the sf0.001 corpus
    in z-key order and asserts the per-chunk (custkey × day) bounding boxes
    shrink vs. a date-sorted layout — the actual stats-pruning benefit."""
    orders = load_table(spark, sf_dir, "orders")
    cells = 1 << _Z_BITS
    x = F.pmod(F.col("o_custkey"), F.lit(cells)).cast("long")
    # non-negative modulo spelled the sign-safe way ((d % n) + n) % n: Spark
    # pmod is always non-negative but DuckDB % follows the dividend's sign,
    # so a regenerated testdata with dates before the epoch would silently
    # diverge under a bare % — both engines use the identical expression
    d = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date")
    )
    y = (((d % cells) + cells) % cells).cast("long")
    keyed = orders.select(
        _zkey_spark(x, y).alias("zkey"),
        x.alias("cust_cell"),
        y.alias("day_cell"),
        "o_orderkey",
    )
    # coarse curve cells: top 4 bits of the 16-bit key → 16 quadrants
    return (
        keyed.groupBy((F.col("zkey") / 4096).cast("int").alias("z_quadrant"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("zkey").alias("min_z"),
            F.max("zkey").alias("max_z"),
            F.min("cust_cell").alias("min_cust_cell"),
            F.max("cust_cell").alias("max_cust_cell"),
            F.min("day_cell").alias("min_day_cell"),
            F.max("day_cell").alias("max_day_cell"),
            F.sum("o_orderkey").cast("long").alias("sum_orderkey"),
        )
        .orderBy("z_quadrant")
    )


_ZORDER_SQL = f"""
WITH keyed AS (
  SELECT {_zkey_duck(f'(o_custkey % {1 << _Z_BITS})', f"(((date_diff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) % {1 << _Z_BITS}) + {1 << _Z_BITS}) % {1 << _Z_BITS})")} AS zkey,
         o_custkey % {1 << _Z_BITS} AS cust_cell,
         ((date_diff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) % {1 << _Z_BITS}) + {1 << _Z_BITS}) % {1 << _Z_BITS} AS day_cell,
         o_orderkey
  FROM orders
)
SELECT CAST(zkey // 4096 AS INTEGER) AS z_quadrant,
       COUNT(*) AS n_orders,
       MIN(zkey) AS min_z, MAX(zkey) AS max_z,
       MIN(cust_cell) AS min_cust_cell, MAX(cust_cell) AS max_cust_cell,
       MIN(day_cell) AS min_day_cell, MAX(day_cell) AS max_day_cell,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey
FROM keyed
GROUP BY 1
ORDER BY 1
"""


def file_lineage_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-input-file lineage via the hidden ``_metadata`` struct on file
    scans — the provenance column a pipeline uses to trace a bad row back
    to the file (and upstream batch) that delivered it. ``orders`` is
    re-materialized as a 4-file dataset keyed by a deterministic split so
    the lineage is non-trivial; the read back groups rows per
    ``_metadata.file_name``. The oracle reads the SAME files with DuckDB's
    ``filename=true`` — both engines must attribute every row to the same
    file.

    Scale note: ``_metadata`` is populated at scan time from the split
    being read — constant-width, no extra I/O; at 100 TB it is the zero
    cost way to partition error triage by ingest batch."""
    path = os.path.join(
        _JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "orders_lineage"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    (
        orders.repartition(4, F.pmod("o_orderkey", F.lit(4)).cast("int"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("_metadata.file_name").alias("file_name"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
        )
        .orderBy("file_name")
    )


def _file_lineage_oracle(sf_dir_tag: str = "sf0.01") -> str:
    # The oracle cannot know the sf tag at registration time; the driver and
    # tests both run at sf0.01, and the Spark side writes under the same
    # fixed root — regexp extracts the basename to match _metadata.file_name.
    return f"""
SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
       COUNT(*) AS n_rows,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
FROM read_parquet('{_JSONL_ROOT}/{sf_dir_tag}/orders_lineage/*.parquet', filename=true)
GROUP BY 1
ORDER BY 1
"""


_FILE_LINEAGE_SQL = _file_lineage_oracle()


def csv_documents_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → CSV on disk → read back → per-lang aggregate; closes the
    CSV WRITE path (the read path is covered by csv_reference_golden). The
    corpus is the adversarial CSV payload: texts with embedded newlines,
    commas, and quotes — written with full quoting/escaping and read back
    with ``multiLine=true`` (without it a quoted newline splits a record
    and the row counts drift). The oracle aggregates the ORIGINAL parquet,
    so equality proves the whole quote/escape/multiline cycle is lossless.

    Scale note: ``multiLine`` CSV is not splittable (a file is one task's
    work) — fine for modest exports, wrong for a 100 TB interchange; the
    newline-free alternative is escaping to \n before write, or parquet."""
    path = os.path.join(
        _JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "docs_csv"
    )
    docs = load_table(spark, sf_dir, "documents")
    (
        docs.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(path)
    )
    back = (
        spark.read.schema(_DOCS_SCHEMA)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.length("text")).cast("long").alias("sum_text_len"),
            F.sum(F.length("source")).cast("long").alias("sum_source_len"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
        )
        .orderBy("lang")
    )


_CSV_ROUNDTRIP_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
       CAST(SUM(length(source)) AS BIGINT) AS sum_source_len,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents
GROUP BY lang
ORDER BY lang
"""


#: one object file per media asset, written by EXECUTORS (foreachPartition)
#: — the canonical object-store layout for a multimodal corpus.
_BLOB_MOD = 50


def binaryfile_media_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``binaryFile`` source over a directory of blob
    objects — the ingestion path for a multimodal corpus stored one object
    per asset (images/audio): write a sampled set of documents as
    individual ``doc_<id>.bin`` files from the EXECUTORS (foreachPartition
    — no driver collect, the real distributed object-writer shape), then
    read the directory back with ``format("binaryFile")`` +
    ``pathGlobFilter`` and verify the round-trip byte-exactly.

    The read-back row carries (path, length, content); the audit parses
    the doc_id back out of the filename, checksums the content, and
    aggregates — the oracle computes the same numbers from the original
    parquet, so a mismatch pinpoints loss anywhere in write→scan. At
    100 TB the scan parallelizes per-file with ``maxPartitionBytes``
    packing many small objects per task; content is never shuffled."""
    path = os.path.join(
        _JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "media_blobs"
    )
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    sample = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _BLOB_MOD == 0)
        .select("doc_id", F.encode("text", "UTF-8").alias("media"))
    )

    def write_blobs(rows) -> None:
        for r in rows:
            with open(os.path.join(path, f"doc_{r['doc_id']}.bin"), "wb") as f:
                f.write(bytes(r["media"]))

    sample.foreachPartition(write_blobs)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
        .select(
            F.regexp_extract(
                F.element_at(F.split("path", "/"), -1), r"doc_(\d+)\.bin", 1
            )
            .cast("long")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5("content").alias("checksum"),
        )
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.countDistinct("checksum").alias("n_checksums"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_BINARYFILE_SQL = f"""
SELECT COUNT(*) AS n_blobs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_checksums,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
WHERE doc_id % {_BLOB_MOD} = 0
"""


# --------------------------------------------------------------------------
# gzip-compressed JSONL shards (the wire format raw web corpora arrive in)
# --------------------------------------------------------------------------

#: gzip-JSONL sharding: documents hash into this many .jsonl.gz shards.
_GZ_SHARDS = 16
#: bounded modulus for the per-shard content-hash sum (keeps the BIGINT
#: aggregate far from overflow at any corpus size).
_GZ_HASH_MOD = 1000003


def source_gzip_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GZIP-JSONL INGESTION round-trip — the wire format raw web corpora
    actually arrive in (Common-Crawl-style ``.jsonl.gz`` shards): hash-
    shard the documents, ENCODE each shard as a real gzip stream (stdlib
    zlib deflate + CRC32/ISIZE trailer, deterministic header) of JSON
    lines, then ingest the shards back: gunzip (CRC-verified) and line-
    split in an Arrow-batched kernel, but parse the JSON **JVM-side with
    ``from_json`` and an explicit schema** — the scale path (Python only
    touches bytes; all field extraction is codegen'd Jackson). Per shard:
    docs, char sum, distinct sources, and a bounded per-shard content-hash
    sum over the round-tripped TEXT — any loss in JSON escaping, UTF-8, or
    line splitting (embedded newlines!) diverges the hash, which the
    oracle recomputes from the original parquet.

    Scale shape: one shuffle to assemble shards (``applyInPandas`` over
    the shard key — the distributed shard-writer shape), map-only decode,
    {shards}-row aggregate."""
    import json

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text",
        (F.col("doc_id") % _GZ_SHARDS).cast("int").alias("shard_id"),
    )

    def build(pdf):
        import gzip
        import io

        pdf = pdf.sort_values("doc_id")
        buf = io.BytesIO()
        # mtime=0: deterministic gzip header (content equality is what the
        # hash column checks; byte determinism keeps reruns identical)
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            for r in pdf.itertuples():
                gz.write(
                    json.dumps(
                        {
                            "doc_id": int(r.doc_id),
                            "source": r.source,
                            "n_chars": int(r.n_chars),
                            "text": r.text,
                        },
                        ensure_ascii=False,
                        sort_keys=True,
                    ).encode()
                    + b"\n"
                )
        import pandas as pd

        return pd.DataFrame(
            {"shard_id": [int(pdf["shard_id"].iloc[0])],
             "gz": [buf.getvalue()]}
        )

    shards = docs.groupBy("shard_id").applyInPandas(
        build, "shard_id int, gz binary"
    )

    def gunzip_lines(batches):
        import gzip

        import pandas as pd

        for pdf in batches:
            sids, lines = [], []
            for r in pdf.itertuples():
                # gzip.decompress verifies the CRC32 + ISIZE trailer —
                # a truncated or bit-flipped shard fails loudly here
                text = gzip.decompress(bytes(r.gz)).decode()
                # split strictly on \n: splitlines() also splits on
                # U+2028/U+0085, which json.dumps(ensure_ascii=False)
                # leaves RAW inside string values (valid JSON) — a doc
                # containing one would shear its record in two
                for line in text.split("\n"):
                    if line:
                        sids.append(int(r.shard_id))
                        lines.append(line)
            yield pd.DataFrame({"shard_id": sids, "line": lines})

    lines = shards.mapInPandas(gunzip_lines, "shard_id int, line string")
    j = F.from_json(
        "line", "doc_id BIGINT, source STRING, n_chars BIGINT, text STRING"
    )
    parsed = lines.select("shard_id", j.alias("j")).select(
        "shard_id",
        F.col("j.doc_id").alias("doc_id"),
        F.col("j.source").alias("source"),
        F.col("j.n_chars").alias("n_chars"),
        F.col("j.text").alias("text"),
    )
    from datafusion_impl_spark.operators import md5_long

    return (
        parsed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(md5_long(F.col("text")) % _GZ_HASH_MOD).alias(
                "text_hash_sum"
            ),
        )
        .orderBy("shard_id")
    )


def _gzip_jsonl_oracle() -> str:
    from datafusion_impl_spark.operators import duck_md5_long

    return f"""
SELECT CAST(doc_id % {_GZ_SHARDS} AS INTEGER) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM({duck_md5_long("text")} % {_GZ_HASH_MOD}) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY 1
ORDER BY shard_id
"""


# --------------------------------------------------------------------------
# Seekable-zstd JSONL shards (zstd seekable format, record-aligned frames)
# --------------------------------------------------------------------------

#: documents hash-shard into this many .jsonl.zst seekable shards.
_ZST_SHARDS = 8
#: records per independent zstd frame (record-aligned chunking keeps the
#: frame count exactly SQL-replayable: ceil(n_docs_in_shard / this)).
_ZST_FRAME_DOCS = 25
#: bounded modulus for the per-shard content-hash sum.
_ZST_HASH_MOD = 1000003
#: zstd magic numbers from the PUBLIC RFC 8878 / seekable-format spec.
_ZST_FRAME_MAGIC = 0xFD2FB528
_ZST_SKIPPABLE_MAGIC = 0x184D2A5E   # seekable format pins the 0xE variant
_ZST_SEEKABLE_MAGIC = 0x8F92EAB1    # seek-table footer integrity magic


def _zst_build_shard(payload_chunks) -> bytes:
    """Assemble one SEEKABLE zstd shard from record-aligned payload chunks
    (each chunk compressed as an INDEPENDENT zstd frame, so any frame can
    be range-read and decoded without touching its neighbors), followed by
    the seek table carried in a SKIPPABLE frame per the public zstd
    seekable-format spec: per-frame (compressed_size u32 LE,
    decompressed_size u32 LE) entries, then a 9-byte footer
    (frame_count u32 LE, descriptor byte = 0: no per-frame checksums,
    seekable magic 0x8F92EAB1)."""
    import struct

    import pyarrow as pa

    codec = pa.Codec("zstd")
    frames = []
    entries = b""
    for chunk in payload_chunks:
        comp = bytes(codec.compress(chunk))
        frames.append(comp)
        entries += struct.pack("<II", len(comp), len(chunk))
    table = entries + struct.pack("<IB", len(frames), 0) + struct.pack(
        "<I", _ZST_SEEKABLE_MAGIC
    )
    skippable = struct.pack("<II", _ZST_SKIPPABLE_MAGIC, len(table)) + table
    return b"".join(frames) + skippable


def _zst_read_shard(blob: bytes):
    """Decode one seekable zstd shard STRICTLY through its seek table —
    the 100 TB access pattern (range-read a frame, never stream-scan the
    shard): parse the trailing skippable frame, validate the footer magic
    and that the frame sizes tile the shard exactly, then decode each data
    frame independently (magic-checked) with the seek table's
    decompressed size. Raises loudly on any malformed byte — truncated
    seek table, wrong magic, or a frame that decodes to the wrong length."""
    import struct

    import pyarrow as pa

    if len(blob) < 17:
        raise ValueError("zstd shard truncated: no room for a seek table")
    (magic,) = struct.unpack_from("<I", blob, len(blob) - 4)
    if magic != _ZST_SEEKABLE_MAGIC:
        raise ValueError(f"bad seekable footer magic: {magic:#x}")
    n_frames, desc = struct.unpack_from("<IB", blob, len(blob) - 9)
    if desc != 0:
        raise ValueError(f"unsupported seek-table descriptor: {desc}")
    table_len = 8 * n_frames + 9
    skip_start = len(blob) - table_len - 8
    if skip_start < 0:
        raise ValueError("zstd shard truncated: seek table overruns shard")
    skip_magic, skip_len = struct.unpack_from("<II", blob, skip_start)
    if skip_magic != _ZST_SKIPPABLE_MAGIC:
        raise ValueError(f"bad skippable-frame magic: {skip_magic:#x}")
    if skip_len != table_len:
        raise ValueError("skippable frame length != seek-table length")
    codec = pa.Codec("zstd")
    off = 0
    chunks = []
    for i in range(n_frames):
        csize, dsize = struct.unpack_from(
            "<II", blob, skip_start + 8 + 8 * i
        )
        (fmagic,) = struct.unpack_from("<I", blob, off)
        if fmagic != _ZST_FRAME_MAGIC:
            raise ValueError(f"bad zstd frame magic at {off}: {fmagic:#x}")
        try:
            raw = bytes(codec.decompress(blob[off:off + csize], dsize))
        except Exception as exc:   # normalize codec errors (OSError etc.)
            raise ValueError(f"zstd frame {i} failed to decode: {exc}")
        if len(raw) != dsize:
            raise ValueError("frame decoded to the wrong length")
        chunks.append(raw)
        off += csize
    if off != skip_start:
        raise ValueError("frames do not tile the shard up to the seek table")
    return chunks


def source_zstd_seekable_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEEKABLE-ZSTD JSONL ingestion round-trip — the shard layout modern
    LLM corpora actually ship (zstd-framed ``.jsonl.zst``, e.g.
    RedPajama/Dolma-style shards): hash-shard the documents, ENCODE each
    shard as record-aligned INDEPENDENT zstd frames ({frame_docs} docs per
    frame) plus a trailing seek table in a SKIPPABLE frame per the public
    zstd seekable-format spec (magics 0xFD2FB528 / 0x184D2A5E /
    0x8F92EAB1), then ingest the shards back: the Arrow kernel decodes
    STRICTLY through the seek table — validating that the per-frame
    compressed/decompressed sizes tile the shard byte-exactly — while the
    JSON parse stays JVM-side (``from_json`` with an explicit schema, the
    codegen'd scale path; Python only touches bytes). The entropy decode
    itself is pyarrow's bundled C zstd (every Spark executor already
    carries it) — a pure-Python FSE/Huffman decoder would be the wrong
    engineering at any scale; the spec-level work here is the FRAME and
    SEEK-TABLE layer, which is what makes 100 TB shards range-readable.

    Per shard the census reports the frame count (record-aligned, so the
    oracle replays it exactly as ``ceil(n_docs / {frame_docs})``), doc
    count, char sum, distinct sources, and a bounded content-hash sum over
    the round-tripped TEXT — any loss anywhere in compress/frame/seek-
    table/decode/line-split/JSON diverges the hash vs the parquet oracle.

    Scale shape: one shuffle to assemble shards (``applyInPandas`` over
    the shard key — the distributed shard-writer), map-only seek-table
    decode, {shards}-row aggregate. At 100 TB, independent frames mean a
    reader can fetch doc ranges with HTTP range requests and decode only
    the frames it needs — the reason the seekable format exists."""
    import json

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text",
        (F.col("doc_id") % _ZST_SHARDS).cast("int").alias("shard_id"),
    )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        lines = [
            json.dumps(
                {
                    "doc_id": int(r.doc_id),
                    "source": r.source,
                    "n_chars": int(r.n_chars),
                    "text": r.text,
                },
                ensure_ascii=False,
                sort_keys=True,
            ).encode()
            + b"\n"
            for r in pdf.itertuples()
        ]
        chunks = [
            b"".join(lines[i:i + _ZST_FRAME_DOCS])
            for i in range(0, len(lines), _ZST_FRAME_DOCS)
        ]
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "zst": [_zst_build_shard(chunks)],
            }
        )

    shards = docs.groupBy("shard_id").applyInPandas(
        build, "shard_id int, zst binary"
    )

    def unzstd_lines(batches):
        import pandas as pd

        for pdf in batches:
            sids, fidx, lines = [], [], []
            for r in pdf.itertuples():
                for i, chunk in enumerate(_zst_read_shard(bytes(r.zst))):
                    # split strictly on \n (same rationale as the gzip
                    # twin: splitlines() shears records on raw U+2028)
                    for line in chunk.decode().split("\n"):
                        if line:
                            sids.append(int(r.shard_id))
                            fidx.append(i)
                            lines.append(line)
            yield pd.DataFrame(
                {"shard_id": sids, "frame_idx": fidx, "line": lines}
            )

    lines = shards.mapInPandas(
        unzstd_lines, "shard_id int, frame_idx int, line string"
    )
    j = F.from_json(
        "line", "doc_id BIGINT, source STRING, n_chars BIGINT, text STRING"
    )
    parsed = lines.select("shard_id", "frame_idx", j.alias("j")).select(
        "shard_id",
        "frame_idx",
        F.col("j.n_chars").alias("n_chars"),
        F.col("j.source").alias("source"),
        F.col("j.text").alias("text"),
    )
    from datafusion_impl_spark.operators import md5_long

    return (
        parsed.groupBy("shard_id")
        .agg(
            F.countDistinct("frame_idx").cast("long").alias("n_frames"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(md5_long(F.col("text")) % _ZST_HASH_MOD).alias(
                "text_hash_sum"
            ),
        )
        .orderBy("shard_id")
    )


source_zstd_seekable_scan.__doc__ = source_zstd_seekable_scan.__doc__.format(
    shards=_ZST_SHARDS, frame_docs=_ZST_FRAME_DOCS
)


def _zstd_seekable_oracle() -> str:
    from datafusion_impl_spark.operators import duck_md5_long

    return f"""
SELECT CAST(doc_id % {_ZST_SHARDS} AS INTEGER) AS shard_id,
       CAST(CEIL(COUNT(*) / {_ZST_FRAME_DOCS}.0) AS BIGINT) AS n_frames,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM({duck_md5_long("text")} % {_ZST_HASH_MOD}) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY 1
ORDER BY shard_id
"""


# --------------------------------------------------------------------------
# Parquet footer / row-group stats census (r14): the layout-debugging
# operator behind every stats-pruning claim — read the footers and report
# what a min/max-pruned scan could actually skip
# --------------------------------------------------------------------------

_FOOTER_ROOT = "/tmp/datafusion_impl_spark_footer"
_FOOTER_FILES = 8
_FOOTER_RGS_PER_FILE = 3


def _footer_stage(sf_dir: str) -> str:
    """Stage ``orders`` once per sf as a SORTED {files}-file layout with
    {rgs} row groups per file (pyarrow writer, fixed row_group_size — no
    Spark jobs, so the footers are byte-deterministic). Sorted by
    ``o_orderkey``, every file and every row group carries a DISJOINT key
    range — the layout where min/max stats actually prune."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as papq

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(_FOOTER_ROOT, tag)
    done = os.path.join(out, "_STAGED")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    t = papq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("o_orderkey", "ascending")]))
    n = t.num_rows
    per_file = (n + _FOOTER_FILES - 1) // _FOOTER_FILES
    rg = max(1, per_file // _FOOTER_RGS_PER_FILE)
    for i in range(_FOOTER_FILES):
        part = t.slice(i * per_file, per_file)
        papq.write_table(
            part,
            os.path.join(out, f"part-{i:02d}.parquet"),
            row_group_size=rg,
        )
    open(done, "w").close()
    return out


_footer_stage.__doc__ = _footer_stage.__doc__.format(
    files=_FOOTER_FILES, rgs=_FOOTER_RGS_PER_FILE
)


def parquet_footer_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET FOOTER CENSUS — the metadata pass behind every stats-pruning
    decision (Delta/Iceberg OPTIMIZE audits, scan planners, the repo's own
    Z-order claims): stage ``orders`` as a sorted {files}-file layout with
    multiple row groups per file, then read ONLY the FOOTERS (pyarrow
    ``ParquetFile.metadata`` in the Arrow kernel — no data pages touched)
    and report, per file: row-group count, rows, the ``o_orderkey``
    stats range, whether the row groups are internally disjoint and
    sorted, and how many row groups a ``o_orderkey <= max/2`` scan could
    PRUNE from stats alone. The DuckDB oracle reads the very same footers
    with its own independent reader (``parquet_metadata``) — two parquet
    implementations agreeing on bytes ONE of them wrote.

    Scale shape: footer reads parallelize over files (a 100 TB table's
    planning pass is exactly this: thousands of footers, zero data pages);
    staging is one pyarrow write, memoized per sf."""
    import os

    stage = _footer_stage(sf_dir)
    paths = [
        os.path.join(stage, f"part-{i:02d}.parquet")
        for i in range(_FOOTER_FILES)
    ]
    pdf_paths = spark.createDataFrame(
        [(i, p) for i, p in enumerate(paths)], "file_idx int, path string"
    )

    def footers(batches):
        import pandas as pd
        import pyarrow.parquet as papq

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                md = papq.ParquetFile(r.path).metadata
                col_idx = {
                    md.schema.column(j).name: j
                    for j in range(md.num_columns)
                }["o_orderkey"]
                for g in range(md.num_row_groups):
                    rgm = md.row_group(g)
                    st = rgm.column(col_idx).statistics
                    rows.append(
                        (
                            int(r.file_idx),
                            g,
                            rgm.num_rows,
                            int(st.min),
                            int(st.max),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["file_idx", "rg_id", "n_rows", "kmin", "kmax"],
            )

    rgs = pdf_paths.mapInPandas(
        footers,
        "file_idx int, rg_id int, n_rows long, kmin long, kmax long",
    )
    # prune predicate: o_orderkey <= half the global max (derived from the
    # same stats in both engines — no data pages read anywhere)
    gmax = rgs.agg(F.max("kmax").alias("g"))
    half = (F.col("g") / 2).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy("file_idx").orderBy("rg_id")
    flagged = (
        rgs.crossJoin(F.broadcast(gmax.select(half.alias("p"))))
        .withColumn("prev_max", F.lag("kmax").over(w))
        .withColumn(
            "sorted_after_prev",
            F.when(F.col("prev_max").isNull(), F.lit(1))
            .otherwise((F.col("kmin") > F.col("prev_max")).cast("int")),
        )
        .withColumn("prunable", (F.col("kmin") > F.col("p")).cast("long"))
    )
    return (
        flagged.groupBy("file_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_row_groups"),
            F.sum("n_rows").alias("n_rows"),
            F.min("kmin").alias("key_min"),
            F.max("kmax").alias("key_max"),
            (F.min("sorted_after_prev") == 1).cast("int").alias(
                "rgs_disjoint_sorted"
            ),
            F.sum("prunable").alias("n_prunable_rgs"),
        )
        .orderBy("file_idx")
    )


parquet_footer_census.__doc__ = parquet_footer_census.__doc__.format(
    files=_FOOTER_FILES
)


def _footer_census_oracle_staged() -> str:
    """Resolved lazily at ``oracle_sql()`` fetch time (r14 advice): the
    DuckDB SQL reads footers from ``_FOOTER_ROOT``, so stage the
    driver-contract sf (correctness always runs at sf0.01) before handing
    the SQL out — oracle-first execution order or a fresh /tmp can no
    longer leave ``parquet_metadata()`` with missing files. Staging is
    pure pyarrow and byte-deterministic, so both engines read the
    identical layout regardless of who staged it.

    The sf dir honors ``SPARK_GRAFT_ORACLE_SF_DIR`` (driver-contract
    correctness default: sf0.01), and staging failure is contained —
    a missing/unreadable dataset degrades ONLY this oracle (DuckDB's
    ``parquet_metadata()`` errors on the absent files) instead of
    taking down the whole ``oracle_sql()`` registry (r15 advice)."""
    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    try:
        _footer_stage(sf_dir)
    except Exception:
        pass  # contained: only the footer-census oracle will error
    return _footer_census_oracle(
        os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    )


def _footer_census_oracle(sf_tag: str = "sf0.01") -> str:
    return f"""
WITH rgs AS (
  SELECT CAST(regexp_extract(file_name, 'part-(\\d+)', 1) AS INTEGER)
           AS file_idx,
         row_group_id AS rg_id,
         row_group_num_rows AS n_rows,
         CAST(stats_min_value AS BIGINT) AS kmin,
         CAST(stats_max_value AS BIGINT) AS kmax
  FROM parquet_metadata('{_FOOTER_ROOT}/{sf_tag}/part-*.parquet')
  WHERE path_in_schema = 'o_orderkey'
),
g AS (SELECT CAST(MAX(kmax) // 2 AS BIGINT) AS p FROM rgs),
flagged AS (
  SELECT file_idx, rg_id, n_rows, kmin, kmax,
         LAG(kmax) OVER (PARTITION BY file_idx ORDER BY rg_id) AS prev_max,
         CASE WHEN kmin > (SELECT p FROM g) THEN 1 ELSE 0 END AS prunable
  FROM rgs
)
SELECT file_idx,
       COUNT(*) AS n_row_groups,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       MIN(kmin) AS key_min,
       MAX(kmax) AS key_max,
       CAST(MIN(CASE WHEN prev_max IS NULL OR kmin > prev_max
                     THEN 1 ELSE 0 END) AS INTEGER) AS rgs_disjoint_sorted,
       CAST(SUM(prunable) AS BIGINT) AS n_prunable_rgs
FROM flagged
GROUP BY file_idx
ORDER BY file_idx
"""


# --------------------------------------------------------------------------
# WARC record scan (ISO 28500 — the container Common Crawl actually ships)
# --------------------------------------------------------------------------

#: documents hash-shard into this many .warc shards.
_WARC_SHARDS = 8
#: bounded modulus for the per-shard content-hash sum.
_WARC_HASH_MOD = 1000003
#: deterministic capture timestamp for every planted record (WARC-Date is
#: mandatory; a wall-clock value would break byte-determinism).
_WARC_DATE = "2024-01-01T00:00:00Z"


def _warc_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    """One WARC/1.0 record: version line, named headers + Content-Length,
    blank line, exactly Content-Length payload bytes, and the mandatory
    two trailing CRLFs — all per the public ISO 28500 grammar."""
    head = "WARC/1.0\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers
    ) + f"Content-Length: {len(payload)}\r\n\r\n"
    return head.encode() + payload + b"\r\n\r\n"


def _warc_build_shard(shard_id: int, rows) -> bytes:
    """One .warc shard: a ``warcinfo`` record, then one ``response``
    record per document whose payload is a full HTTP/1.1 message (status
    line + headers + body) — the exact nesting Common Crawl response
    records carry, so the reader must do BOTH layers of framing."""
    info = _warc_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", f"<urn:uuid:shard-{shard_id}>"),
            ("WARC-Date", _WARC_DATE),
            ("Content-Type", "application/warc-fields"),
        ],
        f"software: datafusion_impl_spark\r\nshard: {shard_id}\r\n".encode(),
    )
    out = [info]
    for r in rows:
        body = r.text.encode()
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/plain; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        out.append(
            _warc_record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", f"<urn:uuid:doc-{int(r.doc_id)}>"),
                    ("WARC-Date", _WARC_DATE),
                    (
                        "WARC-Target-URI",
                        f"http://corpus.example/doc/{int(r.doc_id)}",
                    ),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
    return b"".join(out)


def _warc_scan(data: bytes):
    """Walk a .warc shard record by record: version line, header block to
    the blank line, exactly Content-Length payload bytes, mandatory
    CRLF CRLF trailer. For ``response`` records the HTTP layer is framed
    the same way (status line, headers, blank line, body). Content-Length
    does ALL the framing — payloads may legally contain ``\\r\\n\\r\\n``,
    so any sniffing-based reader is wrong, which the planted texts with
    embedded blank lines would expose. Yields
    ``(warc_type, uri, body_bytes)``; raises ``ValueError`` loudly on any
    malformed framing."""
    pos = 0
    while pos < len(data):
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = data[pos:eol]
        if version != b"WARC/1.0":
            raise ValueError(f"bad WARC version line: {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, sep, v = line.decode().partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line: {line!r}")
            headers[k.strip().lower()] = v.strip()
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        ln = int(headers["content-length"])
        if pos + ln + 4 > len(data):
            raise ValueError("WARC payload overruns shard")
        payload = data[pos:pos + ln]
        pos += ln
        if data[pos:pos + 4] != b"\r\n\r\n":
            raise ValueError("WARC record missing CRLF CRLF trailer")
        pos += 4
        wtype = headers.get("warc-type", "")
        uri = headers.get("warc-target-uri", "")
        if wtype == "response":
            # inner HTTP framing: status line, headers, blank line, body
            sep_at = payload.find(b"\r\n\r\n")
            if sep_at < 0:
                raise ValueError("response record missing HTTP separator")
            head = payload[:sep_at].decode()
            body = payload[sep_at + 4:]
            first = head.split("\r\n", 1)[0]
            if not first.startswith("HTTP/1.1 "):
                raise ValueError(f"bad HTTP status line: {first!r}")
            hdrs = {}
            for line in head.split("\r\n")[1:]:
                k, sep2, v = line.partition(":")
                if sep2:
                    hdrs[k.strip().lower()] = v.strip()
            if (
                "content-length" not in hdrs
                or int(hdrs["content-length"]) != len(body)
            ):
                raise ValueError("HTTP Content-Length mismatch")
            yield wtype, uri, body, hdrs
        else:
            yield wtype, uri, payload, {}


def source_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC INGESTION round-trip — the container web-scale corpora
    actually arrive in (Common Crawl ships WARC per ISO 28500): hash-shard
    the documents, ENCODE each shard as real WARC/1.0 records (a
    ``warcinfo`` header record plus one ``response`` record per document
    whose payload is a full nested HTTP/1.1 message — status line,
    headers, Content-Length, body), then ingest the shards back with a
    strict double-framing reader: Content-Length does ALL the framing at
    BOTH layers (payloads may legally contain CRLF CRLF — a sniffing
    reader is wrong; the embedded-blank-line case is pinned by the
    pytest), the version line / blank-line / trailing-CRLFs grammar is
    enforced loudly, and the doc id is recovered from WARC-Target-URI. Census per shard: record counts by type, char
    sum, URI-derived id sum, and the bounded content-hash sum over the
    round-tripped TEXT — any framing slip diverges the hash vs the
    parquet oracle.

    Scale shape: one shuffle to assemble shards (``applyInPandas`` over
    the shard key), map-only record walk, {shards}-row aggregate. At
    100 TB: WARC shards are processed record-stream-wise exactly like
    this — the reader never loads more than one record's payload."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars",
        (F.col("doc_id") % _WARC_SHARDS).cast("int").alias("shard_id"),
    )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "warc": [
                    _warc_build_shard(
                        int(pdf["shard_id"].iloc[0]), pdf.itertuples()
                    )
                ],
            }
        )

    shards = docs.groupBy("shard_id").applyInPandas(
        build, "shard_id int, warc binary"
    )

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            sids, types, ids, texts = [], [], [], []
            for r in pdf.itertuples():
                for wtype, uri, body, _h in _warc_scan(bytes(r.warc)):
                    sids.append(int(r.shard_id))
                    types.append(wtype)
                    ids.append(
                        int(uri.rsplit("/", 1)[1])
                        if wtype == "response" else -1
                    )
                    texts.append(
                        body.decode() if wtype == "response" else ""
                    )
            yield pd.DataFrame(
                {
                    "shard_id": sids,
                    "warc_type": types,
                    "doc_id": ids,
                    "text": texts,
                }
            )

    records = shards.mapInPandas(
        scan, "shard_id int, warc_type string, doc_id bigint, text string"
    )
    from datafusion_impl_spark.operators import md5_long

    resp = F.col("warc_type") == "response"
    return (
        records.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(resp.cast("long")).alias("n_responses"),
            F.sum(F.when(resp, F.col("doc_id")).otherwise(0)).alias(
                "doc_id_sum"
            ),
            F.sum(F.when(resp, F.length("text")).otherwise(0))
            .cast("long")
            .alias("sum_chars"),
            F.sum(
                F.when(resp, md5_long(F.col("text")) % _WARC_HASH_MOD)
                .otherwise(0)
            ).alias("text_hash_sum"),
        )
        .orderBy("shard_id")
    )


source_warc_scan.__doc__ = source_warc_scan.__doc__.format(
    shards=_WARC_SHARDS
)


def _warc_oracle() -> str:
    from datafusion_impl_spark.operators import duck_md5_long

    return f"""
SELECT CAST(doc_id % {_WARC_SHARDS} AS INTEGER) AS shard_id,
       COUNT(*) + 1 AS n_records,
       COUNT(*) AS n_responses,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(SUM({duck_md5_long("text")} % {_WARC_HASH_MOD}) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY 1
ORDER BY shard_id
"""


# --------------------------------------------------------------------------
# Robots/noindex compliance gate over the WARC corpus (r15): the legal
# filter every crawl pipeline runs before anything else — RFC 9309
# robots.txt group selection + longest-match allow/disallow, plus the
# X-Robots-Tag header and meta-noindex page signals.
# --------------------------------------------------------------------------

#: synthetic crawl hosts: doc_id % this. Hosts 0-4 publish a robots.txt;
#: host 5 publishes NONE (missing robots => everything allowed).
_ROBOTS_HOSTS = 6
#: the crawler user-agent the gate evaluates for.
_ROBOTS_AGENT = "trainbot"
#: site section per doc: path = /{section}/doc/{doc_id}.
_ROBOTS_SECTIONS = ("public", "private", "data", "tmp")
#: docs with doc_id % 7 == 0 carry "X-Robots-Tag: noindex" (HTTP layer);
#: doc_id % 7 == 1 carry a meta-robots noindex tag (HTML layer).
_NOINDEX_HDR_MOD, _NOINDEX_HDR_RES = 7, 0
_NOINDEX_META_RES = 1
_NOINDEX_META_TAG = '<meta name="robots" content="noindex">'

#: planted robots.txt per host — each RFC 9309 precedence rule is
#: exercised: host 0 longest-match (Allow:/private/doc/ beats
#: Disallow:/private/), host 1 group selection (the trainbot group wins
#: over the catch-all Disallow:/), host 2 equal-length tie (Allow beats
#: Disallow), host 3 empty Disallow (= allow all, the rule is a no-op),
#: host 4 Disallow:/ with an Allow carve-out.
_ROBOTS_TXT = {
    0: "User-agent: *\nDisallow: /private/\nAllow: /private/doc/\n"
       "Disallow: /tmp/\nCrawl-delay: 2\n",
    1: "User-agent: trainbot\nDisallow: /data/\nCrawl-delay: 5\n\n"
       "User-agent: *\nDisallow: /\nCrawl-delay: 9\n",
    2: "# tie: equal-length allow and disallow\n"
       "User-agent: *\nAllow: /tmp\nDisallow: /tmp\nDisallow: /private/\n",
    3: "User-agent: *\nDisallow:\nCrawl-delay: 3\n",
    4: "User-agent: *\nDisallow: /\nAllow: /public/\n",
}
#: fetch spacing when a host publishes no Crawl-delay (hosts 2, 4, 5).
_CRAWL_DELAY_DEFAULT = 1


def _robots_parse(text: str) -> list[tuple[str, int, str]]:
    """Parse a robots.txt body into ``(agent, is_allow, path_prefix)``
    rules per RFC 9309: consecutive ``User-agent`` lines open ONE group
    whose rules attach to every listed agent; ``#`` comments and unknown
    directives are ignored; empty-value rules (``Disallow:`` = allow all)
    are no-ops and are dropped at parse time."""
    rules: list[tuple[str, int, str]] = []
    agents: list[str] = []
    in_group_header = False
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_group_header:
                agents = []
                in_group_header = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_header = False
            if val:
                for a in agents:
                    rules.append((a, 1 if key == "allow" else 0, val))
        else:
            in_group_header = False
    return rules


def _robots_parse_delays(text: str) -> list[tuple[str, int]]:
    """Parse ``Crawl-delay`` directives per RFC 9309 group semantics
    (same group grammar as :func:`_robots_parse`); returns
    ``(agent, delay_seconds)`` rows."""
    out: list[tuple[str, int]] = []
    agents: list[str] = []
    in_group_header = False
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_group_header:
                agents = []
                in_group_header = True
            agents.append(val.lower())
        else:
            in_group_header = False
            if key == "crawl-delay" and val.isdigit():
                for a in agents:
                    out.append((a, int(val)))
    return out


def _robots_allowed(
    rules: list[tuple[str, int, str]], agent: str, path: str
) -> bool:
    """Reference decision (used by the pytest to cross-check the
    relational plan): select the most specific user-agent group (exact
    agent if any of its rules exist, else ``*``), keep prefix-matching
    rules, and apply longest-match with allow-beats-disallow on ties —
    encoded as ``max(2*len(prefix) + is_allow)``, exactly the expression
    the Spark query and the DuckDB oracle both aggregate."""
    grp = agent.lower() if any(a == agent.lower() for a, _i, _p in rules) \
        else "*"
    best = -1
    for a, is_allow, prefix in rules:
        if a == grp and path.startswith(prefix):
            best = max(best, 2 * len(prefix) + is_allow)
    return best < 0 or best % 2 == 1


def _warc_build_compliance_shard(shard_id: int, rows) -> bytes:
    """One compliance-crawl .warc shard: a warcinfo record, the robots.txt
    response records for the hosts that hash into this shard (host %
    {shards}), then one page response per document. Pages carry the
    corpus source as an ``X-Corpus-Source`` header, the noindex plant as
    a real ``X-Robots-Tag: noindex`` header (doc_id % {h_mod} == {h_res})
    or a meta-robots tag wrapped into an HTML body (== {m_res}) — the
    gate must read all of it back from BYTES, never from arithmetic."""
    out = [
        _warc_record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", f"<urn:uuid:gate-shard-{shard_id}>"),
                ("WARC-Date", _WARC_DATE),
                ("Content-Type", "application/warc-fields"),
            ],
            f"software: datafusion_impl_spark\nshard: {shard_id}\n".encode(),
        )
    ]

    def http_response(headers: list[tuple[str, str]], body: bytes) -> bytes:
        return (
            b"HTTP/1.1 200 OK\r\n"
            + "".join(f"{k}: {v}\r\n" for k, v in headers).encode()
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )

    for host, txt in sorted(_ROBOTS_TXT.items()):
        if host % _WARC_SHARDS != shard_id:
            continue
        body = txt.encode()
        out.append(
            _warc_record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", f"<urn:uuid:robots-{host}>"),
                    ("WARC-Date", _WARC_DATE),
                    (
                        "WARC-Target-URI",
                        f"http://host{host}.example/robots.txt",
                    ),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http_response(
                    [("Content-Type", "text/plain")], body
                ),
            )
        )
    for r in rows:
        doc_id = int(r.doc_id)
        host = doc_id % _ROBOTS_HOSTS
        section = _ROBOTS_SECTIONS[doc_id % len(_ROBOTS_SECTIONS)]
        headers = [
            ("Content-Type", "text/html; charset=utf-8"),
            ("X-Corpus-Source", str(r.source)),
        ]
        if doc_id % _NOINDEX_HDR_MOD == _NOINDEX_HDR_RES:
            headers.append(("X-Robots-Tag", "noindex"))
        if doc_id % _NOINDEX_HDR_MOD == _NOINDEX_META_RES:
            body = (
                f"<html><head>{_NOINDEX_META_TAG}</head>"
                f"<body>{r.text}</body></html>"
            ).encode()
        else:
            body = str(r.text).encode()
        out.append(
            _warc_record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", f"<urn:uuid:page-{doc_id}>"),
                    ("WARC-Date", _WARC_DATE),
                    (
                        "WARC-Target-URI",
                        f"http://host{host}.example/{section}/doc/{doc_id}",
                    ),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http_response(headers, body),
            )
        )
    return b"".join(out)


_warc_build_compliance_shard.__doc__ = (
    _warc_build_compliance_shard.__doc__.format(
        shards=_WARC_SHARDS, h_mod=_NOINDEX_HDR_MOD,
        h_res=_NOINDEX_HDR_RES, m_res=_NOINDEX_META_RES,
    )
)


def _robots_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared byte-honest record extraction for the compliance gate and
    its streaming twin: build the compliance WARC shards, scan them, and
    return the mixed rule/page record frame (localCheckpointed —
    metadata-only rows, scanned once, consumed by several plans)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source",
        (F.col("doc_id") % _WARC_SHARDS).cast("int").alias("shard_id"),
    )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        sid = int(pdf["shard_id"].iloc[0])
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "warc": [_warc_build_compliance_shard(sid, pdf.itertuples())],
            }
        )

    shards = docs.groupBy("shard_id").applyInPandas(
        build, "shard_id int, warc binary"
    )

    def scan(batches):
        import pandas as pd

        cols = ("kind", "host", "agent", "is_allow", "prefix",
                "doc_id", "source", "path", "noindex_hdr", "noindex_meta")
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                for wtype, uri, body, hdrs in _warc_scan(bytes(r.warc)):
                    if wtype != "response":
                        continue
                    hostpart, _sep, path = uri.removeprefix(
                        "http://"
                    ).partition("/")
                    host = int(hostpart.removeprefix("host").split(".")[0])
                    if path == "robots.txt":
                        for agent, is_allow, prefix in _robots_parse(
                            body.decode()
                        ):
                            rows.append((
                                "rule", host, agent, is_allow, prefix,
                                -1, "", "", 0, 0,
                            ))
                        # Crawl-delay rows: the is_allow slot carries the
                        # delay seconds (kind discriminates)
                        for agent, delay in _robots_parse_delays(
                            body.decode()
                        ):
                            rows.append((
                                "delay", host, agent, delay, "",
                                -1, "", "", 0, 0,
                            ))
                    else:
                        text = body.decode()
                        did = int(path.rsplit("/", 1)[1])
                        # meta detection is SCOPED to the plant
                        # arithmetic so corpus text containing the
                        # literal tag can never flip the flag; the
                        # substring check stays so a broken plant is
                        # still caught (flag would drop to 0 and the
                        # oracle would diverge).
                        rows.append((
                            "page", host, "", 0, "",
                            did,
                            hdrs.get("x-corpus-source", ""),
                            "/" + path,
                            int(hdrs.get("x-robots-tag", "") == "noindex"),
                            int(did % _NOINDEX_HDR_MOD
                                == _NOINDEX_META_RES
                                and _NOINDEX_META_TAG in text),
                        ))
            yield pd.DataFrame(rows, columns=list(cols))

    return shards.mapInPandas(
        scan,
        "kind string, host int, agent string, is_allow int, prefix string, "
        "doc_id bigint, source string, path string, "
        "noindex_hdr int, noindex_meta int",
    ).localCheckpoint()  # metadata-only rows; scanned once, consumed twice


def _robots_selected_rules(records: DataFrame) -> DataFrame:
    """RFC 9309 group selection over the parsed rule rows: the specific
    agent's group wins wholesale over * wherever it exists."""
    rules = records.filter(F.col("kind") == "rule").select(
        "host", "agent", "is_allow", "prefix"
    )
    spec = rules.filter(F.col("agent") == _ROBOTS_AGENT) \
        .select("host").distinct().withColumn("has_spec", F.lit(1))
    return (
        rules.join(F.broadcast(spec), "host", "left")
        .filter(
            (F.col("has_spec").isNotNull() & (F.col("agent") == _ROBOTS_AGENT))
            | (F.col("has_spec").isNull() & (F.col("agent") == "*"))
        )
        .select("host", "is_allow", "prefix")
    )


def warc_robots_compliance_gate(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """ROBOTS/NOINDEX COMPLIANCE GATE over a WARC crawl — the legal
    filter a training-data pipeline runs before any content work: plant
    robots.txt response records and X-Robots-Tag / meta-noindex pages
    into real WARC shards, read EVERYTHING back from bytes (robots rules
    parsed per RFC 9309, page host/path from WARC-Target-URI, the source
    label and noindex header from the inner HTTP headers, the meta tag
    from the HTML body), then evaluate per page with the full precedence
    stack: most-specific user-agent group, longest-match allow/disallow,
    allow-beats-disallow on ties, missing robots.txt = allowed. Census
    per corpus source: page count, robots-blocked count, both noindex
    counts, the usable remainder and its doc-id checksum.

    The decision is RELATIONAL, not per-row Python: the parsed rules are
    a tiny broadcast table, pages join it on host with a prefix match,
    and the verdict is ``max(2*len(prefix) + is_allow)`` per page — at
    100 TB the rules side stays a few-KB broadcast (real robots corpora
    are per-host and small) while pages never shuffle; the records frame
    is metadata-only (no body text carried past the scan kernel)."""
    records = _robots_records(spark, sf_dir)
    pages = records.filter(F.col("kind") == "page").select(
        "doc_id", "source", "host", "path", "noindex_hdr", "noindex_meta"
    )
    sel_rules = _robots_selected_rules(records)
    # longest-match + allow-beats-disallow-on-tie in one ordered key
    # (aliased: pages and rules share the records lineage, so the join is
    # technically a self-join)
    matched = (
        pages.alias("p")
        .join(
            F.broadcast(sel_rules.alias("r")),
            (F.col("p.host") == F.col("r.host"))
            & F.col("p.path").startswith(F.col("r.prefix")),
            "left",
        )
        .groupBy(F.col("p.doc_id").alias("doc_id"))
        .agg(
            F.max(
                F.when(
                    F.col("r.prefix").isNotNull(),
                    F.length(F.col("r.prefix")) * 2 + F.col("r.is_allow"),
                )
            ).alias("best"),
        )
        .select(
            "doc_id",
            (F.col("best").isNull() | (F.col("best") % 2 == 1))
            .alias("allowed"),
        )
    )
    gated = pages.join(matched, "doc_id")
    usable = (
        F.col("allowed")
        & (F.col("noindex_hdr") == 0)
        & (F.col("noindex_meta") == 0)
    )
    return (
        gated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum((~F.col("allowed")).cast("long")).alias(
                "n_robots_blocked"
            ),
            F.sum(F.col("noindex_hdr").cast("long")).alias(
                "n_noindex_header"
            ),
            F.sum(F.col("noindex_meta").cast("long")).alias(
                "n_noindex_meta"
            ),
            F.sum(usable.cast("long")).alias("n_usable"),
            F.sum(F.when(usable, F.col("doc_id")).otherwise(0)).alias(
                "usable_doc_id_sum"
            ),
        )
        .orderBy("source")
    )


def _robots_gate_oracle() -> str:
    vals = ",\n         ".join(
        f"({host}, '{agent}', {is_allow}, '{prefix}')"
        for host, txt in sorted(_ROBOTS_TXT.items())
        for agent, is_allow, prefix in _robots_parse(txt)
    )
    return f"""
WITH rules(host, agent, is_allow, prefix) AS (
  VALUES {vals}
),
spec AS (SELECT DISTINCT host FROM rules WHERE agent = '{_ROBOTS_AGENT}'),
sel_rules AS (
  SELECT r.host, r.is_allow, r.prefix
  FROM rules r LEFT JOIN spec s ON s.host = r.host
  WHERE (s.host IS NOT NULL AND r.agent = '{_ROBOTS_AGENT}')
     OR (s.host IS NULL AND r.agent = '*')
),
pages AS (
  SELECT doc_id, source,
         CAST(doc_id % {_ROBOTS_HOSTS} AS INTEGER) AS host,
         '/' || (['public','private','data','tmp'])
               [1 + CAST(doc_id % 4 AS INTEGER)]
             || '/doc/' || doc_id AS path,
         CASE WHEN doc_id % {_NOINDEX_HDR_MOD} = {_NOINDEX_HDR_RES}
              THEN 1 ELSE 0 END AS noindex_hdr,
         CASE WHEN doc_id % {_NOINDEX_HDR_MOD} = {_NOINDEX_META_RES}
              THEN 1 ELSE 0 END AS noindex_meta
  FROM documents
),
verdicts AS (
  SELECT p.doc_id,
         MAX(CASE WHEN r.prefix IS NOT NULL
                  THEN 2 * length(r.prefix) + r.is_allow END) AS best
  FROM pages p
  LEFT JOIN sel_rules r
    ON r.host = p.host AND starts_with(p.path, r.prefix)
  GROUP BY p.doc_id
),
gated AS (
  SELECT p.*,
         (v.best IS NULL OR v.best % 2 = 1) AS allowed
  FROM pages p JOIN verdicts v ON v.doc_id = p.doc_id
)
SELECT source,
       COUNT(*) AS n_pages,
       CAST(count_if(NOT allowed) AS BIGINT) AS n_robots_blocked,
       CAST(SUM(noindex_hdr) AS BIGINT) AS n_noindex_header,
       CAST(SUM(noindex_meta) AS BIGINT) AS n_noindex_meta,
       CAST(count_if(allowed AND noindex_hdr = 0 AND noindex_meta = 0)
            AS BIGINT) AS n_usable,
       CAST(SUM(CASE WHEN allowed AND noindex_hdr = 0 AND noindex_meta = 0
                     THEN doc_id ELSE 0 END) AS BIGINT)
         AS usable_doc_id_sum
FROM gated
GROUP BY source
ORDER BY source
"""



# --------------------------------------------------------------------------
# Manifest-based snapshots + time travel (r15, "Iceberg-lite"): the
# lakehouse layer the maintenance lineage (compaction planning, footer
# census, Z-order, CDC merge) points at — snapshot isolation from JSON
# manifests listing immutable parquet files, and "table AS OF v" reads as
# manifest-pruned scans. Public pattern per the Apache Iceberg spec
# (manifest lists + data-file stats), radically simplified.
# --------------------------------------------------------------------------

_ICEBERG_ROOT = "/tmp/datafusion_impl_spark_iceberg"
#: v1 carries orders with o_orderkey % 3 != 0; snapshot v2 APPENDS the
#: rest — append-only, so v1's files are byte-identical under both reads.
_ICEBERG_APPEND_MOD = 3
_ICEBERG_V1_FILES = 6
_ICEBERG_V2_NEW_FILES = 3


def _iceberg_stage(sf_dir: str) -> str:
    """Stage the two-snapshot table once per sf (pyarrow writes, no Spark
    jobs): sorted immutable data files under ``data/``, and per-snapshot
    JSON manifests under ``metadata/`` listing each file with its row
    count and key range — the stats a manifest-pruned planner needs."""
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as papq

    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join(_ICEBERG_ROOT, tag)
    done = os.path.join(root, "_STAGED")
    if os.path.exists(done):
        return root
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    t = papq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("o_orderkey", "ascending")]))
    keys = t["o_orderkey"]
    rem = pc.subtract(
        keys, pc.multiply(
            pc.divide(keys, _ICEBERG_APPEND_MOD), _ICEBERG_APPEND_MOD
        )
    )  # integer modulo (pyarrow has no mod kernel; keys are non-negative)
    base = t.filter(pc.not_equal(rem, 0))
    appended = t.filter(pc.equal(rem, 0))

    def write_files(part, n_files: int, prefix: str) -> list[dict]:
        per = (part.num_rows + n_files - 1) // n_files
        out = []
        for i in range(n_files):
            chunk = part.slice(i * per, per)
            name = f"{prefix}-{i:02d}.parquet"
            papq.write_table(
                chunk, os.path.join(root, "data", name)
            )
            k = chunk["o_orderkey"]
            out.append(
                {
                    "path": f"data/{name}",
                    "rows": chunk.num_rows,
                    "min_key": pc.min(k).as_py(),
                    "max_key": pc.max(k).as_py(),
                }
            )
        return out

    v1_files = write_files(base, _ICEBERG_V1_FILES, "base")
    v2_new = write_files(appended, _ICEBERG_V2_NEW_FILES, "append")
    for version, files in ((1, v1_files), (2, v1_files + v2_new)):
        with open(
            os.path.join(root, "metadata", f"v{version}.manifest.json"), "w"
        ) as f:
            json.dump(
                {"snapshot_id": version, "files": files}, f, sort_keys=True
            )
    open(done, "w").close()
    return root


def _iceberg_read(spark: SparkSession, sf_dir: str, version: int):
    """``orders AS OF v{version}``: load the snapshot's manifest (bounded
    metadata — this is exactly what an Iceberg reader does driver-side)
    and scan ONLY its listed files. Time travel is therefore free of any
    tombstone/merge logic: files are immutable, the manifest IS the
    table state."""
    import json
    import os

    root = _iceberg_stage(sf_dir)
    with open(
        os.path.join(root, "metadata", f"v{version}.manifest.json")
    ) as f:
        manifest = json.load(f)
    paths = [os.path.join(root, e["path"]) for e in manifest["files"]]
    return spark.read.parquet(*paths), manifest


#: v3 deletes every row with o_orderkey % MOD == RES — WITHOUT rewriting
#: any data file: the snapshot adds one bounded position-delete file
#: (Iceberg v2-spec shape: (file, position) rows) and a manifest.
_ICEBERG_DELETE_MOD, _ICEBERG_DELETE_RES = 11, 5


def _iceberg_stage_v3(sf_dir: str) -> str:
    """Extend the staged table with snapshot v3 (merge-on-read deletes):
    scan the IMMUTABLE v2 data files, record the in-file row position of
    every row matching the delete predicate into
    ``deletes/v3-delete-00.parquet``, and write a v3 manifest listing the
    unchanged v1∪v2 data files plus that delete file. Upgrades an
    already-staged v1/v2 layout in place — data bytes are never touched,
    which IS the merge-on-read contract."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as papq

    root = _iceberg_stage(sf_dir)
    man3 = os.path.join(root, "metadata", "v3.manifest.json")
    if os.path.exists(man3):
        return root
    with open(os.path.join(root, "metadata", "v2.manifest.json")) as f:
        m2 = json.load(f)
    names: list[str] = []
    poss: list[int] = []
    for e in m2["files"]:
        t = papq.read_table(
            os.path.join(root, e["path"]), columns=["o_orderkey"]
        )
        k = t["o_orderkey"]
        rem = pc.subtract(
            k,
            pc.multiply(
                pc.divide(k, _ICEBERG_DELETE_MOD), _ICEBERG_DELETE_MOD
            ),
        )  # integer modulo (keys are non-negative)
        hit = np.nonzero(
            pc.equal(rem, _ICEBERG_DELETE_RES).to_numpy(
                zero_copy_only=False
            )
        )[0]
        fn = os.path.basename(e["path"])
        names.extend([fn] * len(hit))
        poss.extend(int(p) for p in hit)
    os.makedirs(os.path.join(root, "deletes"), exist_ok=True)
    dpath = "deletes/v3-delete-00.parquet"
    papq.write_table(
        pa.table(
            {
                "file_name": pa.array(names, pa.string()),
                "pos": pa.array(poss, pa.int64()),
            }
        ),
        os.path.join(root, dpath),
    )
    with open(man3, "w") as f:
        json.dump(
            {
                "snapshot_id": 3,
                "files": m2["files"],
                "delete_files": [{"path": dpath, "rows": len(poss)}],
            },
            f,
            sort_keys=True,
        )
    return root


def _iceberg_read_v3(spark: SparkSession, sf_dir: str,
                     keep_meta: bool = False):
    """``orders AS OF v3`` merge-on-read: scan the v3 manifest's data
    files (identical bytes to v1∪v2 — no rewrite happened), attach each
    row's physical identity from Spark's file-source metadata column
    (``_metadata.file_path`` + ``_metadata.row_index``), and subtract the
    position-delete file via a BROADCAST anti-join — the delete side is
    bounded metadata (one row per deleted row position, no payload), so
    at 100 TB the read costs the data scan plus a broadcast, never a
    shuffle of the fact table."""
    import json
    import os

    root = _iceberg_stage_v3(sf_dir)
    with open(os.path.join(root, "metadata", "v3.manifest.json")) as f:
        manifest = json.load(f)
    paths = [os.path.join(root, e["path"]) for e in manifest["files"]]
    data = spark.read.parquet(*paths).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias("_fn"),
        F.col("_metadata.row_index").alias("_pos"),
    )
    dels = spark.read.parquet(
        os.path.join(root, manifest["delete_files"][0]["path"])
    ).select(F.col("file_name").alias("_fn"), F.col("pos").alias("_pos"))
    live = data.join(F.broadcast(dels), ["_fn", "_pos"], "left_anti")
    if not keep_meta:
        live = live.drop("_fn", "_pos")
    return live, manifest


def crawl_politeness_schedule(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """CRAWL POLITENESS SCHEDULER — the frontier-planning pass between the
    robots gate and the fetcher: per host, fetches are spaced by the
    host's ``Crawl-delay`` directive (parsed from the planted robots.txt
    BYTES, RFC 9309 group selection — the trainbot group's value wins
    where one exists; hosts without a directive get the {d}s default),
    and the i-th fetch is scheduled at ``(i-1)·delay``. Census per host:
    page count, the effective delay, the host MAKESPAN ``(n-1)·delay``
    (what decides whether a crawl is host-bound), the scheduled-time
    checksum, and whether this host is the crawl's critical path
    (makespan equals the global max — with per-host parallel fetchers the
    wall clock IS the max makespan).

    Scale shape: one rank per host partition + one bounded aggregate —
    the scheduler never materializes a timeline, just closed-form slot
    arithmetic."""
    from pyspark.sql import Window

    records = _robots_records(spark, sf_dir)
    pages = records.filter(F.col("kind") == "page").select("doc_id", "host")
    delays = records.filter(F.col("kind") == "delay").select(
        "host", "agent", F.col("is_allow").alias("delay_s")
    )
    # RFC 9309: a matched specific group is selected WHOLESALE, so the
    # has-trainbot predicate keys off whether a trainbot GROUP exists
    # (any rule OR directive row — same predicate as
    # _robots_selected_rules), not whether a trainbot Crawl-delay row
    # exists; a trainbot group lacking Crawl-delay gets the default,
    # never the * group's value (r15 advice).
    spec = (
        records.filter(
            F.col("kind").isin("rule", "delay")
            & (F.col("agent") == _ROBOTS_AGENT)
        )
        .select("host").distinct().withColumn("has_spec", F.lit(1))
    )
    sel = (
        delays.join(F.broadcast(spec), "host", "left")
        .filter(
            (F.col("has_spec").isNotNull() & (F.col("agent") == _ROBOTS_AGENT))
            | (F.col("has_spec").isNull() & (F.col("agent") == "*"))
        )
        .select("host", "delay_s")
    )
    w = Window.partitionBy("host").orderBy("doc_id")
    sched = (
        pages.join(F.broadcast(sel), "host", "left")
        .withColumn(
            "delay_s",
            F.coalesce(F.col("delay_s"), F.lit(_CRAWL_DELAY_DEFAULT)),
        )
        .withColumn(
            "t", (F.row_number().over(w) - 1) * F.col("delay_s")
        )
    )
    per_host = sched.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.min("delay_s").cast("long").alias("crawl_delay_s"),
        F.max("t").cast("long").alias("makespan_s"),
        F.sum("t").alias("sched_time_sum"),
    )
    gmax = per_host.agg(F.max("makespan_s").alias("g"))
    return (
        per_host.crossJoin(F.broadcast(gmax))
        .select(
            "host", "n_pages", "crawl_delay_s", "makespan_s",
            "sched_time_sum",
            (F.col("makespan_s") == F.col("g")).cast("int")
            .alias("is_critical_path"),
        )
        .orderBy("host")
    )


crawl_politeness_schedule.__doc__ = crawl_politeness_schedule.__doc__.format(
    d=_CRAWL_DELAY_DEFAULT
)


def _politeness_oracle() -> str:
    delay_rows = []
    for host, txt in sorted(_ROBOTS_TXT.items()):
        delays = _robots_parse_delays(txt)
        # RFC 9309 group selection mirrors the Spark side: the trainbot
        # group is selected wholesale when it EXISTS (any rule or
        # directive), and if the selected group has no Crawl-delay the
        # host falls through to the default — never to the * value.
        has_group = any(
            a == _ROBOTS_AGENT for a, _ in delays
        ) or any(a == _ROBOTS_AGENT for a, _, _ in _robots_parse(txt))
        if has_group:
            chosen = next(
                (d for a, d in delays if a == _ROBOTS_AGENT), None
            )
        else:
            chosen = next((d for a, d in delays if a == "*"), None)
        if chosen is not None:
            delay_rows.append((host, chosen))
    vals = ",".join(f"({h},{d})" for h, d in delay_rows)
    return f"""
WITH delays(host, delay_s) AS (VALUES {vals}),
pages AS (
  SELECT doc_id, CAST(doc_id % {_ROBOTS_HOSTS} AS INTEGER) AS host
  FROM documents
),
sched AS (
  SELECT p.host,
         COALESCE(d.delay_s, {_CRAWL_DELAY_DEFAULT}) AS delay_s,
         (ROW_NUMBER() OVER (PARTITION BY p.host ORDER BY p.doc_id) - 1)
           * COALESCE(d.delay_s, {_CRAWL_DELAY_DEFAULT}) AS t
  FROM pages p LEFT JOIN delays d ON d.host = p.host
),
per_host AS (
  SELECT host, COUNT(*) AS n_pages,
         CAST(MIN(delay_s) AS BIGINT) AS crawl_delay_s,
         CAST(MAX(t) AS BIGINT) AS makespan_s,
         CAST(SUM(t) AS BIGINT) AS sched_time_sum
  FROM sched GROUP BY host
)
SELECT host, n_pages, crawl_delay_s, makespan_s, sched_time_sum,
       CAST(CASE WHEN makespan_s = (SELECT MAX(makespan_s) FROM per_host)
                 THEN 1 ELSE 0 END AS INTEGER) AS is_critical_path
FROM per_host
ORDER BY host
"""



def source_wet_conversion_scan(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """WET CONVERSION SIDECAR — Common Crawl's text layer (``.wet``
    files are WARC containers of ``conversion`` records): scan the
    compliance crawl's HTML shards, EXTRACT plain text from each page
    body (the meta-noindex pages are genuinely HTML-wrapped and must be
    unwrapped; header-noindex and plain pages pass through), write a real
    WET shard — one ``conversion`` record per page, linked to its source
    record via ``WARC-Refers-To`` — then SCAN THE WET BACK with the same
    strict double-CRLF-framed reader and census per corpus source:
    conversion count, unwrapped count, extracted chars, and the
    recovered-text hash sum, which must equal the parquet oracle — the
    extraction and both WARC framings round-trip the exact original
    text.

    Scale shape: one shuffle to assemble shards, then a single map-only
    kernel per shard does scan → extract → WET build → WET re-scan; the
    aggregate is one row per source."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source",
        (F.col("doc_id") % _WARC_SHARDS).cast("int").alias("shard_id"),
    )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        sid = int(pdf["shard_id"].iloc[0])
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "warc": [_warc_build_compliance_shard(sid, pdf.itertuples())],
            }
        )

    shards = docs.groupBy("shard_id").applyInPandas(
        build, "shard_id int, warc binary"
    )

    def kernel(batches):
        import pandas as pd

        wrap_pre = "<html><head>" + _NOINDEX_META_TAG + "</head><body>"
        wrap_post = "</body></html>"
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                wet_records = []
                meta = []  # (doc_id, source, unwrapped)
                for wtype, uri, body, hdrs in _warc_scan(bytes(r.warc)):
                    if wtype != "response" or uri.endswith("/robots.txt"):
                        continue
                    doc_id = int(uri.rsplit("/", 1)[1])
                    html = body.decode()
                    # unwrap is SCOPED to the plant arithmetic: only
                    # docs the shard builder machine-wrapped are
                    # unwrapped (for those the frame always matches —
                    # it brackets the text), and corpus text containing
                    # '<html>' passes through untouched instead of
                    # raising, so operator behavior is never a function
                    # of corpus content.
                    if (doc_id % _NOINDEX_HDR_MOD == _NOINDEX_META_RES
                            and html.startswith(wrap_pre)
                            and html.endswith(wrap_post)):
                        text = html[len(wrap_pre):-len(wrap_post)]
                        unwrapped = 1
                    else:
                        text, unwrapped = html, 0
                    wet_records.append(
                        _warc_record(
                            [
                                ("WARC-Type", "conversion"),
                                ("WARC-Record-ID",
                                 f"<urn:uuid:conv-{doc_id}>"),
                                ("WARC-Refers-To",
                                 f"<urn:uuid:page-{doc_id}>"),
                                ("WARC-Date", _WARC_DATE),
                                ("WARC-Target-URI", uri),
                                ("Content-Type", "text/plain"),
                            ],
                            text.encode(),
                        )
                    )
                    meta.append(
                        (doc_id, hdrs.get("x-corpus-source", ""), unwrapped)
                    )
                # the WET shard is real bytes; re-scan it with the same
                # strict reader before emitting anything
                wet = b"".join(wet_records)
                back = {}
                for wtype, uri, payload, _h in _warc_scan(wet):
                    if wtype != "conversion":
                        raise ValueError("non-conversion record in WET")
                    back[int(uri.rsplit("/", 1)[1])] = payload.decode()
                if len(back) != len(meta):
                    raise ValueError("WET round-trip lost records")
                for doc_id, source, unwrapped in meta:
                    rows.append(
                        (doc_id, source, unwrapped, back[doc_id])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "source", "unwrapped", "text"],
            )

    from datafusion_impl_spark.operators import md5_long

    recs = shards.mapInPandas(
        kernel,
        "doc_id bigint, source string, unwrapped int, text string",
    )
    return (
        recs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.col("unwrapped").cast("long")).alias("n_unwrapped"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
            F.sum(md5_long(F.col("text")) % _WARC_HASH_MOD).alias(
                "text_hash_sum"
            ),
        )
        .orderBy("source")
    )


def _wet_oracle() -> str:
    from datafusion_impl_spark.operators import duck_md5_long

    return f"""
SELECT source,
       COUNT(*) AS n_conversions,
       CAST(count_if(doc_id % {_NOINDEX_HDR_MOD} = {_NOINDEX_META_RES})
            AS BIGINT) AS n_unwrapped,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(SUM({duck_md5_long("text")} % {_WARC_HASH_MOD}) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY source
ORDER BY source
"""



#: phantom URLs per host listed in the sitemap but never crawled.
_SITEMAP_PHANTOMS = 3


def crawl_sitemap_coverage_audit(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SITEMAP COVERAGE AUDIT — the crawl-completeness check every
    operator of a 100 TB crawl runs: per host, a real ``urlset`` sitemap
    XML is ASSEMBLED relationally (the even-doc pages each host actually
    publishes plus {ph} phantom URLs that were never fetched, lastmod
    from the doc id), then parsed BACK with the engine's XML reader
    (``from_xml`` with an ARRAY<STRUCT> schema — repeated ``<url>``
    elements) and reconciled against the crawled page set with a full
    outer join. Census per host: listed/crawled counts, the intersection,
    sitemap promises never fetched (phantoms — fetch-queue candidates),
    crawled-but-unlisted pages (link-discovery finds), coverage in basis
    points, and the max lastmod recovered from the parsed XML.

    Scale shape: XML build is one per-host aggregate (bounded by pages
    per host), parse + explode is JVM-side, the reconcile is one
    equi-join on (host, url)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % _ROBOTS_HOSTS).cast("int").alias("host"),
    )
    url = F.concat(
        F.lit("http://host"), F.col("host"), F.lit(".example/"),
        F.element_at(
            F.array(*[F.lit(s) for s in _ROBOTS_SECTIONS]),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ),
        F.lit("/doc/"), F.col("doc_id"),
    )
    crawled = docs.select("host", "doc_id", url.alias("url"))
    lastmod = F.format_string(
        "2024-01-%02d", (F.col("doc_id") % 28 + 1).cast("int")
    )
    entry = F.concat(
        F.lit("<url><loc>"), F.col("url"), F.lit("</loc><lastmod>"),
        lastmod, F.lit("</lastmod></url>"),
    )
    phantom_entries = "".join(
        f"<url><loc>http://hostH.example/phantom/doc/{90000000 + k}</loc>"
        f"<lastmod>2023-12-31</lastmod></url>"
        for k in range(_SITEMAP_PHANTOMS)
    )
    # listing rule must be independent of host parity: doc_id mod 2 is
    # DETERMINED by host under mod-6 hosts (odd hosts only see odd ids),
    # so list docs whose (doc_id // hosts) is even instead
    sitemaps = (
        crawled.filter((F.col("doc_id") / _ROBOTS_HOSTS).cast("long") % 2
                       == 0)
        .withColumn("e", F.struct("doc_id", entry.alias("entry")))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.concat_ws(
                    "",
                    F.transform(
                        F.sort_array(F.collect_list("e")),
                        lambda s: s["entry"],
                    ),
                ),
                F.regexp_replace(
                    F.lit(phantom_entries), "hostH",
                    F.concat(F.lit("host"), F.col("host"))
                ),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
    listed = (
        sitemaps.select(
            "host",
            F.from_xml(
                "xml", "url ARRAY<STRUCT<loc: STRING, lastmod: STRING>>"
            ).alias("p"),
        )
        .select("host", F.explode("p.url").alias("u"))
        .select("host", F.col("u.loc").alias("url"),
                F.col("u.lastmod").alias("lastmod"))
    )
    rec = listed.withColumn("listed", F.lit(1)).join(
        crawled.withColumn("is_crawled", F.lit(1)),
        ["host", "url"],
        "full_outer",
    )
    return (
        rec.groupBy("host")
        .agg(
            F.sum(F.coalesce(F.col("listed"), F.lit(0))).alias("n_listed"),
            F.sum(F.coalesce(F.col("is_crawled"), F.lit(0))).alias(
                "n_crawled"
            ),
            F.sum(
                (F.col("listed").isNotNull()
                 & F.col("is_crawled").isNotNull()).cast("long")
            ).alias("n_both"),
            F.sum(
                (F.col("listed").isNotNull()
                 & F.col("is_crawled").isNull()).cast("long")
            ).alias("n_phantom"),
            F.sum(
                (F.col("listed").isNull()
                 & F.col("is_crawled").isNotNull()).cast("long")
            ).alias("n_unlisted"),
            F.max("lastmod").alias("max_lastmod"),
        )
        .select(
            "host",
            "n_listed",
            "n_crawled",
            "n_both",
            "n_phantom",
            "n_unlisted",
            # div-safe: n_listed >= _SITEMAP_PHANTOMS >= 1 per host.
            # Integral `div` matches the oracle's `//` exactly at any
            # magnitude (double division loses bits past ~1e15 urls).
            F.expr("n_both * 10000 div n_listed").alias("coverage_bps"),
            "max_lastmod",
        )
        .orderBy("host")
    )


crawl_sitemap_coverage_audit.__doc__ = (
    crawl_sitemap_coverage_audit.__doc__.format(ph=_SITEMAP_PHANTOMS)
)

_SITEMAP_SQL = f"""
WITH pages AS (
  SELECT doc_id, CAST(doc_id % {_ROBOTS_HOSTS} AS INTEGER) AS host
  FROM documents
),
per_host AS (
  SELECT host,
         COUNT(*) AS n_crawled,
         count_if((doc_id // 6) % 2 = 0) AS n_both,
         count_if((doc_id // 6) % 2 = 1) AS n_unlisted,
         MAX(CASE WHEN (doc_id // 6) % 2 = 0
                  THEN printf('2024-01-%02d', doc_id % 28 + 1) END)
           AS max_lastmod
  FROM pages GROUP BY host
)
SELECT host,
       CAST(n_both + {_SITEMAP_PHANTOMS} AS BIGINT) AS n_listed,
       CAST(n_crawled AS BIGINT) AS n_crawled,
       CAST(n_both AS BIGINT) AS n_both,
       CAST({_SITEMAP_PHANTOMS} AS BIGINT) AS n_phantom,
       CAST(n_unlisted AS BIGINT) AS n_unlisted,
       -- div-safe: n_listed >= phantom count >= 1
       CAST(n_both * 10000 // (n_both + {_SITEMAP_PHANTOMS}) AS BIGINT)
         AS coverage_bps,
       max_lastmod
FROM per_host
ORDER BY host
"""



def iceberg_time_travel_diff(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """SNAPSHOT TIME TRAVEL + DIFF — the audit every lakehouse migration
    runs ("what did the append change?"): read ``orders AS OF v1`` and
    ``AS OF v2`` as manifest-pruned scans of immutable files, aggregate
    each per order priority, and report the per-priority row/revenue
    delta. The v1 read touches ONLY v1's files (pinned by the plan-audit
    pytest via ``input_file_name()``), so time travel costs the OLD
    snapshot's scan, not the table's.

    At 100 TB: manifests are bounded metadata (one row per file — even a
    million-file table is a few hundred MB read driver-side or as its own
    tiny DataFrame); data files are immutable and never rewritten by an
    append, so v1/v2 scans share the base files' IO and the diff
    parallelizes like any two scans."""
    v1, _m1 = _iceberg_read(spark, sf_dir, 1)
    v2, _m2 = _iceberg_read(spark, sf_dir, 2)

    def census(df: DataFrame, suffix: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias(f"n_{suffix}"),
            F.sum(
                F.col("o_totalprice").cast("decimal(18,2)")
            ).alias(f"rev_{suffix}"),
        )

    return (
        census(v1, "v1")
        .join(census(v2, "v2"), "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_v1",
            "n_v2",
            (F.col("n_v2") - F.col("n_v1")).alias("n_added"),
            F.round(F.col("rev_v1").cast("double"), 2).alias("rev_v1"),
            F.round(
                (F.col("rev_v2") - F.col("rev_v1")).cast("double"), 2
            ).alias("rev_added"),
        )
        .orderBy("o_orderpriority")
    )


_ICEBERG_SQL = f"""
WITH v1 AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_v1,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_v1
  FROM orders WHERE o_orderkey % {_ICEBERG_APPEND_MOD} != 0
  GROUP BY o_orderpriority
),
v2 AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_v2,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_v2
  FROM orders
  GROUP BY o_orderpriority
)
SELECT v1.o_orderpriority,
       n_v1,
       n_v2,
       n_v2 - n_v1 AS n_added,
       ROUND(CAST(rev_v1 AS DOUBLE), 2) AS rev_v1,
       ROUND(CAST(rev_v2 - rev_v1 AS DOUBLE), 2) AS rev_added
FROM v1 JOIN v2 USING (o_orderpriority)
ORDER BY o_orderpriority
"""


#: v4 compacts the table copy-on-write: every v2 data file rewritten with
#: its position deletes APPLIED, into this many sorted files.
_ICEBERG_V4_FILES = 4


def _iceberg_stage_v4(sf_dir: str) -> str:
    """Snapshot v4 = the COMPACTION rewrite that follows a merge-on-read
    delete once read-amplification matters: apply the v3 position-delete
    file to the immutable v2 data files (by FILE + ROW POSITION, not by
    predicate — the compactor only knows the delete file) and write the
    survivors as {n} fresh sorted data files plus a v4 manifest with no
    delete files. v1–v3 remain readable until expired."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    root = _iceberg_stage_v3(sf_dir)
    man4 = os.path.join(root, "metadata", "v4.manifest.json")
    if os.path.exists(man4):
        return root
    with open(os.path.join(root, "metadata", "v3.manifest.json")) as f:
        m3 = json.load(f)
    dels = papq.read_table(
        os.path.join(root, m3["delete_files"][0]["path"])
    )
    dead: dict[str, set[int]] = {}
    for fn, pos in zip(
        dels["file_name"].to_pylist(), dels["pos"].to_pylist()
    ):
        dead.setdefault(fn, set()).add(pos)
    parts = []
    for e in m3["files"]:
        t = papq.read_table(os.path.join(root, e["path"]))
        gone = dead.get(os.path.basename(e["path"]), set())
        keep = [i for i in range(t.num_rows) if i not in gone]
        parts.append(t.take(keep))
    merged = pa.concat_tables(parts).sort_by("o_orderkey")
    per = (merged.num_rows + _ICEBERG_V4_FILES - 1) // _ICEBERG_V4_FILES
    files = []
    for i in range(_ICEBERG_V4_FILES):
        chunk = merged.slice(i * per, per)
        name = f"compact-{i:02d}.parquet"
        papq.write_table(chunk, os.path.join(root, "data", name))
        k = chunk["o_orderkey"]
        files.append(
            {
                "path": f"data/{name}",
                "rows": chunk.num_rows,
                "min_key": k[0].as_py(),
                "max_key": k[-1].as_py(),
            }
        )
    with open(man4, "w") as f:
        json.dump(
            {"snapshot_id": 4, "files": files, "delete_files": []},
            f,
            sort_keys=True,
        )
    return root


_iceberg_stage_v4.__doc__ = _iceberg_stage_v4.__doc__.format(
    n=_ICEBERG_V4_FILES
)


def iceberg_snapshot_expiry_gc(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """SNAPSHOT EXPIRY + ORPHAN-FILE GC — the maintenance pass that keeps
    a lakehouse from growing forever (Iceberg's ``expire_snapshots`` +
    ``remove_orphan_files``): with snapshots v1 (base) / v2 (append) /
    v3 (position delete) / v4 (compaction rewrite) on disk, apply the
    retention policy "retain only the newest snapshot": live files are
    those the v4 manifest references; every file referenced ONLY by the
    expired manifests is an orphan safe to delete. Census per file kind
    (base / append / compact / position-delete): file count, live count,
    orphan count, manifest row totals and the rows the GC would reclaim —
    the append-only base/append generations and the delete file all
    become reclaimable once the compaction snapshot is the only retained
    one, while every compacted row stays live.

    At 100 TB: the ENTIRE decision runs on manifests — bounded metadata,
    one row per file — never on data bytes; the scan-free plan is the
    whole point of manifest-based table formats (a petabyte GC is a
    metadata join). The engine assembles the (file, kind, rows, live)
    table driver-side from the JSON manifests exactly as an Iceberg
    catalog would, then aggregates relationally."""
    import json
    import os

    root = _iceberg_stage_v4(sf_dir)
    manifests = {}
    for v in (1, 2, 3, 4):
        with open(
            os.path.join(root, "metadata", f"v{v}.manifest.json")
        ) as f:
            manifests[v] = json.load(f)
    retained = {4}
    live: set[str] = set()
    for v in retained:
        m = manifests[v]
        live |= {e["path"] for e in m["files"]}
        live |= {e["path"] for e in m.get("delete_files", [])}
    seen: dict[str, tuple[str, int]] = {}
    for v, m in manifests.items():
        for e in m["files"]:
            kind = os.path.basename(e["path"]).split("-")[0]
            seen[e["path"]] = (kind, e["rows"])
        for e in m.get("delete_files", []):
            seen[e["path"]] = ("delete", e["rows"])
    rows = [
        (path, kind, int(nrows), int(path in live))
        for path, (kind, nrows) in sorted(seen.items())
    ]
    files = spark.createDataFrame(
        rows, "path string, kind string, n_rows long, is_live int"
    )
    return (
        files.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("is_live").cast("long").alias("n_live"),
            F.sum(1 - F.col("is_live")).cast("long").alias("n_orphans"),
            F.sum("n_rows").alias("rows_total"),
            F.sum(F.col("n_rows") * (1 - F.col("is_live")))
            .alias("rows_reclaimed"),
        )
        .orderBy("kind")
    )


_ICEBERG_GC_SQL = f"""
WITH kinds AS (
  SELECT 'base' AS kind, {_ICEBERG_V1_FILES} AS n_files, 0 AS n_live,
         (SELECT COUNT(*) FROM orders
          WHERE o_orderkey % {_ICEBERG_APPEND_MOD} != 0) AS rows_total
  UNION ALL
  SELECT 'append', {_ICEBERG_V2_NEW_FILES}, 0,
         (SELECT COUNT(*) FROM orders
          WHERE o_orderkey % {_ICEBERG_APPEND_MOD} = 0)
  UNION ALL
  SELECT 'compact', {_ICEBERG_V4_FILES}, {_ICEBERG_V4_FILES},
         (SELECT COUNT(*) FROM orders
          WHERE o_orderkey % {_ICEBERG_DELETE_MOD} != {_ICEBERG_DELETE_RES})
  UNION ALL
  SELECT 'delete', 1, 0,
         (SELECT COUNT(*) FROM orders
          WHERE o_orderkey % {_ICEBERG_DELETE_MOD} = {_ICEBERG_DELETE_RES})
)
SELECT kind,
       CAST(n_files AS BIGINT) AS n_files,
       CAST(n_live AS BIGINT) AS n_live,
       CAST(n_files - n_live AS BIGINT) AS n_orphans,
       CAST(rows_total AS BIGINT) AS rows_total,
       CAST(CASE WHEN n_live = 0 THEN rows_total ELSE 0 END AS BIGINT)
         AS rows_reclaimed
FROM kinds
ORDER BY kind
"""


# --------------------------------------------------------------------------
# Parquet bloom-filter row-group skipping (r16): the point-lookup index
# layer modern engines add where min/max stats can't prune — a HASH-ordered
# layout gives every row group the full key range, so ONLY a per-row-group
# membership sketch can skip. pyarrow 16 cannot write spec (SBBF) blooms,
# so the layout carries a SIDECAR bloom per row group built with the repo's
# portable md5-Bloom register arithmetic (operators/dedup.py) — which is
# exactly what lets DuckDB replay membership bit-for-bit.
# --------------------------------------------------------------------------

_BLOOMRG_ROOT = "/tmp/datafusion_impl_spark_bloomrg"
_BRG_RGS = 8            # row groups in the staged layout
_BRG_BITS = 16384       # m = 2^14 bits per row-group bloom (2 KB)
_BRG_K = 5              # hash functions
_BRG_BLOCK = 32         # bits per BIGINT register block (sign-safe)
_BRG_PROBE_MOD, _BRG_PROBE_RES, _BRG_PROBES = 7, 1, 40


def _bloomrg_hash(key: int, j: int | None = None) -> int:
    """Python twin of ``operators.md5_long`` over the key (optionally
    salted with ``#j``) — the staging side of the cross-engine contract."""
    import hashlib

    s = str(key) if j is None else f"{key}#{j}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bloomrg_stage(sf_dir: str) -> str:
    """Stage once per sf: ``orders`` keys re-ordered by their md5 hash
    (min/max pruning provably useless — every row group spans ~the whole
    key range) into ONE parquet file of {rgs} row groups, plus a sidecar
    ``blooms.parquet`` holding each row group's {m}-bit filter as 32-bit
    register blocks, and a JSON manifest with the layout arithmetic."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join(_BLOOMRG_ROOT, tag)
    done = os.path.join(root, "_STAGED")
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    t = papq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"]
    )
    keys = sorted(
        t["o_orderkey"].to_pylist(), key=lambda k: (_bloomrg_hash(k), k)
    )
    n = len(keys)
    per = (n + _BRG_RGS - 1) // _BRG_RGS
    papq.write_table(
        pa.table({"o_orderkey": pa.array(keys, pa.int64())}),
        os.path.join(root, "data.parquet"),
        row_group_size=per,
    )
    regs: dict[tuple[int, int], int] = {}
    for idx, k in enumerate(keys):
        rg = idx // per
        for j in range(_BRG_K):
            pos = _bloomrg_hash(k, j) % _BRG_BITS
            blk = (rg, pos // _BRG_BLOCK)
            regs[blk] = regs.get(blk, 0) | (1 << (pos % _BRG_BLOCK))
    items = sorted(regs.items())
    papq.write_table(
        pa.table(
            {
                "rg": pa.array([r for (r, _b), _v in items], pa.int32()),
                "block": pa.array([b for (_r, b), _v in items], pa.int64()),
                "reg": pa.array([v for _k, v in items], pa.int64()),
            }
        ),
        os.path.join(root, "blooms.parquet"),
    )
    with open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump({"rows": n, "per": per, "rgs": _BRG_RGS}, f)
    open(done, "w").close()
    return root


_bloomrg_stage.__doc__ = _bloomrg_stage.__doc__.format(
    rgs=_BRG_RGS, m=_BRG_BITS
)


def parquet_bloom_rowgroup_skipping(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """BLOOM-FILTER ROW-GROUP SKIPPING census: over the hash-ordered
    layout (where min/max stats cannot prune anything), probe every
    planted point-lookup key — {np} keys PRESENT in the table
    (o_orderkey % {pm} == {pr}, smallest first) and their {np} shifted
    ABSENT twins (key + max_key + 1) — against each row group's sidecar
    bloom, and report the per-row-group skip verdicts next to ground
    truth from the data file itself: probes, bloom-maybes, skips, truly
    present, false positives (the bloom contract's price) and false
    negatives (must be ZERO — a bloom only over-admits; the pytest pins
    it).

    Scale shape: the probe plan never scans data pages for skipped
    groups — verdicts come from the broadcast sidecar (2 KB per row
    group at any table size); ground truth is one equi-join of the
    bounded probe set against the data file. At 100 TB the sidecar is
    the only thing a point lookup touches for the groups it skips —
    exactly the parquet SBBF read path, with the repo's portable md5
    registers standing in for the spec's xxhash SBBF (pyarrow 16 cannot
    write those)."""
    import json
    import os

    root = _bloomrg_stage(sf_dir)
    with open(os.path.join(root, "manifest.json")) as f:
        man = json.load(f)
    per, rgs = man["per"], man["rgs"]

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    present = (
        orders.filter(
            F.col("o_orderkey") % _BRG_PROBE_MOD == _BRG_PROBE_RES
        )
        .orderBy("o_orderkey")
        .limit(_BRG_PROBES)
        .select(F.col("o_orderkey").alias("key"))
    )
    mx = orders.agg(F.max("o_orderkey").alias("mx"))
    probes = present.select(
        "key", F.lit(1).alias("expected_present")
    ).unionByName(
        present.crossJoin(F.broadcast(mx)).select(
            (F.col("key") + F.col("mx") + 1).alias("key"),
            F.lit(0).alias("expected_present"),
        )
    )
    rg_ids = spark.range(rgs).select(F.col("id").cast("int").alias("rg"))
    js = F.explode(F.array(*[F.lit(j) for j in range(_BRG_K)]))
    pos = md5_long(
        F.concat(F.col("key").cast("string"), F.lit("#"),
                 F.col("j").cast("string"))
    ) % _BRG_BITS
    ppos = (
        probes.crossJoin(F.broadcast(rg_ids))
        .select("key", "expected_present", "rg", js.alias("j"))
        .select(
            "key", "expected_present", "rg",
            (pos / _BRG_BLOCK).cast("long").alias("block"),
            (pos % _BRG_BLOCK).alias("bit"),
        )
    )
    blooms = spark.read.parquet(os.path.join(root, "blooms.parquet"))
    maybe = (
        ppos.join(F.broadcast(blooms), ["rg", "block"], "left")
        .select(
            "key", "expected_present", "rg",
            (
                F.coalesce(F.col("reg"), F.lit(0))
                .bitwiseAND(F.pow(F.lit(2.0), F.col("bit")).cast("long"))
                != 0
            ).cast("int").alias("bit_set"),
        )
        .groupBy("key", "expected_present", "rg")
        .agg((F.min("bit_set") == 1).alias("bloom_maybe"))
    )
    truth = (
        spark.read.parquet(os.path.join(root, "data.parquet"))
        .select(
            F.col("o_orderkey").alias("key"),
            (F.col("_metadata.row_index") / per).cast("int").alias("rg"),
        )
        .join(probes.select("key"), "key")
        .select("key", "rg", F.lit(1).alias("actually_present"))
    )
    verdicts = maybe.join(truth, ["key", "rg"], "left").select(
        "rg",
        "bloom_maybe",
        F.coalesce("actually_present", F.lit(0)).alias("present"),
    )
    return (
        verdicts.groupBy("rg")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.col("bloom_maybe").cast("long")).alias("n_maybe"),
            F.sum((~F.col("bloom_maybe")).cast("long")).alias("n_skipped"),
            F.sum("present").cast("long").alias("n_present"),
            F.sum(
                (F.col("bloom_maybe") & (F.col("present") == 0))
                .cast("long")
            ).alias("n_false_pos"),
            F.sum(
                (~F.col("bloom_maybe") & (F.col("present") == 1))
                .cast("long")
            ).alias("n_false_neg"),
        )
        .orderBy("rg")
    )


parquet_bloom_rowgroup_skipping.__doc__ = (
    parquet_bloom_rowgroup_skipping.__doc__.format(
        np=_BRG_PROBES, pm=_BRG_PROBE_MOD, pr=_BRG_PROBE_RES
    )
)

_BLOOMRG_SQL = f"""
WITH nrows AS (SELECT COUNT(*) AS n FROM orders),
laid2 AS (
  SELECT o_orderkey AS key,
         CAST((ROW_NUMBER() OVER (
             ORDER BY {duck_md5_long('CAST(o_orderkey AS VARCHAR)')},
                      o_orderkey) - 1)
           // (((SELECT n FROM nrows) + {_BRG_RGS - 1}) // {_BRG_RGS})
           AS INTEGER) AS rg
  FROM orders
),
mpos AS (
  SELECT rg,
         {duck_md5_long(
             "CAST(key AS VARCHAR) || '#' || CAST(j AS VARCHAR)"
         )} % {_BRG_BITS} AS pos
  FROM laid2,
       (SELECT unnest(generate_series(0, {_BRG_K - 1})) AS j) js
),
blooms AS (
  SELECT rg, pos // {_BRG_BLOCK} AS block,
         bit_or(CAST(POW(2, pos % {_BRG_BLOCK}) AS BIGINT)) AS reg
  FROM mpos GROUP BY rg, pos // {_BRG_BLOCK}
),
present AS (
  SELECT o_orderkey AS key FROM orders
  WHERE o_orderkey % {_BRG_PROBE_MOD} = {_BRG_PROBE_RES}
  ORDER BY o_orderkey LIMIT {_BRG_PROBES}
),
probes AS (
  SELECT key, 1 AS expected_present FROM present
  UNION ALL
  SELECT key + (SELECT MAX(o_orderkey) FROM orders) + 1, 0 FROM present
),
ppos AS (
  SELECT p.key, p.expected_present, r.rg,
         {duck_md5_long(
             "CAST(p.key AS VARCHAR) || '#' || CAST(j AS VARCHAR)"
         )} % {_BRG_BITS} AS pos
  FROM probes p,
       (SELECT unnest(generate_series(0, {_BRG_RGS - 1})) AS rg) r,
       (SELECT unnest(generate_series(0, {_BRG_K - 1})) AS j) js
),
maybe AS (
  SELECT key, expected_present, ppos.rg AS rg,
         MIN(CASE WHEN (COALESCE(b.reg, 0)
                        & CAST(POW(2, pos % {_BRG_BLOCK}) AS BIGINT)) <> 0
                  THEN 1 ELSE 0 END) = 1 AS bloom_maybe
  FROM ppos LEFT JOIN blooms b
    ON b.rg = ppos.rg AND b.block = pos // {_BRG_BLOCK}
  GROUP BY key, expected_present, ppos.rg
),
truth AS (
  SELECT l.key, l.rg, 1 AS actually_present
  FROM laid2 l JOIN probes p ON p.key = l.key
),
verdicts AS (
  SELECT m.rg, m.bloom_maybe,
         COALESCE(t.actually_present, 0) AS present
  FROM maybe m LEFT JOIN truth t ON t.key = m.key AND t.rg = m.rg
)
SELECT rg,
       COUNT(*) AS n_probes,
       CAST(SUM(CASE WHEN bloom_maybe THEN 1 ELSE 0 END) AS BIGINT)
         AS n_maybe,
       CAST(SUM(CASE WHEN bloom_maybe THEN 0 ELSE 1 END) AS BIGINT)
         AS n_skipped,
       CAST(SUM(present) AS BIGINT) AS n_present,
       CAST(SUM(CASE WHEN bloom_maybe AND present = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN NOT bloom_maybe AND present = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_neg
FROM verdicts
GROUP BY rg
ORDER BY rg
"""


def iceberg_position_delete_scan(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """ROW-LEVEL DELETES, MERGE-ON-READ (r16): snapshot v3 deletes every
    ``o_orderkey % {mod} == {res}`` row by publishing ONE bounded
    position-delete file — no data file is rewritten. The ``AS OF v3``
    read reconstructs the table by anti-joining the physical
    (file, row-position) identity of each scanned row against the delete
    file (:func:`_iceberg_read_v3`), and this query certifies it against
    the COPY-ON-WRITE equivalent (the rewrite job's predicate applied to
    the v2 read): per priority, v2/v3 row counts, the deleted row count
    and revenue, and a flag that merge-on-read and copy-on-write agree
    exactly — the invariant that makes MOR safe to serve.

    At 100 TB: a delete touching 1/{mod} of a petabyte table costs ONE
    metadata-sized parquet write instead of rewriting every affected data
    file; the read applies it as a broadcast anti-join on (file, pos), so
    the fact scan never shuffles. Closes the CDC lineage
    (plans/cdc.py MERGE/tombstones) into the snapshot layer."""
    v2, _m2 = _iceberg_read(spark, sf_dir, 2)
    mor, _m3 = _iceberg_read_v3(spark, sf_dir)
    # the copy-on-write twin: what a rewrite job (which knows the delete
    # predicate) would have produced by rewriting the data files
    cow = v2.filter(
        F.col("o_orderkey") % _ICEBERG_DELETE_MOD != _ICEBERG_DELETE_RES
    )

    def census(df: DataFrame, suffix: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias(f"n_{suffix}"),
            F.sum(
                F.col("o_totalprice").cast("decimal(18,2)")
            ).alias(f"rev_{suffix}"),
        )

    return (
        census(v2, "v2")
        .join(census(mor, "v3"), "o_orderpriority")
        .join(census(cow, "cow"), "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_v2",
            "n_v3",
            (F.col("n_v2") - F.col("n_v3")).alias("n_deleted"),
            F.round(
                (F.col("rev_v2") - F.col("rev_v3")).cast("double"), 2
            ).alias("rev_deleted"),
            (
                (F.col("n_v3") == F.col("n_cow"))
                & (F.col("rev_v3") == F.col("rev_cow"))
            ).cast("int").alias("mor_matches_cow"),
        )
        .orderBy("o_orderpriority")
    )


iceberg_position_delete_scan.__doc__ = (
    iceberg_position_delete_scan.__doc__.format(
        mod=_ICEBERG_DELETE_MOD, res=_ICEBERG_DELETE_RES
    )
)

_ICEBERG_DELETE_SQL = f"""
WITH v2 AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_v2,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_v2
  FROM orders GROUP BY o_orderpriority
),
v3 AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_v3,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_v3
  FROM orders
  WHERE o_orderkey % {_ICEBERG_DELETE_MOD} != {_ICEBERG_DELETE_RES}
  GROUP BY o_orderpriority
)
SELECT v2.o_orderpriority,
       n_v2,
       n_v3,
       n_v2 - n_v3 AS n_deleted,
       ROUND(CAST(rev_v2 - rev_v3 AS DOUBLE), 2) AS rev_deleted,
       CAST(1 AS INTEGER) AS mor_matches_cow
FROM v2 JOIN v3 USING (o_orderpriority)
ORDER BY o_orderpriority
"""

# --------------------------------------------------------------------------
# PDF text-extraction scan (r15): the document format every training
# pipeline ingests — minimal PDF 1.4 built from the public spec (xref
# table + trailer, catalog→pages→page→contents walk, literal-string
# content streams), with HALF the corpus FlateDecode-compressed through
# the repo's OWN RFC-1951 DEFLATE writer (the PNG-encoder interop
# pattern: stdlib inflate is the independent counter-implementation).
# --------------------------------------------------------------------------

#: odd doc_ids get a /Filter /FlateDecode content stream (own writer);
#: even stay uncompressed — both reader paths exercised every run.
_PDF_FLATE_MOD = 2
#: text is embedded as consecutive literal-string segments of this many
#: BYTES per Tj (UTF-8 may split mid-char — legal, the parser re-joins
#: bytes before decoding).
_PDF_SEG_BYTES = 48
#: bounded modulus for the per-source recovered-text hash sum.
_PDF_HASH_MOD = 1000003

_PDF_ESCAPES = {
    0x5C: b"\\\\", 0x28: b"\\(", 0x29: b"\\)",
    0x0A: b"\\n", 0x0D: b"\\r", 0x09: b"\\t",
}
_PDF_UNESCAPES = {
    b"\\"[0:1]: b"\\", b"("[0:1]: b"(", b")"[0:1]: b")",
    b"n": b"\n", b"r": b"\r", b"t": b"\t",
}


def _pdf_escape(raw: bytes) -> bytes:
    return b"".join(_PDF_ESCAPES.get(b, bytes([b])) for b in raw)


def _pdf_build(doc_id: int, text: str) -> bytes:
    """One minimal-but-real PDF 1.4: header, five indirect objects
    (catalog, pages, page, content stream, font), a byte-exact xref
    table, and a trailer — the parser locates objects THROUGH the xref
    offsets, so any assembly slip is a loud failure. The content stream
    paints the document text as consecutive 48-byte literal-string
    segments (``Tj``); odd doc_ids wrap it in /Filter /FlateDecode
    produced by the repo's own DEFLATE writer."""
    raw = text.encode()
    segs = [
        raw[i:i + _PDF_SEG_BYTES]
        for i in range(0, len(raw), _PDF_SEG_BYTES)
    ] or [b""]
    content = b"BT /F1 12 Tf 72 720 Td\n" + b"".join(
        b"(" + _pdf_escape(s) + b") Tj 0 -14 Td\n" for s in segs
    ) + b"ET\n"
    if doc_id % _PDF_FLATE_MOD == 1:
        from datafusion_impl_spark.operators.multimodal import (
            _zlib_compress_own,
        )

        body = _zlib_compress_own(content, doc_id)
        filt = b" /Filter /FlateDecode"
    else:
        body, filt = content, b""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for n in (1, 2, 3, 4, 5):
        offsets[n] = len(out)
        if n == 4:
            out += (
                b"4 0 obj\n<< /Length " + str(len(body)).encode() + filt
                + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
            )
        else:
            out += (
                str(n).encode() + b" 0 obj\n" + objs[n] + b"\nendobj\n"
            )
    xref_at = len(out)
    out += b"xref\n0 6\n" + b"0000000000 65535 f\r\n" + b"".join(
        f"{offsets[n]:010d} 00000 n\r\n".encode() for n in (1, 2, 3, 4, 5)
    )
    out += (
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def _pdf_extract(data: bytes) -> dict:
    """Strict text extraction: startxref → xref table → object offsets →
    trailer /Root → catalog → pages → page → content stream (exactly
    /Length bytes, inflated when /Filter /FlateDecode) → literal-string
    walk with escape handling. Every structural assumption raises
    ``ValueError`` loudly — a parser that sniffs for ``(...)`` instead of
    walking the document tree would pass planted files and fail real
    ones."""
    import re
    import zlib

    if not data.startswith(b"%PDF-"):
        raise ValueError("missing %PDF header")
    tail = data[-256:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("missing startxref/%%EOF trailer")
    xref_at = int(m.group(1))
    if not data[xref_at:xref_at + 4] == b"xref":
        raise ValueError("startxref does not point at an xref table")
    hdr = re.match(rb"xref\n(\d+) (\d+)\n", data[xref_at:])
    if not hdr or int(hdr.group(1)) != 0:
        raise ValueError("unsupported xref subsection header")
    n_objs = int(hdr.group(2))
    entries_at = xref_at + hdr.end()
    offsets = {}
    for i in range(n_objs):
        e = data[entries_at + 20 * i:entries_at + 20 * (i + 1)]
        if len(e) != 20 or e[17:18] not in (b"n", b"f"):
            raise ValueError(f"malformed xref entry {i}")
        if e[17:18] == b"n":
            offsets[i] = int(e[:10])
    trailer_at = data.index(b"trailer", entries_at)
    troot = re.search(rb"/Root (\d+) 0 R", data[trailer_at:trailer_at + 128])
    if not troot:
        raise ValueError("trailer missing /Root")

    def obj(num: int) -> bytes:
        at = offsets.get(num)
        if at is None:
            raise ValueError(f"object {num} not in xref")
        head = f"{num} 0 obj".encode()
        if data[at:at + len(head)] != head:
            raise ValueError(f"xref offset for object {num} is wrong")
        return data[at:data.index(b"endobj", at)]

    cat = obj(int(troot.group(1)))
    pages_ref = re.search(rb"/Pages (\d+) 0 R", cat)
    if not pages_ref:
        raise ValueError("catalog missing /Pages")
    pages = obj(int(pages_ref.group(1)))
    kid = re.search(rb"/Kids \[(\d+) 0 R\]", pages)
    if not kid:
        raise ValueError("pages missing /Kids")
    page = obj(int(kid.group(1)))
    cref = re.search(rb"/Contents (\d+) 0 R", page)
    if not cref:
        raise ValueError("page missing /Contents")
    cobj = obj(int(cref.group(1)))
    ln = re.search(rb"/Length (\d+)", cobj)
    if not ln:
        raise ValueError("content stream missing /Length")
    is_flate = b"/FlateDecode" in cobj
    s_at = cobj.index(b"stream\n") + len(b"stream\n")
    body = cobj[s_at:s_at + int(ln.group(1))]
    if len(body) != int(ln.group(1)) or not cobj[
        s_at + len(body):
    ].lstrip(b"\r\n").startswith(b"endstream"):
        raise ValueError("/Length does not frame the stream")
    if is_flate:
        body = zlib.decompress(body)
    # literal-string walk: (…) Tj segments concatenated in order
    out, i = bytearray(), 0
    while True:
        at = body.find(b"(", i)
        if at < 0:
            break
        j = at + 1
        while True:
            if j >= len(body):
                raise ValueError("unterminated literal string")
            c = body[j:j + 1]
            if c == b"\\":
                esc = body[j + 1:j + 2]
                if esc not in _PDF_UNESCAPES:
                    raise ValueError(f"unsupported escape {esc!r}")
                out += _PDF_UNESCAPES[esc]
                j += 2
            elif c == b")":
                j += 1
                break
            else:
                out += c
                j += 1
        if body[j:j + 3] != b" Tj":
            raise ValueError("literal string not painted with Tj")
        i = j
    return {
        "text": out.decode(),
        "is_flate": int(is_flate),
        "n_objects": len(offsets),
    }


def source_pdf_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF TEXT-EXTRACTION SCAN — the document-ingest layer next to
    WARC/Avro/protobuf/zstd: every document is written as a minimal-but-
    real PDF 1.4 (xref table, catalog→pages→page→contents object walk,
    literal-string content streams; odd ids FlateDecode-compressed by the
    repo's OWN RFC-1951 DEFLATE writer, inflated back by stdlib zlib —
    both-directions interop for the compression layer), then the text is
    recovered purely from bytes and censused per source. The recovered-
    text hash sum must match the parquet oracle, so a one-byte slip in
    xref offsets, /Length framing, escaping, or the DEFLATE layer
    diverges the value hash.

    Scale shape: map-only build + parse (one PDF per document, the real
    corpus shape); the aggregate is one row per source."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def build(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "pdf": [
                        _pdf_build(int(r.doc_id), str(r.text))
                        for r in pdf.itertuples()
                    ],
                }
            )

    blobs = docs.mapInPandas(
        build, "doc_id bigint, source string, pdf binary"
    )

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                m = _pdf_extract(bytes(r.pdf))
                rows.append(
                    (
                        str(r.source),
                        m["is_flate"],
                        m["n_objects"],
                        len(m["text"]),
                        m["text"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["source", "is_flate", "n_objects",
                         "n_chars", "text"],
            )

    from datafusion_impl_spark.operators import md5_long

    recs = blobs.mapInPandas(
        scan,
        "source string, is_flate int, n_objects int, "
        "n_chars long, text string",
    )
    return (
        recs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pdfs"),
            F.sum(F.col("is_flate").cast("long")).alias("n_flate"),
            F.sum(F.col("n_objects").cast("long")).alias("n_objects"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(md5_long(F.col("text")) % _PDF_HASH_MOD).alias(
                "text_hash_sum"
            ),
        )
        .orderBy("source")
    )


def _pdf_oracle() -> str:
    from datafusion_impl_spark.operators import duck_md5_long

    return f"""
SELECT source,
       COUNT(*) AS n_pdfs,
       CAST(count_if(doc_id % {_PDF_FLATE_MOD} = 1) AS BIGINT) AS n_flate,
       CAST(5 * COUNT(*) AS BIGINT) AS n_objects,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(SUM({duck_md5_long("text")} % {_PDF_HASH_MOD}) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY source
ORDER BY source
"""

# --------------------------------------------------------------------------
# Avro Object Container File round-trip (the one mainstream ingest format
# still absent from CSV/JSON/JSONL/XML/ORC/parquet/tar/gzip)
# --------------------------------------------------------------------------
# The container ships no spark-avro DataSource jar, so the OCF layer is
# implemented from the PUBLIC Avro 1.12 spec directly: zigzag-varint
# longs/ints, length-prefixed strings, IEEE-LE doubles, ["null", T] unions,
# deflate-codec blocks (raw RFC-1951), and the 16-byte sync marker between
# blocks. Writer and reader are independent enough that a one-byte slip in
# either diverges the value hash against the parquet oracle.

#: lineitem hash-shards into this many .avro container files.
_AVRO_SHARDS = 8
#: records per OCF block — small enough that every shard spans MANY blocks,
#: so the reader's block loop + per-block sync check is really exercised.
_AVRO_BLOCK_RECORDS = 1000
#: rows with l_orderkey % this == 0 plant a null into the union field.
_AVRO_NULL_MOD = 11

#: The writer schema (embedded in every container's metadata; the reader
#: decodes records by walking THIS JSON, not a hard-coded field list).
_AVRO_SCHEMA_JSON = (
    '{"type":"record","name":"lineitem","fields":['
    '{"name":"l_orderkey","type":"long"},'
    '{"name":"l_linenumber","type":"int"},'
    '{"name":"l_quantity","type":"double"},'
    '{"name":"l_extendedprice","type":"double"},'
    '{"name":"l_returnflag","type":"string"},'
    '{"name":"l_linestatus","type":["null","string"]}]}'
)


def _avro_zigzag(n: int) -> bytes:
    """Encode a long as Avro's zigzag varint."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_encode_shard(shard_id: int, rows) -> bytes:
    """Serialize rows (iterable of tuples matching the schema field order)
    into one deflate-codec OCF: magic, metadata map, sync, then blocks of
    ``_AVRO_BLOCK_RECORDS`` records each followed by the sync marker."""
    import hashlib
    import struct
    import zlib

    def s(v: str) -> bytes:
        b = v.encode()
        return _avro_zigzag(len(b)) + b

    sync = hashlib.md5(f"avro-shard-{shard_id}".encode()).digest()
    out = bytearray(b"Obj\x01")
    out += _avro_zigzag(2)  # metadata map: one block of 2 entries
    out += s("avro.schema") + s(_AVRO_SCHEMA_JSON)
    out += s("avro.codec") + s("deflate")
    out += _avro_zigzag(0)  # map terminator
    out += sync

    buf = bytearray()
    n_in_block = 0

    def flush() -> None:
        nonlocal buf, n_in_block
        if not n_in_block:
            return
        comp = zlib.compressobj(wbits=-15)  # Avro deflate = raw RFC-1951
        body = comp.compress(bytes(buf)) + comp.flush()
        out.extend(_avro_zigzag(n_in_block))
        out.extend(_avro_zigzag(len(body)))
        out.extend(body)
        out.extend(sync)
        buf = bytearray()
        n_in_block = 0

    for ok, ln, qty, price, rf, ls in rows:
        buf += _avro_zigzag(int(ok))
        buf += _avro_zigzag(int(ln))
        buf += struct.pack("<d", float(qty))
        buf += struct.pack("<d", float(price))
        buf += s(rf)
        if ls is None:
            buf += _avro_zigzag(0)  # union branch 0: null
        else:
            buf += _avro_zigzag(1) + s(ls)
        n_in_block += 1
        if n_in_block >= _AVRO_BLOCK_RECORDS:
            flush()
    flush()
    return bytes(out)


def _avro_decode(data: bytes):
    """Parse an OCF from its bytes alone, driven by the EMBEDDED schema
    (supports long/int/double/string and ["null", T] unions; codecs null
    and deflate). Yields one tuple per record in field order. Raises
    ``ValueError`` on a bad magic, unknown codec/type, sync-marker
    mismatch, or a truncated block — corrupt containers fail loudly."""
    import json
    import struct
    import zlib

    if data[:4] != b"Obj\x01":
        raise ValueError("not an Avro object container file")
    pos = 4

    def read_long(b, p):
        u = shift = 0
        while True:
            if p >= len(b):
                raise ValueError("truncated varint")
            byte = b[p]
            p += 1
            u |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return (u >> 1) ^ -(u & 1), p
            shift += 7

    def read_bytes(b, p):
        n, p = read_long(b, p)
        if n < 0 or p + n > len(b):
            raise ValueError("truncated bytes value")
        return b[p : p + n], p + n

    meta = {}
    while True:
        count, pos = read_long(data, pos)
        if count == 0:
            break
        if count < 0:  # spec: negative count prefixes a byte-size long
            count = -count
            _, pos = read_long(data, pos)
        for _ in range(count):
            k, pos = read_bytes(data, pos)
            v, pos = read_bytes(data, pos)
            meta[k.decode()] = v
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    if schema.get("type") != "record":
        raise ValueError("only record schemas supported")
    fields = [f["type"] for f in schema["fields"]]
    sync = data[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated header sync marker")
    pos += 16

    def read_value(ftype, b, p):
        if isinstance(ftype, list):  # union — branch index then value
            idx, p = read_long(b, p)
            if not 0 <= idx < len(ftype):
                raise ValueError("union branch out of range")
            branch = ftype[idx]
            if branch == "null":
                return None, p
            return read_value(branch, b, p)
        if ftype in ("long", "int"):
            return read_long(b, p)
        if ftype == "double":
            if p + 8 > len(b):
                raise ValueError("truncated double")
            return struct.unpack_from("<d", b, p)[0], p + 8
        if ftype == "string":
            raw, p = read_bytes(b, p)
            return raw.decode(), p
        raise ValueError(f"unsupported Avro type {ftype!r}")

    while pos < len(data):
        count, pos = read_long(data, pos)
        size, pos = read_long(data, pos)
        if count < 0 or size < 0 or pos + size > len(data):
            raise ValueError("truncated Avro block")
        body = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            body = zlib.decompressobj(-15).decompress(body)
        p = 0
        for _ in range(count):
            row = []
            for ftype in fields:
                v, p = read_value(ftype, body, p)
                row.append(v)
            yield tuple(row)
        if p != len(body):
            raise ValueError("trailing bytes inside Avro block")
        if data[pos : pos + 16] != sync:
            raise ValueError("Avro sync marker mismatch")
        pos += 16


def avro_lineitem_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → hash-sharded Avro OCFs on disk (deflate codec, multi-
    block, planted union-nulls) → ``binaryFile`` scan → schema-driven OCF
    decode → pricing aggregate per return flag. The oracle aggregates the
    ORIGINAL parquet (replaying the null plant), so equality proves the
    full write→read cycle preserves every varint, IEEE double, UTF-8
    string, union branch, and block boundary exactly.

    Scale shape: the shard assembly is one shuffle (``applyInPandas`` over
    the shard key — the distributed object-writer shape), the scan is
    per-file parallel with blobs never shuffling (decode happens in the
    scan stage; only typed rows reach the aggregate)."""
    import shutil

    import pandas as pd

    path = os.path.join(
        _JSONL_ROOT, os.path.basename(sf_dir.rstrip("/")), "li_avro"
    )
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag",
        F.when(F.col("l_orderkey") % _AVRO_NULL_MOD == 0, F.lit(None))
        .otherwise(F.col("l_linestatus"))
        .alias("l_linestatus"),
        (F.col("l_orderkey") % _AVRO_SHARDS).cast("int").alias("shard_id"),
    )

    def build(pdf):
        pdf = pdf.sort_values(["l_orderkey", "l_linenumber"])
        shard = int(pdf["shard_id"].iloc[0])
        rows = zip(
            pdf["l_orderkey"], pdf["l_linenumber"], pdf["l_quantity"],
            pdf["l_extendedprice"], pdf["l_returnflag"],
            (None if pd.isna(v) else v for v in pdf["l_linestatus"]),
        )
        return pd.DataFrame(
            {"shard_id": [shard], "ocf": [_avro_encode_shard(shard, rows)]}
        )

    shards = li.groupBy("shard_id").applyInPandas(
        build, "shard_id int, ocf binary"
    )

    def write_files(rows) -> None:
        for r in rows:
            with open(
                os.path.join(path, f"part_{r['shard_id']}.avro"), "wb"
            ) as f:
                f.write(bytes(r["ocf"]))

    shards.foreachPartition(write_files)

    back_raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )

    def decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                recs = list(_avro_decode(bytes(blob)))
                yield pd.DataFrame(
                    recs,
                    columns=[
                        "l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_returnflag", "l_linestatus",
                    ],
                )

    back = back_raw.mapInPandas(
        decode,
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_returnflag string, l_linestatus string",
    )
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_orderkey").cast("long").alias("sum_orderkey"),
            F.sum(F.col("l_quantity").cast("decimal(12,4)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,4)"))
            .cast("double")
            .alias("sum_price"),
            F.sum(F.col("l_linestatus").isNull().cast("long")).alias(
                "n_null_status"
            ),
            F.countDistinct("l_linestatus").alias("n_status"),
        )
        .orderBy("l_returnflag")
    )


_AVRO_ROUNDTRIP_SQL = f"""
WITH src AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         l_returnflag,
         CASE WHEN l_orderkey % {_AVRO_NULL_MOD} = 0 THEN NULL
              ELSE l_linestatus END AS l_linestatus
  FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
         AS sum_price,
       CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_status,
       COUNT(DISTINCT l_linestatus) AS n_status
FROM src
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Protobuf wire-format record stream (length-delimited messages — the other
# ubiquitous binary transport next to Avro)
# --------------------------------------------------------------------------
# Implemented from the PUBLIC protobuf encoding spec: base-128 varints,
# zigzag sint64, length-delimited strings, and field tags (field_no << 3 |
# wire_type). The writer plants an EXTRA field the schema doesn't know
# (field 7, fixed64) so the reader's unknown-field SKIPPING — the wire
# format's forward-compatibility contract — is value-checked, not just
# implemented.

#: documents hash into this many length-delimited .pb stream shards.
_PB_SHARDS = 8
#: signed value planted in the zigzag sint64 field: n_chars - this offset
#: goes negative for short docs, so both zigzag branches are exercised.
_PB_SIGN_OFFSET = 500


def _pb_varint(n: int) -> bytes:
    """Unsigned base-128 varint."""
    if n < 0:
        raise ValueError("varint requires a non-negative value")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_encode_doc(doc_id: int, text: str, source: str, n_chars: int) -> bytes:
    """One document message: field 1 doc_id (varint), field 2 text
    (length-delimited), field 3 source (length-delimited), field 4
    n_chars-offset (zigzag sint64), field 7 an UNKNOWN fixed64 the reader
    must skip."""
    import struct

    out = bytearray()
    out += _pb_varint(1 << 3 | 0) + _pb_varint(doc_id)
    tb = text.encode()
    out += _pb_varint(2 << 3 | 2) + _pb_varint(len(tb)) + tb
    sb = source.encode()
    out += _pb_varint(3 << 3 | 2) + _pb_varint(len(sb)) + sb
    signed = n_chars - _PB_SIGN_OFFSET
    out += _pb_varint(4 << 3 | 0) + _pb_varint((signed << 1) ^ (signed >> 63))
    out += _pb_varint(7 << 3 | 1) + struct.pack("<Q", doc_id * 977 % 2**64)
    return bytes(out)


def _pb_decode_stream(data: bytes):
    """Parse a length-delimited stream of document messages from bytes
    alone; yields (doc_id, text, source, n_chars). Unknown fields are
    skipped by wire type (varint / fixed64 / length-delimited / fixed32);
    anything structurally broken raises ``ValueError``."""

    def varint(b, p):
        u = shift = 0
        while True:
            if p >= len(b):
                raise ValueError("truncated varint")
            byte = b[p]
            p += 1
            u |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return u, p
            shift += 7
            if shift > 63:
                raise ValueError("varint overflow")

    pos = 0
    while pos < len(data):
        mlen, pos = varint(data, pos)
        if pos + mlen > len(data):
            raise ValueError("truncated message")
        msg = data[pos : pos + mlen]
        pos += mlen
        doc_id = text = source = n_chars = None
        p = 0
        while p < len(msg):
            tag, p = varint(msg, p)
            field, wt = tag >> 3, tag & 7
            if wt == 0:
                v, p = varint(msg, p)
                if field == 1:
                    doc_id = v
                elif field == 4:
                    n_chars = (v >> 1) ^ -(v & 1)  # zigzag
            elif wt == 2:
                ln, p = varint(msg, p)
                if p + ln > len(msg):
                    raise ValueError("truncated length-delimited field")
                raw = msg[p : p + ln]
                p += ln
                if field == 2:
                    text = raw.decode()
                elif field == 3:
                    source = raw.decode()
            elif wt == 1:  # fixed64 — skip (the planted unknown field)
                if p + 8 > len(msg):
                    raise ValueError("truncated fixed64")
                p += 8
            elif wt == 5:  # fixed32 — skip
                if p + 4 > len(msg):
                    raise ValueError("truncated fixed32")
                p += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
        if doc_id is None or text is None or source is None or n_chars is None:
            raise ValueError("message missing a required field")
        yield doc_id, text, source, n_chars + _PB_SIGN_OFFSET


def source_protobuf_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROTOBUF ingestion round-trip: hash-shard the documents, encode each
    shard as a length-delimited stream of wire-format messages (varints,
    zigzag sint64, length-delimited strings, plus an UNKNOWN field the
    reader must skip by wire type), decode the shards back in an Arrow-
    batched kernel, and aggregate per shard with a bounded content-hash
    sum — any slip in varint continuation, zigzag, length framing, UTF-8,
    or unknown-field skipping shifts the remaining stream and diverges the
    hash, which the oracle recomputes from the original parquet.

    Scale shape: identical to the gzip-JSONL twin — one shuffle to
    assemble shards, map-only decode, {shards}-row aggregate."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text",
        (F.col("doc_id") % _PB_SHARDS).cast("int").alias("shard_id"),
    )

    def build(pdf):
        pdf = pdf.sort_values("doc_id")
        out = bytearray()
        for r in pdf.itertuples():
            msg = _pb_encode_doc(
                int(r.doc_id), r.text, r.source, int(r.n_chars)
            )
            out += _pb_varint(len(msg)) + msg
        return pd.DataFrame(
            {"shard_id": [int(pdf["shard_id"].iloc[0])], "pb": [bytes(out)]}
        )

    shards = docs.groupBy("shard_id").applyInPandas(
        build, "shard_id int, pb binary"
    )

    def decode(batches):
        for pdf in batches:
            sids, ids, texts, srcs, ncs = [], [], [], [], []
            for r in pdf.itertuples():
                for doc_id, text, source, n_chars in _pb_decode_stream(
                    bytes(r.pb)
                ):
                    sids.append(int(r.shard_id))
                    ids.append(doc_id)
                    texts.append(text)
                    srcs.append(source)
                    ncs.append(n_chars)
            yield pd.DataFrame(
                {
                    "shard_id": sids,
                    "doc_id": ids,
                    "text": texts,
                    "source": srcs,
                    "n_chars": ncs,
                }
            )

    back = shards.mapInPandas(
        decode,
        "shard_id int, doc_id long, text string, source string, n_chars long",
    )
    from datafusion_impl_spark.operators import md5_long

    return (
        back.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(md5_long(F.col("text")) % _GZ_HASH_MOD).alias(
                "text_hash_sum"
            ),
        )
        .orderBy("shard_id")
    )


def _protobuf_oracle() -> str:
    from datafusion_impl_spark.operators import duck_md5_long

    return f"""
SELECT CAST(doc_id % {_PB_SHARDS} AS INTEGER) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM({duck_md5_long("text")} % {_GZ_HASH_MOD}) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY 1
ORDER BY shard_id
"""


QUERIES = {
    "binaryfile_media_scan": binaryfile_media_scan,
    "csv_reference_golden": csv_reference_golden,
    "jsonl_documents_roundtrip": jsonl_documents_roundtrip,
    "orc_lineitem_roundtrip": orc_lineitem_roundtrip,
    "xml_documents_roundtrip": xml_documents_roundtrip,
    "bucketed_orders_pruned_join": bucketed_orders_pruned_join,
    "parquet_schema_evolution_merge": parquet_schema_evolution_merge,
    "zorder_orders_layout": zorder_orders_layout,
    "compact_small_files_plan": compact_small_files_plan,
    "file_lineage_orders": file_lineage_orders,
    "csv_documents_roundtrip": csv_documents_roundtrip,
    "source_gzip_jsonl_scan": source_gzip_jsonl_scan,
    "source_zstd_seekable_scan": source_zstd_seekable_scan,
    "source_warc_scan": source_warc_scan,
    "warc_robots_compliance_gate": warc_robots_compliance_gate,
    "crawl_politeness_schedule": crawl_politeness_schedule,
    "source_wet_conversion_scan": source_wet_conversion_scan,
    "crawl_sitemap_coverage_audit": crawl_sitemap_coverage_audit,
    "iceberg_time_travel_diff": iceberg_time_travel_diff,
    "iceberg_position_delete_scan": iceberg_position_delete_scan,
    "iceberg_snapshot_expiry_gc": iceberg_snapshot_expiry_gc,
    "parquet_bloom_rowgroup_skipping": parquet_bloom_rowgroup_skipping,
    "source_pdf_scan": source_pdf_scan,
    "parquet_footer_census": parquet_footer_census,
    "avro_lineitem_roundtrip": avro_lineitem_roundtrip,
    "source_protobuf_scan": source_protobuf_scan,
}

ORACLES = {
    "binaryfile_media_scan": _BINARYFILE_SQL,
    "csv_reference_golden": _CSV_GOLDEN_SQL,
    "jsonl_documents_roundtrip": _JSONL_ROUNDTRIP_SQL,
    "orc_lineitem_roundtrip": _ORC_ROUNDTRIP_SQL,
    "xml_documents_roundtrip": _XML_ROUNDTRIP_SQL,
    "bucketed_orders_pruned_join": _BUCKETED_JOIN_SQL,
    "parquet_schema_evolution_merge": _SCHEMA_EVO_SQL,
    "zorder_orders_layout": _ZORDER_SQL,
    # ORDERING CONTRACT: this oracle reads the 12-file layout the Spark
    # query itself writes (mode=overwrite), so the Spark side MUST run
    # first at the same sf (the driver and scripts/check_oracles.py both
    # do) — it cannot be oracle-side staged because the file split is
    # Spark's hash partitioning.
    "compact_small_files_plan": _compact_plan_oracle("sf0.01"),
    "file_lineage_orders": _FILE_LINEAGE_SQL,
    "csv_documents_roundtrip": _CSV_ROUNDTRIP_SQL,
    "source_gzip_jsonl_scan": _gzip_jsonl_oracle(),
    "source_zstd_seekable_scan": _zstd_seekable_oracle(),
    "source_warc_scan": _warc_oracle(),
    "warc_robots_compliance_gate": _robots_gate_oracle(),
    "crawl_politeness_schedule": _politeness_oracle(),
    "source_wet_conversion_scan": _wet_oracle(),
    "crawl_sitemap_coverage_audit": _SITEMAP_SQL,
    "iceberg_time_travel_diff": _ICEBERG_SQL,
    "iceberg_position_delete_scan": _ICEBERG_DELETE_SQL,
    "iceberg_snapshot_expiry_gc": _ICEBERG_GC_SQL,
    "parquet_bloom_rowgroup_skipping": _BLOOMRG_SQL,
    "source_pdf_scan": _pdf_oracle(),
    "parquet_footer_census": _footer_census_oracle_staged,  # lazy: stages
    "avro_lineitem_roundtrip": _AVRO_ROUNDTRIP_SQL,
    "source_protobuf_scan": _protobuf_oracle(),
}
