"""Table sources: parquet registry for the driver testdata, plus the CSV /
inline-VALUES readers the reference exercises.

Reference surface reproduced (SURVEY.md §2.2):
- CSV scan with schema inference  (``tests/regexp-tests.rs:14``, ``readme.md:46``)
- inline literal VALUES tables    (``tests/regexp-tests.rs:84,118-125``)
- parquet (driver testdata; trivial in Spark)

Scale note: ``load_table`` is a bare ``spark.read.parquet`` on purpose —
column pruning and predicate pushdown are Catalyst's job, and they only work
when the scan is declared lazily and filtered/projected by the caller. Do not
cache or materialize here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver generates at every scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins: at any
#: scale factor these stay tiny (region=5, nation=25 rows) or grow far slower
#: than the fact tables.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily scan one testdata table. ``sf_dir`` like ``/root/testdata/sf0.01``.

    ``events.ts`` has shipped in two physical shapes across testdata
    generations: parquet TIMESTAMP(NANOS) — which Spark only reads via the
    ``nanosAsLong`` legacy conf, as a raw-nanos bigint — and native
    TIMESTAMP(MICROS). We normalize both to a session-timezone TIMESTAMP
    (the session factory pins UTC, so wall-clock values agree with the
    DuckDB oracle either way). The conf is set guarded, set-once, always to
    the same value, which is benign under concurrent readers.
    """
    if name == "events":
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # legacy TIMESTAMP(NANOS) read as raw nanos
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        # native TIMESTAMP / TIMESTAMP_NTZ (driver sessions may infer either,
        # depending on spark.sql.parquet.inferTimestampNTZ.enabled)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_all(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` queries see them."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, infer_schema: bool = True) -> DataFrame:
    """CSV scan with schema inference — mirrors ``ctx.read_csv`` (readme.md:46).

    ``inferSchema=True`` matches the reference's behavior; production callers
    should pass an explicit schema (inference double-scans the file).
    """
    return spark.read.csv(path, header=True, inferSchema=infer_schema)


def values_table(spark: SparkSession, rows: list[tuple], columns: list[str]) -> DataFrame:
    """Inline literal table — mirrors ``FROM (VALUES ...) as t(...)``
    (``tests/regexp-tests.rs:84``)."""
    return spark.createDataFrame(rows, schema=columns)
