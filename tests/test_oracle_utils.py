"""Regression tests: tests.oracle_utils must be at least as strict as the
driver's hash gate. Both r4 red driver rows were GREEN under the r4-era
comparator — these tests reproduce each failure class and assert the
comparator now rejects them, plus that the repo's fixed versions pass."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare_spark_duckdb


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_raw_array_column_rejected(spark, duck):
    """r4 `scalar_array_struct_functions` class: a raw array column in
    driver-facing output aborted the driver (`unhashable type: 'list'`)
    but passed the old comparator (it normalized lists to tuples)."""
    df = spark.range(3).select(
        F.col("id"), F.array(F.col("id"), F.col("id") + 1).alias("arr")
    )
    ok, msg = compare_spark_duckdb(
        df, duck, "SELECT range AS id, [range, range+1] AS arr FROM range(3)"
    )
    assert not ok
    assert "arr" in msg and "unhashable" in msg


def test_uncast_hugeint_sum_rejected(spark, duck):
    """r4 `doc_length_quantile_bins` class: DuckDB SUM(BIGINT) returns
    HUGEINT (pandas float64) vs Spark's int64 — a driver hash mismatch at
    equal values, invisible to the old comparator (it coerced types)."""
    df = spark.range(3).agg(F.sum("id").alias("total"))
    ok, msg = compare_spark_duckdb(
        df, duck, "SELECT SUM(range) AS total FROM range(3)"
    )
    assert not ok
    assert "total" in msg and "HUGEINT" in msg
    ok, msg = compare_spark_duckdb(
        df, duck, "SELECT CAST(SUM(range) AS BIGINT) AS total FROM range(3)"
    )
    assert ok, msg


def test_int_width_difference_tolerated(spark, duck):
    """DuckDB BIGINT vs Spark int32 at equal values is driver-GREEN
    (observed on chunk_documents_sliding r3, embedding_dimension_stats r3,
    interleave_sources_round_robin r4) — the comparator must not reject
    integer width differences, only int-vs-float family divergence."""
    df = spark.range(3).select(F.col("id").cast("int").alias("rk"))
    ok, msg = compare_spark_duckdb(df, duck, "SELECT range AS rk FROM range(3)")
    assert ok, msg


def test_date_vs_timestamp_family_shared(spark, duck):
    """DuckDB DATE reaches pandas as datetime64 while Spark DATE stays
    `datetime.date` — driver-green historically, so the comparator must
    treat date/timestamp as one family and equal calendar values as equal."""
    df = spark.sql("SELECT DATE '2024-01-01' AS d")
    ok, msg = compare_spark_duckdb(df, duck, "SELECT DATE '2024-01-01' AS d")
    assert ok, msg


def test_fixed_r4_queries_pass_driver_faithful_gate(spark, duck, sf_dir):
    """The repaired versions of both r4 red rows pass the harsher gate."""
    from datafusion_impl_spark.operators import sampling
    from datafusion_impl_spark.plans import analytics

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        duck.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    df = analytics.scalar_array_struct_functions(spark, sf_dir)
    ok, msg = compare_spark_duckdb(
        df, duck, analytics.ORACLES["scalar_array_struct_functions"]
    )
    assert ok, msg
    df = sampling.doc_length_quantile_bins(spark, sf_dir)
    ok, msg = compare_spark_duckdb(
        df, duck, sampling.ORACLES["doc_length_quantile_bins"]
    )
    assert ok, msg
