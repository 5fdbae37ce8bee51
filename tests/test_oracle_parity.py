"""Every queries() entry with an oracle must match DuckDB exactly at sf0.01 —
this is a local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_utils import compare_spark_duckdb

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, duck, name):
    df = _QUERIES[name](spark, SF_DIR_ORACLE)
    ok, msg = compare_spark_duckdb(df, duck, _ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_DIR_ORACLE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema.fields) > 0
