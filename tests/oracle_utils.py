"""Exact Spark-vs-DuckDB comparison, mirroring the driver's correctness gate
(row-count + schema + order-insensitive value hash). We compare values exactly
— if this passes, the driver's hash comparison passes too."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def rows_to_set(columns, rows):
    """Column-name-sorted, order-insensitive multiset of normalized rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return sorted(columns), out


def compare_spark_duckdb(spark_df, duck_con, sql: str):
    """Return (ok, message). Exact value equality after normalization."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    _, s_set = rows_to_set(s_cols, s_rows)
    _, d_set = rows_to_set(d_cols, d_rows)
    if s_set != d_set:
        only_s = [k for k in s_set if s_set[k] != d_set.get(k, 0)][:5]
        only_d = [k for k in d_set if d_set[k] != s_set.get(k, 0)][:5]
        return False, f"value mismatch; spark-only sample={only_s} duck-only sample={only_d}"
    return True, "ok"
