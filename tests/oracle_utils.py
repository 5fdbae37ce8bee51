"""Exact Spark-vs-DuckDB comparison, mirroring the driver's correctness gate
(row-count + schema + order-insensitive value hash).

Driver-faithfulness (r4 post-mortem — both r4 red rows were green under the
old comparator, so it is now strictly harsher than value equality):

1. The driver's hasher puts row tuples through a pandas hash table, which
   aborts on a raw array/map column (``TypeError: unhashable type: 'list'``).
   The old comparator silently normalized lists to tuples; this one REJECTS
   any array/map/struct column in driver-facing output.
2. The driver compares pandas-converted frames, where DuckDB HUGEINT (the
   un-cast ``SUM(BIGINT)`` type) arrives as float64 while Spark's long is
   int64 — a hash mismatch even when values are numerically equal
   (r4: ``doc_length_quantile_bins``). This comparator statically maps both
   engines' declared output types to pandas dtype families (int8/16/32/64,
   float, bool, datetime, object) and fails on any divergence, so an
   un-cast oracle aggregate fails in pytest the way it fails in the driver.
   Date and timestamp share one family (DuckDB DATE converts to datetime64
   while Spark DATE stays `object` of `datetime.date`, yet date-output
   queries have always been driver-green — the driver normalizes these).
   Int widths also share one family: `chunk_documents_sliding` (r3),
   `embedding_dimension_stats` (r3) and `interleave_sources_round_robin`
   (r4) were all driver-GREEN with Spark int32 vs DuckDB BIGINT outputs,
   so the driver's hash does not distinguish integer widths — only the
   int-vs-float divergence (HUGEINT/DECIMAL) is a real failure.
"""

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


def _complex_columns(spark_df):
    """Driver-facing output must be hashable scalars: array/map/struct
    columns abort the driver's pandas hash table (r4: `unhashable type:
    'list'`). Stringify them (array_join / to_json) before returning."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def _spark_family(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    return "object"


_DUCK_FAMILY = {
    "TINYINT": "int",
    "UTINYINT": "int",
    "SMALLINT": "int",
    "USMALLINT": "int",
    "INTEGER": "int",
    "UINTEGER": "int",
    "BIGINT": "int",
    "UBIGINT": "int",
    # HUGEINT reaches pandas as float64 — the r4 failure class.
    "HUGEINT": "float",
    "UHUGEINT": "float",
    "FLOAT": "float",
    "DOUBLE": "float",
    "BOOLEAN": "bool",
    "DATE": "datetime",
}


def _duck_family(type_str: str) -> str:
    t = type_str.upper()
    if t.startswith("DECIMAL"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "datetime"
    return _DUCK_FAMILY.get(t, "object")


def _dtype_mismatches(spark_df, duck_rel):
    s_fams = {f.name: _spark_family(f.dataType) for f in spark_df.schema.fields}
    out = []
    for name, dtype in zip(duck_rel.columns, duck_rel.types):
        d_fam = _duck_family(str(dtype))
        s_fam = s_fams.get(name)
        if s_fam is not None and s_fam != d_fam:
            out.append(f"{name}: spark={s_fam} duck={dtype}({d_fam})")
    return out


def compare_spark_duckdb(spark_df, duck_con, sql: str):
    """Return (ok, message). Exact value equality after normalization, plus
    the two driver-faithfulness gates documented in the module docstring."""
    bad = _complex_columns(spark_df)
    if bad:
        return False, (
            f"driver-unhashable column(s) {bad}: array/map/struct output "
            "aborts the driver's hash check — stringify via array_join/to_json"
        )

    s_cols = spark_df.columns
    rel = duck_con.sql(sql)
    d_cols = rel.columns
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"

    dt_bad = _dtype_mismatches(spark_df, rel)
    if dt_bad:
        return False, (
            "dtype-family mismatch (driver hashes pandas dtype-sensitively; "
            "CAST the oracle to match Spark): " + "; ".join(dt_bad)
        )

    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = rel.fetchall()
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    _, s_set = rows_to_set(s_cols, s_rows)
    _, d_set = rows_to_set(d_cols, d_rows)
    if s_set != d_set:
        only_s = [k for k in s_set if s_set[k] != d_set.get(k, 0)][:5]
        only_d = [k for k in d_set if d_set[k] != s_set.get(k, 0)][:5]
        return False, f"value mismatch; spark-only sample={only_s} duck-only sample={only_d}"
    return True, "ok"
