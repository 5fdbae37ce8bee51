"""Queries exercising the reference's core operator (`regexp_extract`) against
the driver testdata — the Spark analogues of ``/root/reference/tests/regexp-tests.rs``.

Three shapes:
- builtin fast path over real tables (oracle-able: DuckDB's ``regexp_extract``
  also returns '' on no match);
- the parity pandas UDF over an inline edge-case table transcribed from the
  reference tests (rows-only check here; exact golden assertions live in
  ``tests/test_regexp.py``);
- flagship composition: regexp extraction feeding a two-phase aggregation
  (the reference's IMPL operator + its DESC aggregation capability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_impl_spark.functions.regexp import register_regexp
from datafusion_impl_spark.sources.registry import load_table

__all__ = ["QUERIES", "ORACLES", "EDGE_CASES"]

# (input, pattern, group, expected) — transcribed from
# /root/reference/tests/regexp-tests.rs:35-46 and src/regexp-extract.rs:121-228.
EDGE_CASES = [
    ("test-123-data", r"-(\d+)-", 1, "123"),
    ("hello-world", r"(\w+)-(\w+)", 2, "world"),
    ("no-match-here", r"(\d+)", 1, ""),
    ("", r"(.*)", 1, ""),
    ("abc123def456", r"(\d+)", 1, "123"),
    ("price: $99.99", r"\$(\d+\.\d+)", 1, "99.99"),
    ("test-123-data", r"-(\d+)-", 5, ""),       # out-of-bounds group
    ("test-123-data", r"-(\d+)-", -1, ""),      # negative group
    ("some text", r"[invalid(regex", 1, ""),     # invalid pattern
    (None, r"(\d+)", 1, None),                    # null input
    ("test-123", None, 1, None),                  # null pattern
    ("test-123", r"(\d+)", None, None),           # null group index
    # Dialect guard: Rust `regex` (the reference engine) rejects lookaround
    # and backreferences at compile time, so contract point 6 (invalid
    # pattern → '') applies even though Python `re` would accept these.
    ("foo123", r"foo(?=\d)", 0, ""),              # lookahead
    ("xy", r"(?<=x)y", 0, ""),                    # lookbehind
    ("abab", r"(ab)\1", 0, ""),                   # numeric backreference
    ("aa", r"(?P<c>a)(?P=c)", 0, ""),             # named backreference
    # ...and constructs that merely LOOK like them stay accepted:
    ("test-123", r"(?:test)-(\d+)", 1, "123"),    # non-capturing group
    ("a=b", r"[(?=]", 0, "="),                    # class containing ( ? =
    ("x\\1y", r"\\1", 0, "\\1"),                  # escaped backslash + digit
]


def regexp_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: extract a numeric field from the events ``props`` JSON-ish
    string with the builtin (JVM) regexp_extract, then two-phase aggregate."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).try_cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_EVENTS_PROPS_SQL = r"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS min_k,
       MAX(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def regexp_docs_first_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builtin regexp over the documents table: leading word distribution."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return (
        docs.select(F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"))
        .groupBy("first_word")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "first_word")
    )


_DOCS_FIRST_WORD_SQL = r"""
SELECT regexp_extract(text, '^(\w+)', 1) AS first_word, COUNT(*) AS n_docs
FROM documents
GROUP BY first_word
ORDER BY n_docs DESC, first_word
"""


def regexp_safe_edge_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full error-semantics contract through the parity UDF.

    Inline VALUES table (mirrors ``tests/regexp-tests.rs:35-46``); rows-only
    driver check — DuckDB's regexp_extract raises on invalid patterns, so no
    SQL oracle exists for the error-swallowing rows. Golden assertions are in
    tests/test_regexp.py.
    """
    register_regexp(spark)
    rows = [(t, p, g) for (t, p, g, _e) in EDGE_CASES]
    df = spark.createDataFrame(rows, schema="text string, pattern string, grp int")
    return df.select(
        "text",
        "pattern",
        "grp",
        F.expr("regexp_extract_safe(text, pattern, grp)").alias("extracted"),
    )


def regexp_extract_all_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all (the multi-match sibling of the reference's
    operator): all digit runs in props as an array, aggregated per
    event_type by total matches and distinct match values."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    nums = F.regexp_extract_all("props", F.lit(r"(\d+)"), 1)
    return (
        ev.select("event_type", nums.alias("nums"))
        .select("event_type", F.size("nums").alias("n"), F.explode("nums").alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.countDistinct("m").alias("n_distinct_values"),
        )
        .orderBy("event_type")
    )


_EXTRACT_ALL_SQL = r"""
SELECT event_type, COUNT(*) AS n_matches,
       COUNT(DISTINCT m) AS n_distinct_values
FROM (SELECT event_type, unnest(regexp_extract_all(props, '(\d+)', 1)) AS m
      FROM events)
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "regexp_events_props": regexp_events_props,
    "regexp_extract_all_props": regexp_extract_all_props,
    "regexp_docs_first_word": regexp_docs_first_word,
    "regexp_safe_edge_cases": regexp_safe_edge_cases,
}

ORACLES = {
    "regexp_events_props": _EVENTS_PROPS_SQL,
    "regexp_extract_all_props": _EXTRACT_ALL_SQL,
    "regexp_docs_first_word": _DOCS_FIRST_WORD_SQL,
    # regexp_safe_edge_cases: intentionally no oracle (see docstring)
}
