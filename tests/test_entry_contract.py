"""Driver-contract invariants for __spark_entry__ that don't need a Spark
session: the registry must be complete and the deliberately-rotated
correctness window must be exactly what _PRIORITY says (the ordering helper
skips unknown names SILENTLY, so a typo would otherwise shift the driver's
50-query window without any test noticing)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_priority_names_all_exist():
    qs = entry.queries()
    missing = [n for n in entry._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not in the registry: {missing}"


def test_priority_has_no_duplicates():
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))


def test_priority_is_exactly_the_driver_window():
    """The driver records the first 50 queries; _PRIORITY must be exactly
    that size — an overflow entry would silently fall outside the window."""
    assert len(entry._PRIORITY) == 50
    names = list(entry.queries())
    assert names[:50] == entry._PRIORITY


def test_every_query_has_oracle_or_documented_rows_only():
    """Every queries() entry either has an oracle or is one of the known
    rows-only-by-design queries (divergence paths where no cross-engine SQL
    oracle can exist)."""
    rows_only_by_design = {
        "regexp_safe_edge_cases",       # DuckDB raises on invalid patterns
        "approx_distinct_parts",        # HLL sketches are engine-specific
        "profile_orders_columns_approx",
        "dedup_documents_minhash_ml",   # ml.feature hash coefficients internal
        "ann_lsh_ml_topk",
        "events_user_hll_rollup",       # DataSketches HLL sketch internals
        "tablesample_repeatable_stats",  # engine-native RNG sampler
    }
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = set(qs) - set(oracles)
    assert missing == rows_only_by_design


def test_entry_smoke_matches_driver_contract(spark):
    """The driver's smoke check: entry(spark) must run on sf0.001 and
    return a stable-schema DataFrame (it collects; we pin schema + a
    bounded count here)."""
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.columns == ["doc_a", "doc_b", "jaccard"]
    assert df.count() >= 0
