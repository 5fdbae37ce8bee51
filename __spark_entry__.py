"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries and oracles live next to each other in
``datafusion_impl_spark/plans/*`` and ``datafusion_impl_spark/operators/*``;
this module only merges their registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_impl_spark.operators import curation as _curation
from datafusion_impl_spark.operators import dedup as _dedup
from datafusion_impl_spark.operators import graph as _graph
from datafusion_impl_spark.operators import multimodal as _multimodal
from datafusion_impl_spark.operators import sampling as _sampling
from datafusion_impl_spark.operators import similarity as _similarity
from datafusion_impl_spark.operators import structured as _structured
from datafusion_impl_spark.operators import text as _text
from datafusion_impl_spark.operators import training as _training
from datafusion_impl_spark.plans import analytics as _analytics
from datafusion_impl_spark.plans import cdc as _cdc
from datafusion_impl_spark.plans import joins_ext as _joins_ext
from datafusion_impl_spark.plans import modern as _modern
from datafusion_impl_spark.plans import quality as _quality
from datafusion_impl_spark.plans import regexp as _regexp
from datafusion_impl_spark.plans import tpch as _tpch
from datafusion_impl_spark.plans import tpch2 as _tpch2
from datafusion_impl_spark.plans import tpch3 as _tpch3
from datafusion_impl_spark.plans import tpch4 as _tpch4
from datafusion_impl_spark.sources import pydatasource as _pydatasource
from datafusion_impl_spark.sources import queries as _source_queries
from datafusion_impl_spark import streaming as _streaming

# Module registries (order here no longer drives the correctness window —
# see _PRIORITY below).
_MODULES = [
    _dedup,
    _graph,
    _similarity,
    _text,
    _sampling,
    _curation,
    _structured,
    _multimodal,
    _training,
    _streaming,
    _tpch,
    _tpch2,
    _tpch3,
    _tpch4,
    _joins_ext,
    _modern,
    _cdc,
    _quality,
    _regexp,
    _analytics,
    _source_queries,
    _pydatasource,
]

# The driver's correctness gate checks the FIRST 50 entries of queries(), so
# window membership is rotated deliberately each round to converge coverage.
# Rotation history:
#   r1: tpch + analytics head (33 rows recorded)
#   r2: tpch tranches 1-3, analytics, joins_ext, regexp (50 rows)
#   r3: LLM-pipeline layer — dedup/graph/similarity/text/sampling/curation/
#       structured/multimodal + 4 training (50 rows, 48 green + 2 no_oracle)
#   r4 (this list): the 27 queries never covered by r1-r3 — tpch4, modern,
#       the 3 streaming oracles, the 6 remaining training entries, the 3
#       source/sink round-trips, the analytics stragglers, the 3 rows-only
#       divergence-path queries — plus this round's new queries, padded to 50
#       with the oldest-evidence relational queries (r1/r2 vintages).
_PRIORITY = [
    # never driver-checked: tpch tranche 4
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_parts",
    "q20_part_flow_suppliers",
    # never driver-checked: modern SQL surface
    "recursive_cte_revenue_ema",
    "lateral_top_orders_per_segment",
    "events_props_variant",
    # never driver-checked: streaming batch-twin oracles
    "session_window_stats",
    "click_attribution_stats",
    "stream_corpus_dedup_stats",
    # never driver-checked: training-assembly remainder
    "hard_negative_mining",
    "embedding_kmeans_clusters",
    "dedup_chunks_exact",
    "source_embedding_profile",
    "quality_curriculum_tiers",
    "split_leakage_report",
    # never driver-checked: source/sink round-trips
    "csv_reference_golden",
    "jsonl_documents_roundtrip",
    "orc_lineitem_roundtrip",
    # never driver-checked: analytics stragglers
    "salted_event_type_stats",
    "salted_join_event_segments",
    "events_time_rollup",
    "profile_orders_columns",
    "order_price_percentiles",
    "scalar_array_struct_functions",
    "scalar_stats_aggregates",
    "string_agg_nations_per_region",
    # rows-only divergence paths (driver records rows-only evidence)
    "approx_distinct_parts",
    "profile_orders_columns_approx",
    "regexp_safe_edge_cases",  # includes the Rust-dialect lookaround/backref rows
    # new in r4
    "ema_revenue_closed_form",
    "bucketed_orders_pruned_join",
    "xml_documents_roundtrip",
    # new in r4: CDC/temporal layer
    "merge_upsert_latest_orders",
    "scd2_order_status_history",
    "range_frame_weekly_revenue",
    # new in r4: corpus batching/ordering
    "doc_length_quantile_bins",
    "interleave_sources_round_robin",
    # new in r4: layout/evolution
    "parquet_schema_evolution_merge",
    "zorder_orders_layout",
    # new in r4: incremental maintenance + corpus lifecycle
    "incremental_agg_merge",
    "dedup_union_priority",
    "corpus_snapshot_diff",
    "ann_ivf_incremental_assign",   # new in r4 (replaces a padding slot)
    "join_key_skew_report",         # new in r4 (replaces a padding slot)
    "click_conversion_stats",       # new in r4 (replaces a padding slot)
    "scalar_try_error_safe",        # new in r4 (replaces a padding slot)
    "corpus_embedding_coverage",    # new in r4 (replaces a padding slot)
    "dedup_pagerank_centrality",    # new in r4 (replaces a padding slot)
    "length_bucketed_batches",      # new in r4 (replaces a padding slot)
]

# Beyond the 50-query window: oracle-checked by pytest this round, queued to
# LEAD the r5 _PRIORITY rotation so they get driver evidence next round.
_NEXT_ROTATION = [
    "minhash_estimation_error",     # new in r4, session 2
    "dedup_semantic_ivf",           # new in r4, session 2
    "compact_small_files_plan",     # new in r4, session 2
    "table_checksum_buckets",       # new in r4, session 2
    "text_bm25_search",             # new in r4, session 2
    "events_linear_interpolation",  # new in r4, session 2
    "dedup_documents_winnowing",    # new in r4, session 2
    "source_token_gini",            # new in r4, session 2
    "corpus_novelty_curve",         # new in r4, session 2
    "sql_udf_revenue_bins",         # new in r4, session 2
    "daily_trend_regression",       # new in r4, session 2
    "doc_length_quantile_normalization",  # new in r4, session 2
    "pipe_syntax_segment_revenue",  # new in r4, session 2
    "bpe_merge_candidates",         # new in r4, session 2
    "grouped_winsorized_stats",     # new in r4, session 2
    "rolling_revenue_event_correlation",  # new in r4, session 2
    "scd2_pointintime_join",        # new in r4, session 2
]


def _ordered(merged: dict) -> dict:
    """Priority names first (in _PRIORITY order), then _NEXT_ROTATION, then
    everything else in module order — so the driver's 50-query window is
    exactly the head of _PRIORITY while the full registry stays complete."""
    out = {
        name: merged[name]
        for name in (*_PRIORITY, *_NEXT_ROTATION)
        if name in merged
    }
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: MinHash-LSH near-dedup over
    documents — the north-star LLM-pipeline operator (shingle → portable
    minhash signature → banded LSH candidates → exact-Jaccard verify), fully
    value-checked against the DuckDB oracle at sf0.01."""
    return _dedup.dedup_documents_minhash(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _ordered(out)
