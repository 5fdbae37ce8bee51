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
#   r4: the 27 queries never covered by r1-r3 + that round's new queries
#       (50 rows, 45 green + 2 red-now-fixed + 3 no_oracle)
#   r5 (this list): the 2 repaired r4 reds first, then the 48 highest-value
#       queries that have NEVER had a driver row (r4 session-2 batch + the
#       production-ANN flagships + analytics/modern/quality remainder).
#       After r5, union driver coverage is >=200 of the 205 queries that
#       existed at r5's start; the 3 deferred stragglers plus the 32 NEW
#       r5 operators (registry now 237) formed r5's _NEXT_ROTATION. The
#       rows-only `no_oracle` trio (regexp_safe_edge_cases,
#       approx_distinct_parts, profile_orders_columns_approx) is dropped
#       from the window PERMANENTLY — the driver records only `err` for
#       them, so keeping them burned 3 green slots per round (r4 verdict).
#   r6 (this list): the 35 never-driver-checked queries (3 deferred source
#       queries + 32 r5 operators, exactly r5's _NEXT_ROTATION) + 15
#       oldest-evidence pads (the 3 r1-only scalar families + 12 r2-era
#       core queries untouched since). After r6, every query that was
#       oracled at r6's START has a driver row — terminal coverage for the
#       pre-r6 registry; the 10 NEW r6 operators (registry now 247, 240
#       oracled) queue in _NEXT_ROTATION for r7.
#   r7 (this list): the 10 r6-new queries (r6's _NEXT_ROTATION, all
#       judge-verified local-oracle PASS in the r6 session) + the 37 queries
#       whose newest driver row is still r2 + 3 oldest-r3 LLM flagships.
#       After r7, no oracled query's newest evidence predates r3.
_PRIORITY = [
    # --- the 10 r6-new queries (r6's _NEXT_ROTATION, verbatim) ---
    "multimodal_bmp_decode_stats",      # new in r6 (real BMP pixel decode)
    "ann_residual_pq_recall",           # new in r6 (FAISS-style residual PQ)
    "stream_tws_user_totals",           # new in r6 (transformWithState runtime)
    "dedup_substring_spans",            # new in r6 (ExactSubstr span dedup)
    "ann_sq8_recall",                   # new in r6 (scalar-quantized ANN)
    "zorder_layout_effectiveness",      # new in r6 (Morton layout skipping)
    "interval_overlap_sessions",        # new in r6 (interval-interval join)
    "stream_tws_recent_events",         # new in r6 (TWS ListState, 2 batches)
    "heavy_hitters_cms",                # new in r6 (count-min sketch audit)
    "token_zipf_fit",                   # new in r6 (Zipf OLS; r7 0-var guard)
    # --- 37 r2-only-evidence pads (every oracled query whose newest driver
    # row is still CORRECTNESS_r02) ---
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q12_priority_lateness",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "cube_lineitem_flags",
    "distinct_segments",
    "events_daily_gapfill",
    "events_locf_imputation",
    "full_outer_nation_accounts",
    "grouped_zscore_doclen",
    "grouping_sets_events",
    "higher_order_array_ops",
    "map_functions_order_flags",
    "min_price_part_per_brand",
    "pivot_segment_by_status",
    "regexp_docs_first_word",
    "regexp_events_props",
    "regexp_extract_all_props",
    "set_except_all_priorities",
    "set_except_nations",
    "set_intersect_all_priorities",
    "set_intersect_nations",
    "topk_expensive_orders",
    "udaf_geometric_mean_events",
    "unpivot_part_measures",
    "window_event_gaps",
    "window_rank_family",
    # --- 3 oldest-r3 pads (LLM-layer flagships unchecked since r3) ---
    "dedup_documents_exact",
    "dedup_documents_minhash",
    "ann_cosine_topk",
]

# Beyond the 50-query window: the r7 rotation queue — queries added this
# round are appended here as they land, to lead next round's window.
_NEXT_ROTATION: list[str] = [
    "multimodal_wav_decode_stats",      # new in r7 (real RIFF/WAVE decode)
    "stream_tws_session_timeout",       # new in r7 (TWS event-time timers)
    "ann_opq_subspace_balance",         # new in r7 (OPQ permutation vs PQ)
    "multimodal_y4m_decode_stats",      # new in r7 (real YUV4MPEG2 decode)
    "stream_tws_event_type_profile",    # new in r7 (TWS MapState)
    "text_charset_audit",               # new in r7 (encoding/mojibake QA)
    "benford_price_audit",              # new in r7 (first-digit audit)
    "stream_tws_warm_start",            # new in r7 (TWS initialState cutover)
    "ann_pq_refine_recall",             # new in r7 (two-stage ADC+exact serve)
    "dedup_graph_kcore",                # new in r7 (k-core density census)
    "daily_revenue_cusum",              # new in r7 (CUSUM changepoint)
    "split_group_aware",                # new in r7 (leakage-proof group split)
    "decontamination_semantic",         # new in r7 (embedding decontam screen)
    "l_diversity_audit",                # new in r7 (attribute-disclosure census)
    "mixture_reweight_step",            # new in r7 (DoReMi EG update)
    "dedup_token_savings",              # new in r7 (dedup token ledger)
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
