"""Training-set assembly operators (operators/training.py): semantic
properties plus the plan-shape audits that encode the 100 TB posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_impl_spark.operators import training as tr
from datafusion_impl_spark.operators.text import tokens
from datafusion_impl_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunks_cover_every_token_exactly(spark):
    """Every document's tokens are fully covered: the first chunk starts at
    token 1, consecutive chunks advance by STRIDE, and the last chunk's
    window reaches the final token."""
    chunks = tr.chunk_documents_sliding(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("start_token").alias("first_start"),
        F.max(F.col("start_token") + F.col("chunk_tokens") - 1).alias("last_end"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("start_token").alias("max_start"),
    )
    j = per_doc.join(docs, "doc_id")
    bad = j.filter(
        (F.col("first_start") != 1)
        | (F.col("last_end") != F.col("n_tokens"))
        # a chunk may never start past the end of the doc
        | (F.col("max_start") > F.col("n_tokens"))
    )
    assert bad.count() == 0
    # stride arithmetic: chunk count == 1 + ceil(max(n - CHUNK, 0) / STRIDE)
    expected = 1 + F.ceil(
        F.greatest(F.col("n_tokens") - tr._CHUNK, F.lit(0)) / tr._STRIDE
    )
    assert j.filter(F.col("n_chunks") != expected).count() == 0


def test_chunking_is_shuffle_free(spark):
    """Chunking must stay a pure map over the scan: the projection the
    registered query itself is built from (everything before the
    presentation-only orderBy) must be literally Exchange-free."""
    body = _plan(tr._chunk_projection(spark, SF_DIR))
    assert "Exchange" not in body
    assert "CartesianProduct" not in body and "SortMergeJoin" not in body
    # and the registered query adds only the presentation sort on top
    full = _plan(tr.chunk_documents_sliding(spark, SF_DIR))
    assert full.count("Exchange") <= 1  # the single final sort's range exchange


def test_temperature_mixture_sums_to_one_and_flattens(spark):
    rows = tr.source_temperature_mixture(spark, SF_DIR).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-3
    # temperature < 1 compresses the spread: the mix ratio between the
    # largest and smallest source is strictly tighter than the raw ratio
    mx, mn = max(rows, key=lambda r: r.n_tokens), min(rows, key=lambda r: r.n_tokens)
    assert mx.n_tokens > mn.n_tokens  # corpus is non-degenerate
    assert mx.mix_weight / mn.mix_weight < mx.raw_share / mn.raw_share
    # small sources are upsampled relative to their raw share
    assert mn.mix_weight > mn.raw_share


def test_containment_catches_planted_near_subsets(spark):
    """The planted near-copies (leading word dropped) are near-subsets of
    their originals: containment must pair (doc_id, doc_id + 200000) for
    multi-of-7 docs with enough shingles."""
    got = {
        (r.doc_a, r.doc_b)
        for r in tr.dedup_documents_containment(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n")
    )
    planted = {
        (r.doc_id, r.doc_id + 200000)
        for r in docs.filter((F.col("doc_id") % 7 == 0) & (F.col("n") >= 10)).collect()
    }
    assert planted, "corpus too small to plant near-subsets"
    missed = planted - got
    assert not missed, f"containment missed planted near-subsets: {sorted(missed)[:5]}"
    # exact copies score containment 1.0 as well
    exact = {
        (r.doc_id, r.doc_id + 100000)
        for r in docs.filter((F.col("doc_id") % 10 == 0) & (F.col("n") >= 3)).collect()
    }
    assert not (exact - got)


def test_dimension_stats_one_row_per_dim(spark):
    rows = tr.embedding_dimension_stats(spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]
    assert len(rows) == dim
    n_vecs = emb.count()
    assert all(r.n == n_vecs for r in rows)
    assert all(r.min_val <= r.mean_val <= r.max_val for r in rows)


def test_hard_negatives_never_share_the_anchor_label(spark):
    rows = tr.hard_negative_mining(spark, SF_DIR).collect()
    assert rows
    assert all(r.q_label != r.neg_label for r in rows)
    # per anchor: exactly K negatives, ranked by descending similarity
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rs in by_q.items():
        assert len(rs) == tr._HARD_NEG_K
        sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_hard_negative_plan_broadcasts_queries(spark):
    plan = _plan(tr.hard_negative_mining(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_kmeans_partitions_the_corpus(spark):
    rows = tr.embedding_kmeans_clusters(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs  # a partition, no drops
    assert 1 <= len(rows) <= tr._K
    assert all(-1.0 <= r.min_sim <= r.avg_sim <= 1.0 for r in rows)


def test_chunk_dedup_finds_planted_copy_spans(spark):
    """Every chunk of a planted exact-copy doc repeats across ≥ 2 docs, so
    chunk-level dedup must report spans reaching at least the planted pair
    count, and each reported span must genuinely span ≥ 2 docs."""
    rows = tr.dedup_chunks_exact(spark, SF_DIR).collect()
    assert rows
    assert all(r.n_docs >= 2 for r in rows)
    assert all(r.n_occurrences >= r.n_docs for r in rows)
    # planted exact copies guarantee at least one repeated chunk per pair
    n_exact_dups = (
        load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") % 10 == 0).count()
    )
    assert len(rows) >= n_exact_dups


def test_source_embedding_profile_shape(spark):
    rows = tr.source_embedding_profile(spark, SF_DIR).collect()
    n_sources = (
        load_table(spark, SF_DIR, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_sources
    # centroid of scattered unit-ish vectors is shorter than the mean norm
    assert all(0.0 < r.centroid_norm <= r.avg_norm * 1.001 for r in rows)
    assert all(0.0 < r.coherence <= 1.001 for r in rows)


def test_quality_tiers_partition_the_corpus(spark):
    rows = tr.quality_curriculum_tiers(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    tiers = {r.tier for r in rows}
    assert tiers <= {"a_high", "b_mid", "c_low"}
    # tier score ranges respect the cutoffs
    for r in rows:
        if r.tier == "c_low":
            assert r.avg_score < tr._TIER_LOW
        elif r.tier == "a_high":
            assert r.avg_score >= tr._TIER_HIGH


def test_split_leakage_counts_agree_with_split_assignment(spark):
    """The leakage report's eval populations must equal the hash-ring split
    operator's own (lang, split) counts — both derive from the same ring."""
    from datafusion_impl_spark.operators.sampling import corpus_split_assignment

    leak = tr.split_leakage_report(spark, SF_DIR).collect()
    ring = {
        (r.split, r.lang): r.n_docs
        for r in corpus_split_assignment(spark, SF_DIR).collect()
        if r.split != "train"
    }
    got = {(r.split, r.lang): r.n_docs for r in leak}
    assert got == ring
    assert all(r.n_leaked <= r.n_docs for r in leak)
    assert all((r.n_leaked == 0) == (r.n_pairs == 0) for r in leak)


def test_kmeans_assignment_plan_broadcasts_centroids(spark):
    """Both Lloyd rounds must broadcast the K-row centroid table — the
    corpus itself is never shuffled for an assignment."""
    plan = _plan(tr.embedding_kmeans_clusters(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") >= 1


def test_skipgram_negative_sampling_is_exact_and_biased(spark):
    """Skip-gram assembly invariants: every kept pair draws exactly
    _SG_NEG negatives (each u2 lands in exactly one CDF interval — the
    bucketized inverse-CDF is a partition), frequency subsampling keeps
    rare centers MORE often than frequent ones, and the negatives are
    frequency-biased: the mean drawn rank is far below the uniform-vocab
    expectation."""
    from datafusion_impl_spark.operators.training import (
        _SG_NEG,
        _SG_VOCAB,
        skipgram_negative_pairs,
    )

    rows = skipgram_negative_pairs(spark, SF_DIR).collect()
    assert rows, "no sources"
    tot_kept = sum(r.n_pairs_kept for r in rows)
    tot_neg = sum(r.n_negatives for r in rows)
    assert tot_kept > 0
    assert tot_neg == _SG_NEG * tot_kept, (tot_neg, tot_kept)
    for r in rows:
        assert 0.0 < r.kept_rate <= 1.0
        assert r.n_pairs_kept <= r.n_pairs_raw
    mean_rank = sum(r.neg_rank_sum for r in rows) / tot_neg
    assert mean_rank < _SG_VOCAB / 4, mean_rank  # uniform would be ~V/2


def test_padding_waste_sorted_never_worse(spark):
    """r15 batching planner: both strategies conserve real tokens and doc
    count; length-sorted batching can never waste MORE than arrival order
    in total padded slots (each sorted batch's max is the smallest
    possible over any partition into equal-rank blocks), and on this
    corpus the improvement is strict."""
    from datafusion_impl_spark.operators.training import (
        batch_padding_waste_planner,
    )
    from tests.conftest import SF_DIR

    rows = {r.strategy: r for r in
            batch_padding_waste_planner(spark, SF_DIR).collect()}
    a, s = rows["arrival"], rows["length_sorted"]
    assert a.real_tokens == s.real_tokens
    assert a.n_batches == s.n_batches
    assert s.padded_slots <= a.padded_slots
    assert s.wasted_slots < a.wasted_slots   # strict on this corpus
    for r in (a, s):
        assert r.padded_slots >= r.real_tokens
        assert r.wasted_slots == r.padded_slots - r.real_tokens
        assert 0 <= r.waste_bps <= 10000
