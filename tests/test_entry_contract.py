"""Driver-contract ordering tests: the correctness gate verifies the first
50 entries of queries(), so that window must cover every operator family."""

from __future__ import annotations

import importlib.util

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_priority_names_all_registered():
    names = list(entry_mod.queries())
    assert names[: len(entry_mod._PRIORITY)] == entry_mod._PRIORITY
    assert len(set(entry_mod._PRIORITY)) == len(entry_mod._PRIORITY) == 50


def test_first_50_cover_every_family():
    first50 = set(list(entry_mod.queries())[:50])
    families = {
        # reaggregate_partials rotated out in r11 (additive re-agg
        # machinery stays pinned by pattern_1_1 + pattern_2_complete);
        # the S6 type-widening row took the slot
        "base": {"user_clicks", "snapshot_type_widening_read"},
        "streaming": {
            "pattern_1_1_incremental_merge",
            # round-12 third rotation: asof_join_last_click and
            # scalar_max_ts rotated out (batch-asof machinery runs
            # inside the streaming row's per-batch window; scalar max is
            # pinned by the watermark probe + q1's agg set) — the
            # streaming temporal-lookup and custom-source rows took the
            # slots
            "pattern_streaming_asof_enrichment",
            "pattern_streaming_python_source",
            # pattern_1_2_cdf_merge rotated out late-r12 (table_changes
            # pinned by the GDPR propagation row, additive merge by
            # pattern_1_1); the custom-sink row took the slot
            "pattern_streaming_python_sink",
            "pattern_2_complete_overwrite",
            "pattern_2_insert_overwrite",
            "pattern_windowed_watermark",
            "pattern_streaming_dedup",
            "pattern_streaming_sessionization",
            "pattern_stream_stream_join",
            # pattern_gdpr_delete_propagation rotated out in r14 (the S5
            # delete CDF + tombstone + vacuum machinery run inside the
            # retrieval-GDPR row, which commits the same SnapshotTable
            # delete and consumes the same delete_changes feed; the
            # summary-plane recompute stays exact-checked locally and
            # vacuum_after stays pinned by the cadence test below)
            "pattern_streaming_retrieval_gdpr",
            "bonus_stateless_view_topk",
        },
        "dedup": {
            "pattern_streaming_corpus_dedup",
            "pattern_streaming_neardup_dedup",
            # text_remove_duplicated_spans rotated out in r12 (its
            # gram-ranking span-removal machinery stays driver-pinned
            # inside the corpus-build composition hash — since r14 that
            # is corpus_release_manifest, which chains the same span
            # removal); the mid-stream BM25 serve row took the slot.
            # dedup_minhash_lsh rotated out in r12 too (banded-pair
            # generation stays pinned by minhash_clusters, which consumes
            # the same pairs, and by the streaming near-dup band tier);
            # the PII-redact row took the slot — see text family
            # dedup_simhash rotated out in r11 (banded near-dup family
            # stays pinned by minhash_lsh + minhash_clusters); the batch
            # BM25 row took the slot — see text family
            "dedup_minhash_clusters",
            "dedup_incremental_verdicts",
        },
        "similarity": {
            # knn_lsh_ann rotated out in r8 (its _lsh_keys machinery is
            # pinned by dedup_minhash_lsh + knn_ivf_ann); the Bloom
            # membership gate took the slot — see pipeline family.
            # knn_bruteforce rotated out in r11 (exact-cosine machinery
            # stays driver-pinned inside multimodal_ann_retrieval, which
            # composes it); the streaming BM25 row took the slot.
            # knn_ivf_ann rotated out in r11 too (anchor-IVF machinery
            # stays pinned by multimodal_ann_ivf + the expiring ANN
            # index row); the index-backed cross-modal row took the slot
            "knn_pq_adc",
            "semdedup_prune",
            "pattern_streaming_ann_index_expiring",
        },
        "multimodal": {
            "multimodal_decode_features",
            # multimodal_ann_retrieval rotated out in r12 (its brute
            # composition is subsumed by the index-backed sibling below
            # plus knn_pq_adc's exact-cosine re-rank); the hybrid-RRF
            # retrieval row took the slot — see text family
            "multimodal_ann_ivf",
        },
        # observability's pattern_streaming_quality_drift rotated out in
        # r14 (its per-batch fenced verdict-trajectory machinery runs
        # inside pattern_streaming_mixture_sample; the drift DECISION
        # stays pinned by local exact tests + the cadence test below) —
        # the round-13 mixture-sampling family took the slots
        # mixture_temperature_sample rotated out in r16 (its integer
        # mixture arithmetic runs unchanged inside the streaming
        # sampling row AND inside every release build both release
        # driver rows hash; stays exact-checked locally) — the
        # cross-release audit took the slot, see pipeline family
        "sampling": {
            "pattern_streaming_mixture_sample",
        },
        "text": {
            "text_unigram_surprisal",
            "text_language_id",
            # r11 rotation: the round-10 BM25 flagship family gets its
            # driver hash rows (batch + streaming); r12 completes the
            # retrieval surface: mid-stream serving + hybrid fusion in
            # its 100 TB (IVF-probed) and fully-streaming forms.
            # pattern_streaming_bm25_index rotated out late-r12 (the
            # midstream row serves the same streaming index through the
            # same pruned plan); hybrid_rrf_retrieval likewise (its RRF
            # arithmetic + BM25 pool are inside the _ivf row)
            "text_bm25_topk",
            # r13 rotation: bm25_midstream rotated out (its serve plan +
            # prefix-oracle property run inside the two consistency rows);
            # text_pii_redact rotated out for its POSITIVE-evidence
            # sibling; the round-12/13 consistency capstones took slots
            "pattern_streaming_bm25_external_reader",
            "pattern_streaming_hybrid_consistent",
            "pattern_streaming_hybrid_manifest",
            "hybrid_rrf_retrieval_ivf",
            "pattern_streaming_hybrid_retrieval",
            "text_pii_redact_positive",
        },
        # corpus_build_shards rotated out in r14 (its entire composition
        # runs inside corpus_release_manifest, which extends it through
        # mixing + packing; the build row stays exact-checked locally).
        # corpus_release_manifest rotated out in r15: its entire
        # build/publish/consume machinery runs INSIDE
        # pattern_streaming_release (same corpus_release_build per
        # release point, same manifest-history consumer read); the batch
        # row stays exact-checked locally and the streaming≡batch
        # manifest equality is pinned by test_streaming_release_*.
        "funnel": {
            "pattern_streaming_full_funnel",
            "pattern_streaming_release",
        },
        "pipeline": {
            # pack_token_bins rotated out in r16 (its per-shard
            # prefix-sum bin packing IS the released assignment's bin
            # packing, hashed over every released doc by both release
            # driver rows; stays exact-checked locally) — the release
            # consumer surface took the slots
            "release_version_diff",
            "release_epoch_plan",
            # contamination_bloom_flags rotated out in r13 (n-gram
            # contamination pinned by the exact sibling; bloom machinery
            # by runtime_bloom_join's plan-asserted local tests)
            "contamination_ngram_overlap",
        },
        # the mergeable-sketch family (round 12) gets its driver rows —
        # r14 adds the cardinality half (KMV distinct; slot freed by
        # events_json_extract, whose C3 wire decode is pinned inside
        # bonus_stateless_view_topk's topic re-scan)
        "sketch": {
            "pattern_streaming_quantiles_kmv",
            "pattern_streaming_distinct_kmv",
        },
        "layout": {"bucketed_join_revenue", "partition_pruned_daily_clicks",
                   "range_join_price_bands"},
        "tpch": {"q1_pricing_summary", "q3_shipping_priority"},
    }
    for fam, members in families.items():
        assert members <= first50, f"family {fam} missing from first-50 window"


def test_oracle_order_matches_query_order():
    qnames = [n for n in entry_mod.queries() if n in entry_mod.oracle_sql()]
    assert qnames == list(entry_mod.oracle_sql())


def test_registered_streaming_forms_pin_maintenance_cadence():
    """The sf fixtures replay 5 micro-batches, so the production
    maintenance cadence (every 8 batches) never fires at test scale — a
    green driver row then cannot distinguish "maintenance works" from
    "maintenance never ran" (round 9 shipped exactly that blind spot:
    four patterns stayed green while every maintain() call crashed
    unconditionally). Every registered form that owns an in-loop
    UpsertLog maintenance tick must pin compact_every=2 so the tick
    fires at batches 2 and 4 and the oracle hash covers the maintained
    read path."""
    import inspect

    qs = entry_mod.queries()
    owners = [
        "pattern_streaming_sessionization",
        "pattern_stream_stream_join",
        "pattern_streaming_corpus_dedup",
        "pattern_streaming_neardup_dedup",
        "pattern_streaming_semdedup",
        "pattern_streaming_full_funnel",
        "pattern_streaming_ingest_funnel",
        "pattern_streaming_source_caps",
        "pattern_streaming_quality_drift",
        "pattern_streaming_bm25_index",
        "pattern_streaming_bm25_midstream",
        "pattern_streaming_bm25_external_reader",
        "pattern_streaming_hybrid_retrieval",
        "pattern_streaming_hybrid_consistent",
        "pattern_streaming_hybrid_manifest",
        "pattern_streaming_distinct_kmv",
        "pattern_streaming_quantiles_kmv",
        "pattern_streaming_mixture_sample",
        "pattern_streaming_asof_enrichment",
        "pattern_streaming_python_source",
        "pattern_streaming_retrieval_gdpr",
        # r16: the release ladder's incremental funnel state logs get
        # the same in-loop tick
        "pattern_streaming_release",
    ]
    for name in owners:
        src = inspect.getsource(qs[name])
        assert "compact_every=2" in src, (
            f"{name}'s registered form does not pin compact_every=2 — "
            "its maintenance tick never fires on the 5-batch fixtures"
        )
    # the sibling blind spot for the ledger CHECKPOINT cadence: the
    # expiring ANN-index row pins checkpoint_every=2 so the driver hash
    # covers checkpoint write + checkpointed read + loose-override
    # (default 16 is never reached by any fixture-scale ledger)
    src = inspect.getsource(qs["pattern_streaming_ann_index_expiring"])
    assert "checkpoint_every=2" in src
    # and the physical-vacuum path: the GDPR row re-derives its affected
    # groups from the vacuumed table, so vacuum() has a hash row too
    src = inspect.getsource(qs["pattern_gdpr_delete_propagation"])
    assert "vacuum_after=True" in src
