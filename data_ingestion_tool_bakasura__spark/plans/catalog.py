"""Query catalog: merges every domain module's queries + oracles.

``QUERIES[name](spark, sf_dir) -> DataFrame``; ``ORACLE[name]`` is the
DuckDB-equivalent SQL when the operator is SQL-expressible (the driver
records a weaker rows-only check otherwise — currently the recursive
chunker pipeline, LSH/IVF approximate search, and the full ingest
composition, each covered by dedicated tests instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.plans import (
    curation_q,
    documents_q,
    events_q,
    multimodal_q,
    relational,
    streaming_q,
    vectors_q,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_ALL: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for mod in (relational, documents_q, events_q, streaming_q, multimodal_q, vectors_q, curation_q):
    _ALL.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)

#: Catalog iteration order. External correctness harnesses check a
#: prefix of ``queries()`` in iteration order. Round-8 rotation
#: (r7 verdict #1 + BASELINE.md rotation ledger; evidence computed by
#: tools/rotation.py): lead with the seven queries that have NO driver
#: row ever (four landed past the r7 boundary; q_quality_classifier,
#: q_image_near_dup and q_corpus_report are NEW this round), then the 19 remaining
#: rows whose newest driver evidence dates from r1/r2, then the three
#: re-entrants whose gram path was rewritten late r7 (window-lead
#: shingles + the ngram_overlap spread guard), then q_lm_quality whose
#: model join is re-gated THIS round (size-gated broadcast, r7 verdict
#: #3). That retires ALL r1/r2 evidence. The remaining slots take the
#: 15 rows still carrying r4 evidence, one sentinel per operator
#: family that would otherwise have no in-window representative
#: (streaming / vectors / multimodal / C18 grouped-map — all r6), and
#: the oldest r5 row, filling the 50 exactly.
#: After this window lands, every oracle-able catalog query's newest
#: driver row is r4+ and the deepest remaining staleness is eight r5
#: rows. Rows-only queries (q_ingest_pipeline, q_lsh_ann_topk,
#: q_ivf_assignments, q_hnsw_topk) sit past the checked window — their
#: semantics are held by dedicated tests (test_ingest, ANN.md recall
#: contracts, IVF full-probe==exact, HNSW exact-recall/determinism) and
#: by oracle-able twins. Every name must exist in a module's QUERIES
#: (asserted below) so a rename can't silently drop a query.
_PRIORITY = [
    # --- no driver row ever (r7-late + NEW r8): certify first ---
    "q_temperature_mixture",     # XLM-R n^alpha mixture rates (Conneau et al.)
    "q_deep_clean_pipeline",     # surgery -> LM-score composition (one lazy plan)
    "q_substring_dedup_incr",    # gram-index increment twin of q_substring_dedup
    "q_lm_quality_xcorpus",      # pretrained-model seam twin of q_lm_quality
    "q_quality_classifier",      # NEW r8: CCNet-shape logistic quality filter
    "q_image_near_dup",          # NEW r8: banded aHash image near-dup (C15 x C13)
    "q_corpus_report",           # NEW r8: one-scan dataset-card accounting
    # --- last r1/r2-evidence rows (rotation ledger; retires the backlog) ---
    "q_doc_stats",               # r1
    "q_lang_facet",              # r1
    "q_array_ops",               # r1
    "q_json_props",              # r2
    "q_filter_project",          # r1
    "q_fulltext_match",          # r1
    "q_distinct_stats",          # r1
    "q_top_orders",              # r1
    "q_price_buckets",           # r1
    "q_orders_by_month",         # r1
    "q_order_gaps",              # r1
    "q_customers_with_orders",   # r1
    "q_customers_without_orders",# r1
    "q_top_revenue_supplier",    # r1
    "q_orders_above_cust_avg",   # r1
    "q_rich_inactive_customers", # r1
    "q_lone_late_supplier",      # r1
    "q_user_event_matrix",       # r2
    "q_repetition_filter",       # r2
    # --- impl changed late r7 / this round: re-certify ---
    "q_repeated_spans",          # lead()-window shingle rewrite (late r7)
    "q_contamination",           # ngram_overlap spread guard (late r7)
    "q_curation_pipeline",       # composition over ngram_overlap (late r7)
    "q_lm_quality",              # size-gated model join (r7 verdict #3, this round)
    # --- r4-evidence rows (oldest remaining after the r1/r2 backlog) ---
    "q_supplier_part_counts",
    "q_promo_revenue",
    "q_ship_delay_classes",
    "q_returned_items",
    "q_order_count_distribution",
    "q_top_shippers",
    "q_market_share",
    "q_revenue_forecast",
    "q_profit_by_nation",
    "q_brand_quantity_revenue",
    "q_part_value_concentration",
    "q_large_volume_customers",
    "q_min_cost_supplier",
    "q_funnel_conversion",
    "q_volume_shipping",
    # --- family sentinels (families otherwise unrepresented in-window; r6) ---
    "q_stream_tumbling_hourly",  # C17 streaming sentinel
    "q_quantized_rerank",        # B9/C14 vector sentinel (quantize+rerank)
    "q_page_extract",            # A3-A10/C15 multimodal sentinel
    "q_value_zscore_builtin",    # C6/C18 production twin sentinel
    # --- oldest r5 rows (fill to 50) ---
    "q_exists_subquery",         # C4 EXISTS join shape
    # ---------- 50-query window boundary ----------
    # everything below carries an r5-r7 driver-green row; in-window
    # reps above cover every SURVEY §2 family
    "q_stratified_sample",       # r5 (yielded its slot to q_corpus_report)
    "q_event_dedup",             # r5 (yielded its slot to q_image_near_dup)
    "q_fulltext_score",          # r5 (yielded its slot to q_quality_classifier)
    "q_tfidf_topdocs",           # r5
    "q_shipping_priority",       # r5
    "q_top3_orders_per_customer",# r5
    "q_rollup_returns",          # r5
    "q_ship_within_30d",         # r5
    "q_region_revenue",
    "q_stream_sliding_1h_30m",
    "q_stream_session_windows",
    "q_stream_dedup_keys",
    "q_stream_click_purchase_join",
    "q_stream_enriched_nation",
    "q_sliding_1h_30m",
    "q_session_windows",
    "q_geomean_by_type",
    "q_user_retention",
    "q_sequence_packing",
    "q_embedding_near_dup",
    "q_embedding_quantize",
    "q_simhash_bands",
    "q_dedup_clusters",
    "q_incremental_dedup",
    "q_winnow_pairs",
    "q_winnow_fingerprints",
    "q_hybrid_rrf",
    "q_corpus_filter",
    "q_hash_split",
    "q_token_budget",
    "q_source_mixture",
    "q_pii_redaction",
    # --- fresh r7 evidence (previous window) ---
    "q_substring_dedup",
    "q_semantic_dedup",
    "q_stream_semantic_dedup",
    "q_paragraph_dedup",
    "q_ivf_kmeans_search",
    "q_ivf_search",
    "q_ivfadc_search",
    "q_pq_rerank",
    "q_upsert_by_key",
    "q_token_stats",
    "q_minhash_signatures",
    "q_jaccard_pairs",
    "q_cosine_topk",
    "q_json_variants",
    "q_fingerprints",
    "q_lang_id",
    "q_quality_scores",
    "q_term_frequency",
    "q_vector_norms",
    "q_l2_centroid_dist",
    "q_label_centroids",
    "q_label_centroids_builtin",
    "q_normalize_hash",
    "q_chunk_explode",
    "q_chunk_keys",
    "q_small_quantity_revenue",
    "q_math_funcs",
    "q_string_funcs",
    "q_nation_setops",
    "q_rank_dense_ntile",
    "q_running_revenue",
    "q_price_percentiles",
    "q_pivot_daily_value",
    "q_cube_orders",
    "q_grouping_sets",
    "q_stream_running_stats",
    "q_stream_near_dedup",
    "q_stream_funnel",
    "q_tumbling_hourly",
    "q_value_zscore",
    "q_asof_click_error",
    "q_cosine_topk_batch",
    "q_exact_dedup",
    "q_minhash_lsh_candidates",
    "q_bm25_topdocs",
    "q_ingest_pipeline_fixed",
    "q_doc_assembly",
    "q_pricing_summary",
    # rows-only (not SQL-expressible; recall contracts in tests/ANN.md)
    "q_hnsw_topk",               # sharded executor-local HNSW
]


# --- full ingest pipeline (recursive chunker -> dedup -> embed) -----------
# Not SQL-expressible (recursive splitter + hash-embedding); covered by
# golden/property tests in tests/test_ingest.py. Registered rows-only.

def q_ingest_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from data_ingestion_tool_bakasura__spark.operators.ingest import (
        IngestConfig,
        ingest_documents,
    )
    from data_ingestion_tool_bakasura__spark.sources.readers import load_table

    docs = load_table(spark, sf, "documents")
    rows = ingest_documents(docs, cfg=IngestConfig(embedding_dim=16))
    return (
        rows.groupBy("filename")
        .agg(
            F.count("*").alias("n_chunks"),
            F.round(F.avg(F.length("content")), 6).alias("avg_chunk_len"),
            F.countDistinct("text_hash").alias("n_unique"),
        )
        .orderBy("filename")
    )


_ALL["q_ingest_pipeline"] = q_ingest_pipeline

_missing = [n for n in _PRIORITY if n not in _ALL]
assert not _missing, f"catalog _PRIORITY names unknown: {_missing}"
for _n in _PRIORITY:
    QUERIES[_n] = _ALL[_n]
for _n, _fn in _ALL.items():
    if _n not in QUERIES:
        QUERIES[_n] = _fn
