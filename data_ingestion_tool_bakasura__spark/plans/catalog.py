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
    crawl_q,
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
for mod in (relational, documents_q, events_q, streaming_q, multimodal_q, vectors_q, curation_q, crawl_q):
    _ALL.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)

#: Catalog iteration order. External correctness harnesses check a
#: prefix of ``queries()`` in iteration order. Round-18 rotation
#: (evidence computed by ``python tools/rotation.py``, the order
#: generated from it mechanically — sort by (newest driver-green
#: round, prior catalog position)): lead with the 8 impl-changed
#: queries of the r18 optimization round — q_dsir_weights /
#: q_dsir_select (ratio-table persist reverted, measured cold
#: in-suite), q_lang_id_trigram (argmax fold + langs= candidate set,
#: no window sort, no second profile derivation),
#: q_ivf_kmeans_search / q_ivfadc_search / q_pq_rerank (driver-side
#: sample-fit Lloyd + one shared md5 fit sample), q_video_near_dup
#: (share points became GC-scoped checkpoints),
#: q_deep_clean_pipeline (span-surgery output checkpointed, 7.2 ->
#: 4.0s) — then the remaining 25 r14-evidence rows
#: (q_running_revenue .. q_crawl_pipeline) and the first 17
#: r15-evidence rows (q_stream_near_dedup .. q_orders_above_cust_avg),
#: stalest-first with ties keeping prior catalog order.
#: After this window lands the oldest driver evidence anywhere is r15.
#: Past the boundary the remaining r15, r16 and r17 blocks continue
#: stalest-first, so the next rotation again reads straight off
#: ``tools/rotation.py``.
#: Rows-only queries with no oracle by design (q_ingest_pipeline,
#: q_lsh_ann_topk, q_ivf_assignments, q_hnsw_topk) sit past the
#: checked window — their semantics are held by dedicated tests
#: (test_ingest, ANN.md recall contracts, IVF full-probe==exact, HNSW
#: fused==persisted parity) and by oracle-able twins, BOTH
#: VALUE-checked: q_hnsw_topk via q_hnsw_exact_twin (in the r18
#: window) and q_lsh_ann_topk via q_lsh_exact_twin (r17 window).
#: Every name must exist in a module's QUERIES (asserted below) so a
#: rename can't silently drop a query.
_PRIORITY = [
    "q_dsir_weights",
    "q_dsir_select",
    "q_lang_id_trigram",
    "q_ivf_kmeans_search",
    "q_ivfadc_search",
    "q_pq_rerank",
    "q_video_near_dup",
    "q_deep_clean_pipeline",
    "q_running_revenue",
    "q_price_percentiles",
    "q_pivot_daily_value",
    "q_cube_orders",
    "q_grouping_sets",
    "q_stream_running_stats",
    "q_stream_funnel",
    "q_tumbling_hourly",
    "q_value_zscore",
    "q_asof_click_error",
    "q_cosine_topk_batch",
    "q_exact_dedup",
    "q_minhash_lsh_candidates",
    "q_bm25_topdocs",
    "q_ingest_pipeline_fixed",
    "q_pricing_summary",
    "q_temperature_mixture",
    "q_substring_dedup_incr",
    "q_lm_quality_xcorpus",
    "q_surt_keys",
    "q_c4_line_clean",
    "q_gopher_quality",
    "q_web_quality_pipeline",
    "q_gopher_repetition",
    "q_crawl_pipeline",
    "q_stream_near_dedup",
    "q_hnsw_exact_twin",
    "q_doc_stats",
    "q_lang_facet",
    "q_array_ops",
    "q_json_props",
    "q_filter_project",
    "q_fulltext_match",
    "q_distinct_stats",
    "q_top_orders",
    "q_price_buckets",
    "q_orders_by_month",
    "q_order_gaps",
    "q_customers_with_orders",
    "q_customers_without_orders",
    "q_top_revenue_supplier",
    "q_orders_above_cust_avg",
    # ---------- 50-query window boundary ----------
    "q_wet_pipeline",
    "q_wat_metadata",
    "q_warc_zst_roundtrip",
    "q_cdx_fetch_plan",
    "q_cdx_range_fetch",
    "q_warc_render",
    "q_main_content",
    "q_html_meta",
    "q_html_links",
    "q_link_graph",
    "q_pagerank",
    "q_anchor_text",
    "q_frontier",
    "q_fetch_schedule",
    "q_bloom_url_dedup",
    "q_page_extract",
    "q_doc_assembly",
    "q_sitemap_seeds",
    "q_recrawl",
    "q_audio_features",
    "q_url_normalize",
    "q_url_dedup",
    "q_canonical_dedup",
    "q_json_variants",
    "q_domain_cap",
    "q_domain_blocklist",
    "q_ivf_search",
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
    "q_lsh_exact_twin",
    "q_binary_rerank",
    "q_rich_inactive_customers",
    "q_lone_late_supplier",
    "q_user_event_matrix",
    "q_repetition_filter",
    "q_repeated_spans",
    "q_contamination",
    "q_curation_pipeline",
    "q_lm_quality",
    "q_supplier_part_counts",
    "q_promo_revenue",
    "q_ship_delay_classes",
    "q_returned_items",
    "q_order_count_distribution",
    "q_top_shippers",
    "q_market_share",
    "q_stream_tumbling_hourly",
    "q_quantized_rerank",
    "q_value_zscore_builtin",
    "q_exists_subquery",
    "q_volume_shipping",
    "q_funnel_conversion",
    "q_min_cost_supplier",
    "q_large_volume_customers",
    "q_part_value_concentration",
    "q_brand_quantity_revenue",
    "q_stream_semantic_dedup",
    "q_image_near_dup",
    "q_robots_filter",
    "q_pii_redaction",
    "q_profit_by_nation",
    "q_revenue_forecast",
    "q_semantic_rerank",
    "q_corpus_report",
    "q_quality_classifier",
    "q_stratified_sample",
    "q_event_dedup",
    "q_fulltext_score",
    "q_tfidf_topdocs",
    "q_shipping_priority",
    "q_top3_orders_per_customer",
    "q_rollup_returns",
    "q_ship_within_30d",
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
    "q_substring_dedup",
    "q_semantic_dedup",
    "q_paragraph_dedup",
    "q_upsert_by_key",
    "q_token_stats",
    "q_minhash_signatures",
    "q_jaccard_pairs",
    "q_cosine_topk",
    "q_hnsw_topk",
    "q_lsh_ann_topk",
    "q_ivf_assignments",
    "q_ingest_pipeline",
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
