"""Driver-facing query suite.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) an equivalent DuckDB oracle SQL string. The repo-root
``__spark_entry__.py`` re-exports this registry to the driver.

Column-name discipline: the driver hash-compares values after sorting
columns by name, so every computed column is aliased identically in the
Spark plan and the oracle SQL. Floats are rounded to 6 decimals on both
sides (FIXTURES.md §6) and ties are broken by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver samples a capped prefix (50 names) of this list each round.
# Every query has at least one driver-green row, so ordering is
# STALENESS-based (VERDICT r5 item #2, re-affirmed each round; the r12
# rotation is VERDICT r11 item #6): the two dedup queries whose live
# plans changed in r11 (shuffle-hash hints) but which the r11 driver
# did not re-sample lead, then ann_ivfpq_knn (its trainer kernel was
# rewritten in r12 — bit-identical, but re-verify it anyway), then the
# 32 names last driver-verified in round 9 (the stalest green rows —
# everything after the r11 sample's 50-prefix cut), then r10-verified
# names to fill the 50 prefix. The 50 names the r11 driver just
# re-verified go last.
_PRIORITY = [
    # r11-code-touched, last driver-verified r10 (VERDICT r11 #6)
    "dedup_embedding_topk", "dedup_embedding_lsh_threshold",
    # r12-code-touched (OPQ trainer rewrite, bit-identity-tested)
    "ann_ivfpq_knn",
    # last driver-verified round 9 (oldest green rows — 32 names)
    "agg_late_ship_priority", "agg_nation_market_share",
    "agg_priority_class_by_linestatus", "agg_priority_line_counts",
    "agg_product_profit_q9", "agg_promo_revenue_ratio",
    "agg_returned_item_ranking", "agg_rollup_nation_year",
    "agg_supplier_part_counts_q16", "cluster_centroid_profile",
    "cypher_match_where", "cypher_nation_customer_counts",
    "cypher_node_props", "cypher_region_chain_counts",
    "dedup_substring_spans",
    "ann_lsh_knn", "ann_nsw_knn",
    "events_conversion_funnel",
    "events_gap_percentiles", "events_ohlc_hourly",
    "events_retention_cohorts", "events_transition_bigrams",
    "graph_pagerank_top20", "graph_triangles_topk", "join_asof_error_click",
    "join_local_supplier_volume", "join_min_cost_supplier_q2",
    "join_orders_above_cust_avg", "join_promotion_suppliers_q20",
    "join_range_click_burst", "join_sales_opportunity",
    "join_salted_customer_nation",
    # round-10-verified names (fill the 50 prefix)
    "agg_count_by_source", "agg_embedding_dim_stats",
    "agg_lang_source_matrix", "agg_pricing_summary", "agg_revenue_by_nation",
    "agg_rollup_suppliers", "agg_top_customers_by_orders",
    "agg_top_orders_by_revenue", "bm25_search", "bm25_search_batch",
    "bq_hamming_knn", "dedup_clusters", "dedup_exact",
    "dedup_lines_reconstruct", "dedup_ngram_jaccard",
    # remaining round-10-verified names (next in line)
    "join_semi_anti_segments", "join_small_qty_orders_q17",
    "join_top_supplier_q15", "join_volume_shipping_q7",
    "join_waiting_suppliers_q21", "page_customers",
    "pipeline_chunk_documents", "pipeline_filter_funnel",
    "pipeline_pack_sequences", "pipeline_upsample_mixture",
    "setops_customer_activity", "text_moore_lewis_selection",
    "text_word_entropy", "window_running_revenue",
    "knn_cosine", "knn_l2", "knn_ip", "knn_batch", "knn_filtered",
    "sq_train_stats", "sq_knn_cosine", "sq_knn_l2", "sq_knn_ip",
    "pq_adc_knn", "hybrid_search_alpha05", "hybrid_search_alpha08",
    "hybrid_search_batch", "graph_find_nodes", "graph_neighbors",
    # freshest: re-verified by the r11 driver (CORRECTNESS_r11 green)
    "gv_edge_similarity",
    "graph_traverse", "graph_bfs_levels", "ann_partitioned_knn",
    "graph_shortest_path",
    "graph_degree_topk", "graph_stats", "graph_hyperedge_membership",
    "graph_part_copurchase_topk", "gv_semantic_expansion",
    "gv_traverse_rerank", "dedup_minhash_lsh", "dedup_simhash",
    "text_corpus_stats", "text_fingerprint", "text_lang_id",
    "text_postings_top_terms", "pipeline_clean_corpus",
    "pipeline_split_counts",
    "dedup_incremental_lsh", "pipeline_source_cap", "text_quality",
    "text_scrub_audit", "text_token_counts", "agg_order_trend_pivot",
    "codec_int8_roundtrip_error", "dedup_decontaminate",
    "events_replay_last10", "events_sessionize",
    "events_subscription_filter", "events_user_outlier_counts",
    "events_value_percentiles", "events_window_hourly",
    "join_shipping_priority_q3",
    "ann_ivf_knn",
    "media_audio_chunks", "media_features",
    "media_frame_sample", "media_manifest", "pipeline_stratified_counts",
    "pipeline_token_budget", "text_repetition_filter",
    "agg_cube_status_priority", "agg_cust_order_distribution",
    "agg_disjunctive_parts_q19", "agg_forecast_revenue",
    "agg_grouping_sets_orders", "agg_important_parts_q11", "agg_large_orders",
]


def _prioritized(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return {**head, **{k: v for k, v in d.items() if k not in head}}


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _prioritized(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _prioritized(_ORACLES)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side-effect: each module registers its queries
    from fastpyvectordb_spark.suite import (  # noqa: F401
        vector,
        analytics,
    )
    for optional in (
        "text",
        "fusion",
        "graph",
        "quantization",
        "dedup",
        "textanalysis",
        "graphvector",
        "events",
        "ann",
        "multimodal",
        "analytics2",
        "cypherq",
        "joins",
        "tpch2",
        "tpch3",
    ):
        try:
            __import__(f"fastpyvectordb_spark.suite.{optional}")
        except ImportError:
            pass
    _LOADED = True
