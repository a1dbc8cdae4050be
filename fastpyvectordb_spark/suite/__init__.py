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


# The driver samples a capped prefix of this list each round, so lead
# with the names that have never received a driver-green row. Rounds
# 1+2 together verified 100 of 122 queries; the 22 below are the
# remainder (all pass the identical oracle gate via tools/selfcheck.py,
# VERDICT r2). Already-verified names follow so a deep sample re-checks
# them for regressions.
_PRIORITY = [
    # never driver-checked (selfcheck-green, VERDICT r2 item #1)
    "agg_cube_status_priority", "agg_cust_order_distribution",
    "agg_forecast_revenue", "agg_grouping_sets_orders",
    "agg_large_orders", "agg_late_ship_priority",
    "agg_priority_class_by_linestatus", "agg_priority_line_counts",
    "agg_promo_revenue_ratio", "agg_returned_item_ranking",
    "agg_rollup_nation_year", "cypher_match_where", "cypher_node_props",
    "events_gap_percentiles", "join_asof_error_click",
    "join_orders_above_cust_avg", "join_range_click_burst",
    "join_salted_customer_nation", "join_semi_anti_segments",
    "page_customers", "setops_customer_activity",
    "window_running_revenue",
    # driver-green in r2 (re-check order: cheapest/most load-bearing first)
    "join_min_cost_supplier_q2", "agg_product_profit_q9",
    "agg_important_parts_q11", "agg_supplier_part_counts_q16",
    "join_promotion_suppliers_q20", "join_waiting_suppliers_q21",
    "dedup_substring_spans", "text_word_entropy",
    "cluster_centroid_profile", "join_local_supplier_volume",
    "agg_nation_market_share", "join_sales_opportunity",
    "graph_triangles_topk", "graph_pagerank_top20",
    "text_moore_lewis_selection", "cypher_nation_customer_counts",
    "join_volume_shipping_q7", "join_top_supplier_q15",
    "join_small_qty_orders_q17", "agg_disjunctive_parts_q19",
    "pipeline_pack_sequences", "pipeline_filter_funnel",
    "cypher_region_chain_counts",
    "events_retention_cohorts", "events_conversion_funnel",
    "events_ohlc_hourly", "events_transition_bigrams",
    "pipeline_chunk_documents", "join_shipping_priority_q3",
    "events_user_outlier_counts", "codec_int8_roundtrip_error",
    "ann_partitioned_knn", "ann_nsw_knn", "dedup_decontaminate",
    "text_repetition_filter", "pipeline_stratified_counts",
    "pipeline_token_budget",
    "events_window_hourly", "events_subscription_filter",
    "events_replay_last10", "events_sessionize", "ann_ivf_knn",
    "ann_lsh_knn", "ann_ivfpq_knn", "media_features",
    "media_frame_sample", "media_manifest", "media_audio_chunks",
    "agg_order_trend_pivot", "events_value_percentiles",
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
