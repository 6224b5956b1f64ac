"""Query registry: the engine's public query surface.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame``
with (where expressible) an equivalent DuckDB/ANSI SQL oracle string
over the same parquet tables. The driver's correctness gate runs
both and hash-compares values, so every computed column is aliased
identically on both sides, and double-typed aggregates go through a
DECIMAL accumulator cast back to DOUBLE to make the result exact and
partitioning-independent (a plain double sum is order-dependent and
would hash-mismatch between engines).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

PLAN_MODULES = [
    "similarity",
    "multimodal",
    "streaming",
    "relational",
    "scale",
    "iterative",
    "timeseries",
    "dedup",
    "text",
    "analytics",
    "lifecycle",
    "maintenance",
    "graph_eval",
    "staging_r11",
    "staging_r12",
    "staging_r13",
]

# The driver gate records exactly the first 50 registry entries, so
# iteration order decides which entries get fresh driver evidence
# each round. Round 14 window (executing the rotation drafted in
# GATE_LOG "Round-14 rotation plan" and the r13 VERDICT tasks 1+2):
# - dedup_clusters_cc, dedup_purge_report, split_leakage_safe: the
#   CC width-cap lift (plans/iterative.py, r14 first commit) edits
#   connected_components, which sits inside all three entries'
#   ledger closure — plan edited -> driver re-proof;
# - sim_ivf_pq_residual_search: takes the index-reuse fix the adc
#   search got at r13 (_reuse_or_swap over its residual codebook/
#   codes frames + a fourth corpus-codes slot, plans/staging_r11.py,
#   same r14 first commit) — plan edited -> driver re-proof;
# - the remaining 46 slots: the r11 cohort — every entry whose last
#   clean driver row is round 11 (48 at the r12 snapshot, minus
#   sim_ivf_pq_adc_search and dedup_clusters_cc which were re-proven
#   inside the r13 window; dedup_clusters_cc re-enters above as a
#   fresh plan-edit re-proof, not as cohort). 4 + 46 = 50: ZERO
#   deferrals again, and the ledger rounds partition the registry
#   146 across r12/r13/r14 at the boundary.
# NOTE (process): rotation only picks what the DRIVER re-checks;
# every round must still pass the full-registry local gate
# (tools/check_correctness.py, see GATE_LOG.md) before snapshot.
GATE_PRIORITY = [
    # --- r14 plan edits riding this window for driver re-proof
    "dedup_clusters_cc", "dedup_purge_report", "split_leakage_safe",
    "sim_ivf_pq_residual_search",
    # --- last clean driver evidence is round 11 (the 46 still registered)
    "cube_orders_priority_status", "dedup_incremental_minhash",
    "dedup_minhash_estimator_quality", "dedup_semantic_clusters",
    "dedup_semantic_purge", "docs_pack_sequences", "events_anomaly_zscore",
    "events_column_profile", "events_distinct_users_hll",
    "events_funnel_ordered", "events_grouping_sets_marginals",
    "events_interval_overlap_join", "events_linear_interpolate",
    "events_percentiles_approx_sketch", "events_retention_cohorts",
    "events_session_window_native", "events_sessionize_batch",
    "events_sliding_24h_range_window", "kmeans_embeddings",
    "lake_bucketed_copartition_join", "orders_scd2_status_intervals",
    "orders_status_transitions", "q10_returned_items_customers",
    "q13_customer_order_distribution", "q16_supplier_part_relationships",
    "q17_small_quantity_revenue", "q20_excess_stock_suppliers",
    "q21_waiting_suppliers", "q22_global_sales_opportunity",
    "q6_forecast_revenue_delta", "q7_volume_shipping",
    "q9_product_type_profit", "sample_stratified_hash", "sim_ann_recall_eval",
    "sim_incremental_ivf_insert", "sim_ivf_multiprobe", "sim_mmr_rerank",
    "source_curation_report", "split_train_val_hash",
    "stream_compaction_report", "stream_windowed_counts",
    "text_fingerprint_winnow", "text_perplexity_proxy",
    "text_repetition_ratio", "text_tfidf_topk", "text_token_rarity",
]


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every plan module (registering its queries) and return
    the full registry, iteration-ordered by GATE_PRIORITY first (see
    note above), then registration order."""
    for mod in PLAN_MODULES:
        try:
            importlib.import_module(f"{__name__}.{mod}")
        except ModuleNotFoundError as exc:
            if f"plans.{mod}" not in str(exc):
                raise
    ordered: dict[str, Query] = {}
    for name in GATE_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
