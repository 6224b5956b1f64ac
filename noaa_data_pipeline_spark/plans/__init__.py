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
]

# The driver gate records exactly the first 50 registry entries, so
# iteration order decides which entries get fresh driver evidence
# each round. Round 8 window (the rotation drafted in GATE_LOG
# "Round-8 rotation plan"): the 40 entries whose last driver evidence
# is round 5 (at the edge of the 3-round freshness window the
# meta-test in tests/test_registry_oracle.py enforces), plus the six
# round-7-staged operators promoted into the registry this round
# (plans/lifecycle.py — each already oracle-proven at three SFs and
# three engine configs before promotion), plus the 4 entries whose
# plans changed in round 8 (bucketed-routing opt-in fix, lazy-persist
# conversions).
# NOTE (process): rotation only picks what the DRIVER re-checks;
# every round must still pass the full-registry local gate
# (tools/check_correctness.py, see GATE_LOG.md) before snapshot.
GATE_PRIORITY = [
    # --- last driver evidence is round 5 (stalest 40)
    "cube_orders_priority_status", "dedup_clusters_cc",
    "docs_pack_sequences", "events_anomaly_zscore",
    "events_column_profile", "events_distinct_users_hll",
    "events_funnel_ordered", "events_grouping_sets_marginals",
    "events_interval_overlap_join", "events_linear_interpolate",
    "events_percentiles_approx_sketch", "events_retention_cohorts",
    "events_session_window_native", "events_sessionize_batch",
    "events_sliding_24h_range_window", "kmeans_embeddings",
    "orders_scd2_status_intervals", "orders_status_transitions",
    "q6_forecast_revenue_delta", "q7_volume_shipping",
    "q10_returned_items_customers", "q13_customer_order_distribution",
    "q16_supplier_part_relationships", "q17_small_quantity_revenue",
    "q20_excess_stock_suppliers", "q22_global_sales_opportunity",
    "sample_stratified_hash", "sim_ann_recall_eval",
    "source_curation_report", "split_train_val_hash",
    "stream_dedup_keys", "stream_dedup_within_watermark",
    "stream_sessionize_state", "stream_windowed_counts",
    "text_bigram_topk", "text_fingerprint_winnow", "text_mask_numbers",
    "text_repetition_ratio", "text_tfidf_topk", "text_token_rarity",
    # --- round-8 promotions (new registry entries need first driver
    #     evidence; staged + oracle-proven in round 7)
    "dedup_semantic_clusters", "dedup_semantic_purge",
    "dedup_incremental_minhash", "text_perplexity_proxy",
    "stream_compaction_report", "sim_incremental_ivf_insert",
    # --- plans edited in round 8 (re-prove under the current tree):
    #     q9/q21 route to the bucketed layout only on the explicit
    #     SPARK_GRAFT_BUCKETED=1 opt-in now (ADVICE fix); the two
    #     remaining eager persist+count barriers converted to lazy
    "q9_product_type_profit", "q21_waiting_suppliers",
    "dedup_minhash_estimator_quality", "sim_mmr_rerank",
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
