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
]

# The driver gate records exactly the first 50 registry entries, so
# iteration order decides which entries get fresh driver evidence
# each round. Round 5 window: lead with the five entries broken by
# the round-4 TIMESTAMP_NTZ testdata change (fixed this round at the
# loader, tables.py), then the other three streaming entries whose
# shared source (_events_stream) changed with that fix, then the two
# rows-only entries promoted to oracle-checked this round, then the
# 40 entries whose last driver evidence is round 3 (green there, code
# unchanged). Everything in CORRECTNESS_r04 was hash-green except the
# leading five. NOTE (process): rotation only picks what the DRIVER
# re-checks; every round must still pass the full 97-entry local gate
# (tools/check_correctness.py, see GATE_LOG.md) before snapshot.
GATE_PRIORITY = [
    # --- broken in r4 by TIMESTAMP_NTZ, fixed in tables.load_table
    "events_sessionize_batch", "events_linear_interpolate",
    "events_sliding_24h_range_window", "events_interval_overlap_join",
    "stream_windowed_counts",
    # --- streaming source normalization changed with the same fix
    "stream_dedup_keys", "stream_dedup_within_watermark",
    "stream_sessionize_state",
    # --- promoted rows-only -> oracle-checked this round
    "dedup_clusters_cc", "events_distinct_users_hll", "kmeans_embeddings",
    "sim_block_matmul_topk",
    # --- new or plan-changed this round (parallel tokenize /
    # embedding repartition re-verified): tfidf new; winnow + simhash
    # re-added because their token stage changed
    "text_tfidf_topk", "text_fingerprint_winnow", "dedup_simhash",
    "source_curation_report", "bpe_encode_docs",
    # --- last driver evidence is round 3 (33; deferred to r6:
    # mm_feature_extract_pandas [rows-only, value-level pytest],
    # mm_frame_sample + mm_resize_dims + mm_binary_metadata
    # [metadata-only, unchanged], q3_shipping_priority +
    # q5_regional_revenue [unchanged classic 3-way joins, r3-green
    # and pytest-covered])
    "sim_cosine_topk_brute", "sim_ann_lsh_hyperplane", "sim_ivf_probe1",
    "sim_ann_recall_eval",
    "sql_adhoc_guarded",
    "events_percentiles_approx_sketch", "events_column_profile",
    "bpe_train_merges", "events_funnel_ordered",
    "events_retention_cohorts", "events_session_window_native",
    "orders_status_transitions", "events_anomaly_zscore",
    "orders_scd2_status_intervals", "decontam_ngram_overlap",
    "sample_stratified_hash", "split_train_val_hash",
    "docs_pack_sequences", "text_bigram_topk", "text_token_rarity",
    "text_repetition_ratio", "text_mask_numbers",
    "cube_orders_priority_status", "q6_forecast_revenue_delta",
    "q10_returned_items_customers", "q22_global_sales_opportunity",
    "q7_volume_shipping", "q9_product_type_profit",
    "q13_customer_order_distribution", "q16_supplier_part_relationships",
    "q17_small_quantity_revenue", "q20_excess_stock_suppliers",
    "events_grouping_sets_marginals",
    # deferred to round 6 (r3-green, unchanged; exact-agg twin was
    # r4-green): q1_pricing_summary
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
