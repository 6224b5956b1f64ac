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
]

# The driver gate records exactly the first 50 registry entries, so
# iteration order decides which entries get fresh driver evidence
# each round. Round 9 window (the rotation drafted in GATE_LOG
# "Round-9 rotation plan"): the 41 entries whose last driver evidence
# is round 6 (at the edge of the 3-round freshness window the
# meta-test in tests/test_registry_oracle.py enforces), plus the four
# round-8-staged operators promoted into the registry this round
# (plans/maintenance.py — each oracle-proven at three SFs and three
# engine configs before promotion), plus the entries whose plans
# changed in round 9 (sessionize disorder detection, replay-span
# caching, IVF insert persist lifecycle + size-gated broadcasts).
# NOTE (process): rotation only picks what the DRIVER re-checks;
# every round must still pass the full-registry local gate
# (tools/check_correctness.py, see GATE_LOG.md) before snapshot.
GATE_PRIORITY = [
    # --- last driver evidence is round 6 (stalest 41)
    "bpe_encode_docs", "bpe_train_merges", "dedup_purge_report",
    "docs_chunk_overlap", "docs_curation_pipeline_e2e",
    "docs_domain_mixture_resample", "docs_embed_hash", "emb_pq_codes",
    "events_dq_report", "events_heavy_hitters_cms",
    "events_incremental_rollup_merge", "events_user_sequences",
    "graph_quality_smoothing", "lake_zorder_key", "mm_binary_metadata",
    "mm_feature_extract_pandas", "mm_frame_sample", "mm_resize_dims",
    "orders_customer_full_outer_recon", "orders_unpivot_measures",
    "q11_important_stock_value", "q15_top_supplier",
    "q1_pricing_summary", "q21_waiting_suppliers_bucketed",
    "q3_shipping_priority", "q5_regional_revenue",
    "q8_national_market_share", "q9_product_type_profit_bucketed",
    "sim_ann_lsh_multiprobe", "sim_block_matmul_topk",
    "sim_cosine_range_search", "sim_cosine_topk_brute",
    "sim_ivf_multiprobe", "sim_ivf_probe1", "sim_pq_adc_topk",
    "sim_pq_recall_eval", "split_leakage_safe", "sql_adhoc_guarded",
    "stream_static_enrich", "stream_stream_interval_join",
    "text_dup_span_ratio",
    # --- round-9 promotions (new registry entries need first driver
    #     evidence; staged + oracle-proven in round 8)
    "ivf_centroid_drift_report", "ivf_cell_rebalance",
    "ivf_retrain_centroids", "docs_gopher_rule_filter",
    # --- registered new in round 9 (the exact-substring purge the r8
    #     verdict's growth list asked for)
    "docs_exact_substring_purge",
    # --- plans edited in round 9 (re-prove under the current tree):
    #     sessionize raises on disordered replays; the replay-span
    #     probe is cached + the nanos conf flip is now conditional;
    #     incremental IVF insert unpersists stale caches and
    #     size-gates its broadcasts. stream_windowed_counts shares
    #     the conditional-conf edit but holds r8 evidence and its
    #     plan is byte-identical on the gate lake — it yields its
    #     slot to the new entry and re-proves locally.
    "sim_incremental_ivf_insert", "stream_sessionize_state",
    "stream_dedup_within_watermark", "stream_dedup_keys",
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
