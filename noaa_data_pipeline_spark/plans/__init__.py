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
# each round. Round 15 window (executing the rotation pinned in
# GATE_LOG "r15 cohort pinned by name" under its standing plan-edit
# rule, and the r14 VERDICT tasks 1+2):
# - sim_ivf_pq_adc_search, sim_ivf_pq_residual_search: both entries
#   now ROUTE through the materialized PQ index when a declared
#   published layout matches the lake (plans/staging_r11.py bodies
#   edited, r14 VERDICT task 2) — plan edited -> driver re-proof;
# - dedup_containment_ngram: promoted from staging_r12 (first driver
#   evidence);
# - the remaining 47 slots: the pinned r12 cohort — every entry whose
#   last clean driver row is round 12 and which is not in the r14
#   window. 2 + 1 + 47 = 50: ZERO cohort deferrals. Per the standing
#   window rule ("if an r15 plan edit flags a registered entry, the
#   tvd promotion slides to r16"), the TWO plan-edit slots defer the
#   sample_weighted_priority and docs_token_drift_tvd promotions to
#   the r16 window — the r14 VERDICT task-2 wording ("routed entries
#   green in the r15/r16 window") anticipates exactly this trade.
# NOTE (process): rotation only picks what the DRIVER re-checks;
# every round must still pass the full-registry local gate
# (tools/check_correctness.py, see GATE_LOG.md) before snapshot.
GATE_PRIORITY = [
    # --- r15 plan edits (materialized-index routing) riding this
    #     window for driver re-proof
    "sim_ivf_pq_adc_search", "sim_ivf_pq_residual_search",
    # NOTE (r15 OPTIMIZATION round, 2026-08-17): ten registered plans
    # were performance-edited this round (sim_knn_graph, the PCA
    # triple, emb_dim_reduction_eval, the minhash triple, the CC
    # consumers dedup_clusters_cc / dedup_purge_report /
    # split_leakage_safe, graph_quality_smoothing). They are NOT
    # inserted here: the optimization round's driver gate re-runs
    # EVERY declared query (not a 50-slot window), all ten already
    # hold clean r12-r14 driver rows for the pre-edit plans, and the
    # full-registry local gate covers the edited plans (GATE_LOG
    # "r15 optimization" note). Keeping this list at the pinned 50
    # preserves the drafted rotation even if a 50-entry window is
    # recorded; the ledger carries digest=current / queued_round=15
    # for all ten.
    # --- r15 promotion (first driver evidence)
    "dedup_containment_ngram",
    # --- the pinned r12 cohort (last clean driver evidence is r12)
    "bpe_encode_docs", "bpe_train_merges", "dedup_simhash",
    "docs_chunk_overlap", "docs_curation_pipeline_e2e",
    "docs_domain_mixture_resample", "docs_embed_hash",
    "docs_exact_substring_purge", "docs_gopher_rule_filter",
    "emb_pq_codes", "events_dq_report", "events_heavy_hitters_cms",
    "events_incremental_rollup_merge", "events_kmv_theta_sketch_overlap",
    "events_user_sequences", "graph_quality_smoothing",
    "ivf_cell_rebalance", "ivf_centroid_drift_report",
    "ivf_retrain_centroids", "lake_zorder_key", "mm_binary_metadata",
    "mm_feature_extract_pandas", "mm_frame_sample", "mm_resize_dims",
    "orders_customer_full_outer_recon", "orders_unpivot_measures",
    "q11_important_stock_value", "q15_top_supplier",
    "q3_shipping_priority", "q5_regional_revenue",
    "q8_national_market_share", "sim_ann_lsh_multiprobe",
    "sim_block_matmul_topk", "sim_cosine_range_search",
    "sim_cosine_topk_brute", "sim_ivf_probe1", "sim_pq_adc_topk",
    "sim_pq_recall_eval", "sql_adhoc_guarded", "stream_dedup_keys",
    "stream_dedup_within_watermark", "stream_sessionize_state",
    "stream_static_enrich", "stream_stream_interval_join",
    "text_bigram_topk", "text_dup_span_ratio", "text_mask_numbers",
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
