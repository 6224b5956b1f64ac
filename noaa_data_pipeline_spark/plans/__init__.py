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
# each round. Round 6 window: every entry in the r5 window came back
# green (CORRECTNESS_r05: 49 PASS + 1 rows-only), so the list resets
# to (a) the seven entries whose last driver evidence is round 3 —
# they aged out of the freshness window the meta-test in
# tests/test_registry_oracle.py enforces (ceil(registry/50) rounds,
# currently 3 — see that test's docstring) — (b) every entry whose
# plan was edited this round, and (c) the entries that are new this
# round. The remaining window slots fill in registration order,
# giving extra rotation for free.
# NOTE (process): rotation only picks what the DRIVER re-checks;
# every round must still pass the full-registry local gate
# (tools/check_correctness.py, see GATE_LOG.md) before snapshot.
GATE_PRIORITY = [
    # --- last driver evidence is round 3 (stale per the 2-round rule)
    "mm_binary_metadata", "mm_feature_extract_pandas",
    "mm_frame_sample", "mm_resize_dims",
    "q1_pricing_summary", "q3_shipping_priority", "q5_regional_revenue",
    # --- plans edited in round 6
    "q9_product_type_profit", "q21_waiting_suppliers",
    "bpe_encode_docs", "bpe_train_merges",
    "sql_adhoc_guarded",
    # --- heavies re-benched at scale this round (plan re-verified if
    # the scale audit forces an edit)
    "dedup_simhash", "dedup_minhash_lsh", "sim_ann_lsh_hyperplane",
    # --- new entries this round (first driver evidence)
    "docs_chunk_overlap", "dedup_purge_report", "sim_ivf_multiprobe",
    "stream_static_enrich", "docs_embed_hash", "events_user_sequences",
    "sim_mmr_rerank", "split_leakage_safe",
    "q8_national_market_share", "q11_important_stock_value",
    "q15_top_supplier",
    "sim_cosine_range_search", "text_dup_span_ratio",
    "docs_domain_mixture_resample", "lake_bucketed_copartition_join",
    "stream_stream_interval_join", "lake_zorder_key",
    "graph_quality_smoothing", "events_dq_report",
    "events_incremental_rollup_merge", "emb_pq_codes",
    "sim_pq_adc_topk", "dedup_minhash_estimator_quality",
    "events_window_function_suite", "sim_pq_recall_eval",
    "q21_waiting_suppliers_bucketed", "q9_product_type_profit_bucketed",
    "orders_customer_full_outer_recon", "orders_unpivot_measures",
    "docs_curation_pipeline_e2e", "sim_ann_lsh_multiprobe",
    "events_heavy_hitters_cms",
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
