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
# each round. Round 4 rotation: rounds 2/3 ran an identical window,
# leaving 47 entries whose only driver rows predate the round-2
# determinism hardening of their modules. This window leads with
# those 47 stale entries, then the two entries whose output shape was
# fixed this round (array -> delimited string for the gate
# canonicalizer), then q21 whose plan was rewritten for the shared
# lineitem scan — 50 exactly. Everything else was hash-green in
# CORRECTNESS_r03 on current code.
GATE_PRIORITY = [
    # --- stale since round 1 (47): relational / set ops
    "customer_order_counts", "customers_without_recent_orders",
    "urgent_order_lines_semi", "top_orders_per_customer",
    "distinct_segment_nation", "latest_events_limit",
    "events_json_extract", "union_by_name_schema_drift",
    "skew_salted_user_join", "events_distinct_users_hll",
    "q1_pricing_summary_exact_agg", "kmeans_embeddings",
    # events window / agg family
    "events_daily_rollup_two_level", "events_user_window_agg",
    "events_forward_fill", "events_time_grid_3h",
    "events_asof_view_before_purchase", "events_outcome_scoring",
    "events_top3_winners", "events_linear_interpolate",
    "events_value_histogram",
    # dedup family
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine",
    # text family
    "text_token_counts", "text_quality_score", "text_language_id",
    "text_fingerprint_winnow", "text_norm_pandas_udf",
    # TPC-H-ish + remaining round-1 entries
    "q2_cheapest_supplier_per_part", "q14_promo_revenue",
    "q19_bracketed_revenue", "rollup_revenue_by_nation_segment",
    "segments_intersect_except", "events_moving_avg_7",
    "events_lag_lead_delta", "events_sessionize_batch",
    "events_rank_quartiles", "orders_pivot_status_by_priority",
    "part_string_functions", "orders_date_arithmetic",
    "events_value_percentiles", "q4_order_priority_check",
    "q12_linestatus_priority_split", "q18_large_volume_customers",
    # --- fixed this round: array output -> delimited string
    "dedup_clusters_cc", "emb_quantize_int8",
    # --- plan rewritten this round (shared lineitem scan)
    "q21_waiting_suppliers",
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
