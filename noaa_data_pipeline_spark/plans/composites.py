"""Composed pipeline shapes — MEASUREMENT surface, not driver registry.

The registry's dedup entries each expose ONE stage with a contract
that materializes its full output (so the cross-engine hash gate can
check it). A production corpus never runs a stage in isolation: the
pair stream feeds connected components and a purge report directly,
and the intermediate pair list is consumed, not emitted. GATE_LOG
r10 ("simhash x100 wall") made that claim in prose; this module
makes it a measured artifact (r10 VERDICT task 4): the composed
shape is benchable by tools/bench_scale.py and oracle-checked by
tests/test_composites.py with the exact driver-gate compare, but it
does NOT register — the composition carries no new operator
semantics (its stages are registry entries with driver evidence),
and the registry cap (GATE_LOG r10, binds at 147) reserves slots for
new semantics.

Lookup precedence in tools/bench_scale.py: registry > staged >
composites — a name collision with either is a bug
tests/test_composites.py catches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import Query

COMPOSITES: dict[str, Query] = {}


def composite(name: str, oracle: str | None = None, doc: str = ""):
    """Mirror of ``plans.register`` writing to the composites dict."""

    def deco(fn):
        COMPOSITES[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def _simhash_labels_cte() -> str:
    """Transitive closure over the VERIFIED SimHash pair set,
    yielding ``labels(node, component)`` — the SimHash twin of
    iterative._cc_labels_cte (same recursive-CTE shape, same
    MATERIALIZED hint rationale)."""
    from .dedup import SQL_SIMHASH_VERIFIED_PAIRS

    return f"""{SQL_SIMHASH_VERIFIED_PAIRS},
    cc_edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM simhash_pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM simhash_pairs
    ),
    reach(node, start) AS (
        SELECT src, src FROM cc_edges
        UNION
        SELECT e.dst, r.start FROM reach r JOIN cc_edges e ON e.src = r.node
    ),
    labels AS (SELECT node, MIN(start) AS component FROM reach GROUP BY node)"""


@composite(
    "dedup_simhash_purge_pipeline",
    oracle=f"""
    WITH RECURSIVE {_simhash_labels_cte()},
    removed AS (SELECT node AS doc_id FROM labels WHERE node <> component)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS docs_before,
           CAST(COUNT(r.doc_id) AS BIGINT) AS docs_removed,
           CAST(COUNT(*) - COUNT(r.doc_id) AS BIGINT) AS docs_after
    FROM documents d
    LEFT JOIN removed r ON d.doc_id = r.doc_id
    GROUP BY d.source
    """,
)
def dedup_simhash_purge_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash dedup pipeline a curator actually runs, end to
    end: banded SimHash candidates -> hamming verification ->
    connected components -> one-representative-per-cluster purge
    accounting per source. The verified pair stream flows straight
    into the CC edge persist — it is never emitted, so the wall this
    composite measures is the pipeline's, with no
    output-materialization term (the registered dedup_simhash entry's
    contract adds exactly that term and nothing else; see GATE_LOG
    r10 "simhash x100 wall").

    Oracle tractability boundary (measured, GATE_LOG r11): the
    recursive-CTE closure twin is QUADRATIC in component size (reach
    enumerates every (node, start) pair), which is fine at the three
    gate SFs (sf0.1's giant component closes in seconds) but OOMs at
    32 GiB on x100mut, where copy-clusters fuse the dense base
    near-clique into a ~44k-node component. Spark's pointer-jumping
    label propagation is linear in edges per round and completes —
    tools/bench_scale.py records the engine-side DNF honestly
    (duckdb_error in the row) instead of crashing the harness."""
    from .dedup import simhash_pairs
    from .iterative import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    removed = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"), F.lit(1).alias("is_removed"))
    )
    return (
        docs.join(removed, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("docs_before"),
            F.count("is_removed").alias("docs_removed"),
            (F.count("*") - F.count("is_removed")).alias("docs_after"),
        )
    )
