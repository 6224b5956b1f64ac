"""Round-9 staged candidates: driver-gate-equivalent checks.

These entries live outside the driver registry this round (the r8
gate window is full and r9 already owes 41 slots to round-6-proven
entries — see plans/staging_r9.py docstring), so this file applies
the same row-count + columns + order-insensitive value hash compare
the driver gate uses, plus non-degeneracy assertions so a tuning
regression can't quietly turn a rule or flag into a constant."""

from __future__ import annotations

import pytest

from noaa_data_pipeline_spark.plans import load_all
from noaa_data_pipeline_spark.plans.staging_r9 import STAGED
from tools.check_correctness import frame_digest


def _staged_names():
    return sorted(STAGED.keys())


def test_staging_is_not_registered():
    """The staging module must not leak into the driver registry:
    the r8 window is full, so a leak would break the gate-rotation
    freshness invariant mid-round."""
    registered = set(load_all().keys())
    assert not (set(STAGED) & registered)


@pytest.mark.parametrize("name", _staged_names())
def test_staged_matches_oracle(spark, duck, sf_dir, name):
    q = STAGED[name]
    sdf = q.fn(spark, sf_dir)
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not complex_cols, f"top-level complex column(s) {complex_cols}"
    srows = [tuple(r) for r in sdf.collect()]
    assert q.oracle is not None, "staged entries must ship an oracle"
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    sh, slines = frame_digest(sdf.columns, srows)
    oh, olines = frame_digest(ocols, orows)
    if sh != oh:
        only_s = [x for x in slines if x not in set(olines)][:3]
        only_o = [x for x in olines if x not in set(slines)][:3]
        pytest.fail(f"value hash mismatch; spark-only={only_s} oracle-only={only_o}")


def test_drift_flag_not_degenerate(spark, sf_dir):
    """DRIFT_C must SPLIT the cells (a saturated flag caught the
    first parameterization: every cell flagged at sf0.01)."""
    rows = STAGED["ivf_centroid_drift_report"].fn(spark, sf_dir).collect()
    flags = {r.needs_retrain for r in rows}
    assert flags == {0, 1}
    assert all(r.n_then > 0 and r.n_now > r.n_then for r in rows)


def test_rebalance_splits_some_cells_and_preserves_vectors(spark, sf_dir):
    rows = STAGED["ivf_cell_rebalance"].fn(spark, sf_dir).collect()
    split = [r for r in rows if r.new_cell.endswith(("_hi", "_lo"))]
    kept = [r for r in rows if r.new_cell == str(r.old_cell)]
    assert split and kept and len(split) + len(kept) == len(rows)
    # a split cell really lands on both sides of its midpoint
    sides = {r.new_cell for r in split}
    assert any(c[:-3] + "_hi" in sides and c in sides for c in sides if c.endswith("_lo"))


def _plan(spark, sf_dir, name: str) -> str:
    df = STAGED[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_gopher_plan_is_exchange_free(spark, sf_dir):
    """All four rules are per-document map-side features: any
    exchange in this plan is a scale bug."""
    assert "Exchange" not in _plan(spark, sf_dir, "docs_gopher_rule_filter")


def test_drift_plan_shuffles_components_once(spark, sf_dir):
    """One (cell, dim) exchange with map-side partials + the k-row
    cell regroup + the shared _embeddings loader's compute-spreading
    repartition (the documented single-small-file mitigation; a real
    lake's scan parallelism replaces it). The corpus is never joined,
    and the loader's unused norm column is pruned out of the scan."""
    plan = _plan(spark, sf_dir, "ivf_centroid_drift_report")
    assert plan.count("Exchange hashpartitioning") == 3
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "SQRT" not in plan.split("Generate posexplode")[-1]  # norm pruned


@pytest.mark.parametrize("name", ["ivf_cell_rebalance", "ivf_retrain_centroids"])
def test_rebalance_family_never_shuffles_corpus_joins(spark, sf_dir, name):
    """The split plan (sizes -> cap -> oversized -> split_dims) joins
    back into the corpus scan by broadcast only; a sort-merge join or
    cartesian would mean the corpus was shuffled."""
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_retrain_covers_split_cells_consistently(spark, sf_dir):
    """Retrained centroids must cover every post-rebalance cell
    (including the _hi/_lo splits), report one membership count per
    cell across all dims, and place a split pair's centroids on
    opposite sides of the split midpoint implicitly (their means
    must differ on at least one dimension)."""
    rows = STAGED["ivf_retrain_centroids"].fn(spark, sf_dir).collect()
    assign = STAGED["ivf_cell_rebalance"].fn(spark, sf_dir).collect()
    cells = {r.new_cell for r in assign}
    got = {r.cell for r in rows}
    assert got == cells
    assert any(c.endswith("_hi") for c in got)
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, set()).add(r.n_vectors)
    assert all(len(v) == 1 for v in by_cell.values())
    # membership counts agree with the assignment
    from collections import Counter

    counts = Counter(r.new_cell for r in assign)
    assert {c: v.pop() for c, v in by_cell.items()} == dict(counts)
    # a split pair's centroids differ somewhere
    lo = [r for r in rows if r.cell.endswith("_lo")]
    assert lo
    base = lo[0].cell[:-3]
    hi = {r.dim: r.centroid for r in rows if r.cell == base + "_hi"}
    lo_c = {r.dim: r.centroid for r in rows if r.cell == base + "_lo"}
    assert any(hi[d] != lo_c[d] for d in hi)


def test_gopher_rules_not_degenerate(spark, sf_dir):
    rows = STAGED["docs_gopher_rule_filter"].fn(spark, sf_dir).collect()
    assert {r.keep for r in rows} == {0, 1}
    # at least two distinct rules actually reject documents
    rejecting = [
        c
        for c in ("r_wordcount", "r_meanlen", "r_stopwords", "r_topword")
        if any(getattr(r, c) == 0 for r in rows)
    ]
    assert len(rejecting) >= 2
