"""Round-10 staged candidates: driver-gate-equivalent checks.

These entries live outside the driver registry this round (the r9
gate window is full and r10 already owes 47 slots to
round-7-proven entries — see plans/staging_r10.py docstring), so this
file applies the same row-count + columns + order-insensitive value
hash compare the driver gate uses, plus non-degeneracy assertions and
differential fuzz so a tuning regression can't quietly turn a curve
or ranking into a constant.

Run with SPARK_GRAFT_TEST_SF_DIR at sf0.001 / sf0.01 / sf0.1 for the
three-SF staging proof (the maintenance-op promotion protocol).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from noaa_data_pipeline_spark.plans import load_all
from noaa_data_pipeline_spark.plans.staging_r10 import (
    COVERAGE_VS,
    KNN_K,
    MRL_DIMS,
    MRL_K,
    STAGED,
)
from tools.check_correctness import frame_digest


def _staged_names():
    return sorted(STAGED.keys())


def test_staging_is_not_registered():
    """The staging module must not leak into the driver registry:
    the r9 window is full, so a leak would break the gate-rotation
    freshness invariant mid-round."""
    registered = set(load_all().keys())
    assert not (set(STAGED) & registered)


def test_ivfpq_search_restricts_to_probed_cells(spark, sf_dir):
    """The combined IVF+PQ search must rank by the SAME ADC distances
    as the full-corpus sim_pq_adc_topk, restricted to each query's
    probed cells: every returned (query, neighbor) pair carries the
    identical approx_dist_sq, every query appears with contiguous
    ranks, and at least one query's top-k DIFFERS from the full-corpus
    ADC list (the probe restriction must actually bite — if the lists
    always match, nprobe covers the whole corpus and the entry is a
    no-op twin)."""
    ivfpq = STAGED["sim_ivf_pq_adc_search"].fn(spark, sf_dir).collect()
    full = load_all()["sim_pq_adc_topk"].fn(spark, sf_dir).collect()
    assert ivfpq
    full_d = {(r.query_id, r.neighbor_id): r.approx_dist_sq for r in full}
    full_sets = {}
    for r in full:
        full_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    by_q = {}
    for r in ivfpq:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
        if (r.query_id, r.neighbor_id) in full_d:
            assert r.approx_dist_sq == full_d[(r.query_id, r.neighbor_id)]
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert any(
        {r.neighbor_id for r in rows} != full_sets.get(q, set())
        for q, rows in by_q.items()
    )


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


# --- non-degeneracy ----------------------------------------------------


def test_knn_graph_shape(spark, sf_dir):
    """Every vector emits at most K contiguous ranks; at least one
    vector has a full neighbor list; edges never self-loop; cosines
    are non-increasing within a vector's list."""
    rows = STAGED["sim_knn_graph"].fn(spark, sf_dir).collect()
    assert rows
    by_vec = {}
    for r in rows:
        assert r.vec_id != r.neighbor_id
        by_vec.setdefault(r.vec_id, []).append(r)
    assert any(len(v) == KNN_K for v in by_vec.values())
    for v in by_vec.values():
        v.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in v] == list(range(1, len(v) + 1))
        cosines = [r.cosine for r in v if r.cosine is not None]
        assert cosines == sorted(cosines, reverse=True)


def test_matryoshka_wider_prefix_recovers_more(spark, sf_dir):
    """Overlap with the full-dim top-k must be within [0, K], cover
    every (query, width) pair, and be non-decreasing in the prefix
    width ON AVERAGE (the Matryoshka premise; per-query noise is
    allowed, a flat-zero or saturated curve is not)."""
    rows = STAGED["emb_matryoshka_truncate_eval"].fn(spark, sf_dir).collect()
    by_dim = {}
    queries = set()
    for r in rows:
        assert 0 <= r.n_overlap <= MRL_K and r.k == MRL_K
        by_dim.setdefault(r.trunc_dim, []).append(r.n_overlap)
        queries.add(r.query_id)
    assert set(by_dim) == set(MRL_DIMS)
    assert all(len(v) == len(queries) for v in by_dim.values())
    means = [sum(by_dim[d]) / len(by_dim[d]) for d in sorted(by_dim)]
    assert means == sorted(means), f"overlap not monotone in width: {means}"
    assert means[-1] > 0  # the widest prefix recovers something


def test_token_coverage_curve_monotone(spark, sf_dir):
    """Per language: covered_occ is strictly positive, non-decreasing
    in v, never exceeds total_occ, and equals total_occ once v >=
    n_distinct (the curve saturates exactly at the vocabulary)."""
    rows = STAGED["corpus_token_coverage"].fn(spark, sf_dir).collect()
    assert rows
    langs = {}
    for r in rows:
        assert 0 < r.covered_occ <= r.total_occ
        langs.setdefault(r.lang, {})[r.v] = r
    for lang, by_v in langs.items():
        assert set(by_v) == set(COVERAGE_VS)
        cov = [by_v[v].covered_occ for v in sorted(by_v)]
        assert cov == sorted(cov)
        for v, r in by_v.items():
            if v >= r.n_distinct:
                assert r.covered_occ == r.total_occ
    # the smallest cut must NOT already cover everything somewhere,
    # or the curve is degenerate at this SF
    assert any(
        by_v[min(COVERAGE_VS)].covered_occ < by_v[min(COVERAGE_VS)].total_occ
        for by_v in langs.values()
    )


# --- plan shapes --------------------------------------------------------


def _plan(spark, sf_dir, name: str) -> str:
    df = STAGED[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_coverage_plan_aggregate_exchanges_only(spark, sf_dir):
    """The doc_id compute-spreading repartition + one (lang, tok)
    count exchange + one lang exchange the window AND the final
    aggregate both reuse; no join anywhere — the corpus is scanned
    once and nothing bigger than the document rows shuffles."""
    plan = _plan(spark, sf_dir, "corpus_token_coverage")
    assert plan.count("Exchange") == 3
    assert "Join" not in plan


def test_knn_graph_plan_no_cartesian(spark, sf_dir):
    """Candidates come from the bucket equi-join (size-adaptive:
    broadcast at toy SF, shuffle at scale) — never a cartesian; the
    per-vector top-k must be a WindowGroupLimit, not a full sort."""
    plan = _plan(spark, sf_dir, "sim_knn_graph")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_matryoshka_plan_shares_one_scored_pass(spark, sf_dir):
    """All four rankings (full + every prefix width) must read the
    ONE persisted query-broadcast score pass — four InMemoryTableScan
    references, not four recomputed corpus joins. The only
    nested-loop join is the broadcast != pairing against the
    {MRL_QUERIES}-row query frame (bounded at any corpus size)."""
    plan = _plan(spark, sf_dir, "emb_matryoshka_truncate_eval")
    assert plan.count("InMemoryTableScan") == 1 + len(MRL_DIMS)
    assert "CartesianProduct" not in plan


# --- differential fuzz (driver-gate compare on adversarial lakes) -----


def _gate_compare(spark, lake, name, views):
    import duckdb

    q = STAGED[name]
    con = duckdb.connect()
    for t in views:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{lake}/{t}.parquet')"
        )
    sdf = q.fn(spark, lake)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    sh, slines = frame_digest(sdf.columns, srows)
    oh, olines = frame_digest(ocols, orows)
    if sh != oh:
        only_s = [x for x in slines if x not in set(olines)][:3]
        only_o = [x for x in olines if x not in set(slines)][:3]
        pytest.fail(f"{name} hash mismatch; spark={only_s} oracle={only_o}")


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(st.sampled_from(["en", "de", "zh", None]), min_size=1, max_size=12),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_coverage_differential_fuzz(spark, tmp_path_factory, texts, langs):
    """Arbitrary unicode text and NULL-able lang labels must
    hash-match the coverage oracle — catches tokenization,
    NULL-grouping, and tie-break drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(texts)
    langs = (langs * n)[:n]
    tmp = str(tmp_path_factory.mktemp("cov_fuzz"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, n + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([0] * n, pa.int64()),
            }
        ),
        f"{tmp}/documents.parquet",
    )
    _gate_compare(spark, tmp, "corpus_token_coverage", ["documents"])


@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    n=st.integers(min_value=10, max_value=24),
    n_zero=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_embedding_evals_differential_fuzz(spark, tmp_path_factory, seed, n, n_zero):
    """Random fixed-width embedding lakes (including all-zero vectors
    -> NULL cosines via the NULLIF guard) must hash-match both
    ranking oracles — tie-breaks, NULLS LAST ordering, and the
    decimal-dot hop under arbitrary values. Vectors are synthesized
    from a drawn numpy seed (a 64-wide float list strategy overran
    hypothesis's example-size budget); fixed 64-dim width matches the
    embeddings schema contract (ragged vectors are a loader-level
    rejection, not a ranking concern)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vecs = (rng.standard_normal((n, 64)) * 4).astype(np.float32)
    vecs[:n_zero] = 0.0  # exercise the zero-norm NULLIF path
    vecs = [list(map(float, v)) for v in vecs]

    tmp = str(tmp_path_factory.mktemp("emb_fuzz"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
            }
        ),
        f"{tmp}/embeddings.parquet",
    )
    for name in (
        "sim_knn_graph",
        "emb_matryoshka_truncate_eval",
        "sim_ivf_pq_adc_search",
    ):
        _gate_compare(spark, tmp, name, ["embeddings"])
