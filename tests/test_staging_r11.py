"""Round-11 staged candidate: driver-gate-equivalent checks.

``sim_ivf_pq_adc_search`` lives outside the driver registry this
round (the r10 gate window is exactly full — 47 stale re-proves + 3
graph_eval promotions; see plans/staging_r11.py docstring), so this
file applies the same row-count + columns + order-insensitive value
hash compare the driver gate uses, plus the restriction-consistency
assertion and differential fuzz the r9 staging protocol established.

Run with SPARK_GRAFT_TEST_SF_DIR at sf0.001 / sf0.01 / sf0.1 for the
three-SF staging proof (the maintenance-op promotion protocol).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from noaa_data_pipeline_spark.plans import load_all
from noaa_data_pipeline_spark.plans.staging_r11 import STAGED
from tools.check_correctness import frame_digest


def _staged_names():
    return sorted(STAGED.keys())


def test_staging_is_not_registered():
    """The staging module must not leak into the driver registry:
    the r10 window is full, so a leak would break the gate-rotation
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
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    n=st.integers(min_value=10, max_value=24),
    n_zero=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_ivfpq_differential_fuzz(spark, tmp_path_factory, seed, n, n_zero):
    """Random fixed-width embedding lakes (including all-zero vectors)
    must hash-match the IVFPQ oracle — cell-ranking tie-breaks, the
    double-hop cell distances, and the ADC sum under arbitrary
    values."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vecs = (rng.standard_normal((n, 64)) * 4).astype(np.float32)
    vecs[:n_zero] = 0.0
    vecs = [list(map(float, v)) for v in vecs]

    tmp = str(tmp_path_factory.mktemp("ivfpq_fuzz"))
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
    _gate_compare(spark, tmp, "sim_ivf_pq_adc_search", ["embeddings"])
