"""Round-11 candidates: driver-gate-equivalent checks.

All three candidates are promoted (``sim_ivf_pq_adc_search`` in r11,
the KMV sketch + residual search in r12 — see plans/staging_r11.py
docstring). This file keeps applying the same row-count + columns +
order-insensitive value hash compare the driver gate uses, plus the
restriction-consistency assertion and differential fuzz the r9
staging protocol established, against the now-registered entries
(the registry oracle test covers them too; the fuzz and structural
checks here are staging-protocol extras the registry suite doesn't
run).

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


CANDIDATES = [
    "sim_ivf_pq_adc_search",
    "events_kmv_theta_sketch_overlap",
    "sim_ivf_pq_residual_search",
]


def _staged_names():
    """All three candidates promoted (r11/r12); the gate-compare and
    laziness checks keep running against the registered entries so
    the three-SF staging proof stays reproducible post-promotion."""
    return sorted(set(STAGED) | set(CANDIDATES))


def _lookup(name):
    """Find a candidate wherever it lives: staged pre-promotion,
    registry afterwards (all three live in the registry since r12)."""
    return STAGED.get(name) or load_all()[name]


def test_staging_is_not_registered():
    """All three r11 candidates are promoted (r11: adc_search; r12:
    the KMV sketch + residual search per the GATE_LOG rotation), so
    the staging dict must be EMPTY — a candidate left behind would
    be registered and staged at once, breaking the gate-rotation
    freshness invariant mid-round."""
    registered = set(load_all().keys())
    assert not (set(STAGED) & registered)
    assert not STAGED
    for name in CANDIDATES:
        assert name in registered, f"{name} lost in promotion"


def test_ivfpq_search_restricts_to_probed_cells(spark, sf_dir):
    """The combined IVF+PQ search must rank by the SAME ADC distances
    as the full-corpus sim_pq_adc_topk, restricted to each query's
    probed cells: every returned (query, neighbor) pair carries the
    identical approx_dist_sq, every query appears with contiguous
    ranks, and at least one query's top-k DIFFERS from the full-corpus
    ADC list (the probe restriction must actually bite — if the lists
    always match, nprobe covers the whole corpus and the entry is a
    no-op twin)."""
    ivfpq = _lookup("sim_ivf_pq_adc_search").fn(spark, sf_dir).collect()
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
    q = _lookup(name)
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

    q = _lookup(name)
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
    must hash-match BOTH IVFPQ oracles (raw-vector and residual
    encoding) — cell-ranking tie-breaks, the double-hop cell
    distances, residual subtraction, codebook training, and the ADC
    sums under arbitrary values."""
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
    for name in ("sim_ivf_pq_adc_search", "sim_ivf_pq_residual_search"):
        _gate_compare(spark, tmp, name, ["embeddings"])


# --- events_kmv_theta_sketch_overlap ------------------------------------


def test_kmv_overlap_estimates_track_exact(spark, duck, sf_dir):
    """Per pair: estimates positive, intersection <= union at the
    shared theta, the sample-level inclusion-exclusion identity
    holds, and every estimate lands within the k=32 KMV error
    envelope (|rel err| < 0.6 ~ 3 sigma) of the exact cardinality;
    segments smaller than k must estimate EXACTLY (theta = cap)."""
    from noaa_data_pipeline_spark.plans.staging_r11 import KMV_CUT, KMV_K

    rows = _lookup("events_kmv_theta_sketch_overlap").fn(spark, sf_dir).collect()
    assert rows
    types = duck.execute(
        f"SELECT DISTINCT event_type FROM events WHERE value > {KMV_CUT}"
    ).fetchall()
    n_types = len(types)
    assert len(rows) == n_types * (n_types - 1) // 2

    def exact(t):
        return duck.execute(
            "SELECT COUNT(DISTINCT user_id) FROM events "
            f"WHERE value > {KMV_CUT} AND event_type = ?",
            [t],
        ).fetchone()[0]

    for r in rows:
        assert r.est_a > 0 and r.est_b > 0
        assert r.est_intersect <= r.est_union + 1e-9
        ex_a, ex_b = exact(r.type_a), exact(r.type_b)
        ex_u = duck.execute(
            "SELECT COUNT(DISTINCT user_id) FROM events "
            f"WHERE value > {KMV_CUT} AND event_type IN (?, ?)",
            [r.type_a, r.type_b],
        ).fetchone()[0]
        ex_i = ex_a + ex_b - ex_u
        for est, ex in ((r.est_a, ex_a), (r.est_b, ex_b), (r.est_union, ex_u)):
            assert abs(est - ex) / ex < 0.6, (r.type_a, r.type_b, est, ex)
            if ex <= KMV_K:  # sketch holds the whole segment: exact
                assert est == ex
        if ex_i:
            assert abs(r.est_intersect - ex_i) / ex_i < 0.9  # smallest set, widest rel band


def test_adc_codeword_cache_actually_hits(spark, sf_dir):
    """r12 ADVICE: the adc entry now threads its persisted codewords
    frame explicitly into its own query-ADC join, but the identical
    _pq_codewords(sub) plan REBUILT inside _pq_best_codes (a
    plans/similarity.py helper shared by three registered entries —
    its signature is not this entry's to change) still reaches the
    cache only through CacheManager's semantic plan matching. Pin
    that hit: the executed plan must read the codeword cache exactly
    TWICE ([s, code, cw] InMemoryTableScans — once inside
    _pq_best_codes, once broadcast into qdist) and never re-run the
    codeword training aggregate outside the cached relation. A
    canonicalization miss would silently turn the persist into dead
    weight (perf-only, invisible to the hash gate) — this assertion
    is what makes it visible."""
    # r13 ADVICE: walk the executed-plan TREE (including each cached
    # relation's stored build subtree) and match scans by their
    # OUTPUT COLUMN NAMES instead of regexing the plan's string
    # render — exact `[s#N, code#N, cw#N]` renderings and
    # whole-string InMemoryTableScan counts break on Spark minor
    # bumps without any real regression.
    def _cache_scans(p, out):
        if p.nodeName() == "InMemoryTableScan":
            o = p.output()
            out.append(tuple(o.apply(i).name() for i in range(o.size())))
            _cache_scans(p.relation().cachedPlan(), out)
        ch = p.children()
        for i in range(ch.size()):
            _cache_scans(ch.apply(i), out)
        return out

    # r15: pin the in-session leg — a declared materialized index on
    # this box would route the entry to the parquet layout, which has
    # no codeword cache to hit (tests/test_staging_r14.py covers the
    # routed plan's own contract)
    import os

    os.environ["SPARK_GRAFT_PQ_INDEX"] = "0"
    try:
        df = _lookup("sim_ivf_pq_adc_search").fn(spark, sf_dir)
    finally:
        del os.environ["SPARK_GRAFT_PQ_INDEX"]
    scans = _cache_scans(df._jdf.queryExecution().executedPlan(), [])
    codeword_reads = [s for s in scans if s == ("s", "code", "cw")]
    assert len(codeword_reads) == 2, (
        f"expected 2 codeword cache reads, saw {len(codeword_reads)} "
        f"in {scans}"
    )
    # structural floor on the outer plan: the query-time tree must
    # read the CODES cache (r13 index-build slot), the sub cache (the
    # qdist side), and the codeword cache (the qdist broadcast) — by
    # signature, not by count
    top = set()
    plan = df._jdf.queryExecution().executedPlan()

    def _top_scans(p):
        if p.nodeName() == "InMemoryTableScan":
            o = p.output()
            top.add(tuple(o.apply(i).name() for i in range(o.size())))
            return  # don't descend into the cached build subtree
        ch = p.children()
        for i in range(ch.size()):
            _top_scans(ch.apply(i))

    _top_scans(plan)
    assert ("vec_id", "label", "s", "code") in top, f"codes cache unread: {top}"
    assert ("s", "code", "cw") in top, f"codeword cache unread: {top}"
    assert any(s[-1] == "svec" for s in top), f"sub cache unread: {top}"


def test_kmv_plan_one_corpus_exchange(spark, sf_dir):
    """Scale contract: ONE corpus-sized exchange (the (event_type, h)
    distinct with map-side partial dedup); the per-segment bottom-k is
    a WindowGroupLimit; everything downstream is sketch-sized and the
    pair assembly never produces a cartesian of anything
    corpus-sized."""
    df = _lookup("events_kmv_theta_sketch_overlap").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    # the only hashpartitioning exchanges allowed: the distinct's
    # (event_type, h) and sketch-sized regroups; none on user_id alone
    assert "Exchange hashpartitioning(user_id" not in plan


@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    n_users=st.integers(min_value=1, max_value=400),
    n_types=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_kmv_differential_fuzz(spark, tmp_path_factory, seed, n_users, n_types):
    """Random events lakes — skewed membership, segments straddling
    the k boundary, single-type and single-user corners — must
    hash-match the KMV oracle (bottom-k tie handling, theta
    selection, the exact-below-k path, and the double arithmetic)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_events = int(rng.integers(1, 2000))
    types = [f"t{i}" for i in range(n_types)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(n_events), pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n_events)],
                           pa.timestamp("us")),
            "user_id": pa.array(
                rng.zipf(1.5, n_events) % n_users if n_users > 1
                else np.zeros(n_events), pa.int64()),
            "event_type": pa.array(
                [types[i] for i in rng.integers(0, n_types, n_events)],
                pa.string()),
            "value": pa.array(rng.uniform(0, 400, n_events), pa.float64()),
            "props": pa.array(['{"k": 1}'] * n_events, pa.string()),
        }
    )
    tmp = str(tmp_path_factory.mktemp("kmv_fuzz"))
    pq.write_table(tbl, f"{tmp}/events.parquet")
    _gate_compare(spark, tmp, "events_kmv_theta_sketch_overlap", ["events"])


def test_residual_encoding_changes_the_ranking(spark, sf_dir):
    """The residual search must be a real re-encoding, not a twin:
    structural invariants (no self-pairs, contiguous per-query ranks)
    hold, every query from the raw-vector search also answers here,
    and at least one query's top-k ORDER differs from the raw-vector
    ADC search — centered residual codebooks quantize differently
    from global-vector codebooks by construction."""
    res = _lookup("sim_ivf_pq_residual_search").fn(spark, sf_dir).collect()
    raw = _lookup("sim_ivf_pq_adc_search").fn(spark, sf_dir).collect()
    assert res
    by_q_res, by_q_raw = {}, {}
    for r in res:
        assert r.query_id != r.neighbor_id
        by_q_res.setdefault(r.query_id, []).append(r)
    for r in raw:
        by_q_raw.setdefault(r.query_id, []).append(r)
    assert set(by_q_res) == set(by_q_raw)
    for q, rows in by_q_res.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    def order(d):
        return {q: [r.neighbor_id for r in sorted(rows, key=lambda r: r.rnk)]
                for q, rows in d.items()}
    assert order(by_q_res) != order(by_q_raw)


# --- construction laziness (r10 ADVICE) --------------------------------

# Candidates whose CONSTRUCTION may launch a Spark job, with the
# reason on record BEFORE promotion (r10 ADVICE: laziness is the
# registry convention test_multiprobe_plan_construction_is_lazy pins,
# so any exception must be documented here, not discovered by a
# harness later).
CONSTRUCTION_LAZY_EXEMPT = {
    # events_kmv_theta_sketch_overlap eagerly fills its sketch cache
    # at construction: the sketch is referenced from five subtrees of
    # ONE job, which otherwise serialize on the cold cache's block
    # locks — measured at x200: no persist 6.4 s, lazy persist
    # 3.45 s, eager fill 1.34 s. The fill job is sketch-sized (k x
    # segments rows) and reads the same exchange the cache needs
    # anyway. Harnesses that construct every frame up front pay that
    # one job per construction — the accepted trade.
    "events_kmv_theta_sketch_overlap",
}


def test_candidate_construction_laziness(spark, sf_dir):
    """Every r11 candidate constructs without launching a Spark job,
    except the documented exemptions — whose eager fill must really
    run (if it stops running, the exemption is stale and should be
    deleted)."""
    tracker = spark.sparkContext.statusTracker()
    for name in CANDIDATES:
        fn = _lookup(name).fn
        fn(spark, sf_dir)  # warm table/footer caches
        before = set(tracker.getJobIdsForGroup(None) or ())
        fn(spark, sf_dir)
        after = set(tracker.getJobIdsForGroup(None) or ())
        if name in CONSTRUCTION_LAZY_EXEMPT:
            assert after != before, f"{name}: documented eager fill vanished"
        else:
            assert after == before, f"{name} construction launched a job"


def test_residual_slots_reuse_on_same_lake(spark, sf_dir, monkeypatch):
    """r14: the residual search's index frames get the same
    _reuse_or_swap lifecycle the adc search received at r13 — a
    repeat invocation on the SAME lake returns the warm persisted
    frames (faiss add-once/search-many: the x500 profile put ~90% of
    the wall in per-invocation index rebuild), while output stays
    identical across the reuse."""
    from noaa_data_pipeline_spark.plans import staging_r11 as s11

    # the in-session leg is what owns these slots (routing pins: r15)
    monkeypatch.setenv("SPARK_GRAFT_PQ_INDEX", "0")
    s11.reset_search_index_slots()
    fn = _lookup("sim_ivf_pq_residual_search").fn
    df = fn(spark, sf_dir)
    first_digest = frame_digest(df.columns, [tuple(r) for r in df.collect()])
    slots = (
        s11._RESID_CVECS_PERSISTED,
        s11._RESID_RSUB_PERSISTED,
        s11._RESID_CODEWORDS_PERSISTED,
        s11._RESID_CODES_PERSISTED,
    )
    assert all(len(s) == 1 for s in slots), "index slots not populated"
    warm = [s[0] for s in slots]
    df2 = fn(spark, sf_dir)
    second_digest = frame_digest(df2.columns, [tuple(r) for r in df2.collect()])
    for slot, prev in zip(slots, warm):
        assert slot[0] is prev, "same-lake repeat rebuilt the index"
    assert second_digest == first_digest


def test_reset_search_index_slots_forces_rebuild(spark, sf_dir, monkeypatch):
    """The bench hook really drops the index: after reset every slot
    is empty, the cached blocks are unregistered, and the next
    invocation rebuilds fresh frames (this is what makes the
    spark_cold_sec rows in BENCH_SCALE build-inclusive rather than a
    mislabeled warm run)."""
    from noaa_data_pipeline_spark.plans import staging_r11 as s11

    # the in-session leg is what owns these slots (routing pins: r15)
    monkeypatch.setenv("SPARK_GRAFT_PQ_INDEX", "0")
    fn = _lookup("sim_ivf_pq_adc_search").fn
    fn(spark, sf_dir).collect()
    assert s11._ADC_CODES_PERSISTED, "adc index slot not populated"
    old = s11._ADC_CODES_PERSISTED[0]
    s11.reset_search_index_slots()
    for slot in (
        s11._ADC_SUB_PERSISTED,
        s11._ADC_CODEWORDS_PERSISTED,
        s11._ADC_CODES_PERSISTED,
        s11._RESID_CVECS_PERSISTED,
        s11._RESID_RSUB_PERSISTED,
        s11._RESID_CODEWORDS_PERSISTED,
        s11._RESID_CODES_PERSISTED,
    ):
        assert slot == []
    assert str(old.storageLevel) == str(
        type(old.storageLevel)(False, False, False, False, 1)
    ), "reset left the old index frame cached"
    fn(spark, sf_dir).collect()
    assert s11._ADC_CODES_PERSISTED and s11._ADC_CODES_PERSISTED[0] is not old
