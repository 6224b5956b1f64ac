"""Round-14 candidate: driver-gate-equivalent checks.

``docs_token_drift_tvd`` stays staged (see plans/staging_r14.py
docstring) and gets the full staging protocol here: the driver's
row-count + columns + order-insensitive value-hash compare, an
INDEPENDENT third implementation (pure Python token counting and
integer arithmetic over the raw parquet — neither engine), a
planted-drift case the synthetic corpus cannot express (a source
with a fully disjoint vocabulary must read ~1e6 ppm with its token
on top), differential fuzz over adversarial lakes (nulls, empty
texts, single-source corner), construction laziness, and plan-shape
(scale-contract) assertions.

Run with SPARK_GRAFT_TEST_SF_DIR at sf0.001 / sf0.01 / sf0.1 for the
three-SF staging proof (the maintenance-op promotion protocol).
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from noaa_data_pipeline_spark.plans import load_all
from noaa_data_pipeline_spark.plans.staging_r14 import STAGED, TVD_SCALE
from tools.check_correctness import frame_digest


def _staged_names():
    return sorted(STAGED.keys())


def test_staging_is_not_registered():
    """Staged candidates must not leak into the driver registry (a
    leak would break the gate-rotation freshness invariant
    mid-round)."""
    assert not (set(STAGED) & set(load_all().keys()))


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


# --- independent third implementation -----------------------------------


def _py_tvd(raw_rows):
    """Pure-Python reference: the same normalization regex, token
    counts, ppm quantization, and tie-breaks — computed with dicts
    and ints, no SQL engine anywhere."""
    counts: dict[tuple[str, str], int] = {}
    for source, text in raw_rows:
        if text is None:
            continue
        norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        for tok in norm.split(" "):
            counts[(source, tok)] = counts.get((source, tok), 0) + 1
    tok_tot: dict[str, int] = {}
    src_tot: dict[str, int] = {}
    for (source, tok), c in counts.items():
        tok_tot[tok] = tok_tot.get(tok, 0) + c
        src_tot[source] = src_tot.get(source, 0) + c
    n = sum(tok_tot.values())
    out = {}
    for source, t_s in src_tot.items():
        t_r = n - t_s
        total_gap, top = 0, None
        for tok, c_t in tok_tot.items():
            c_st = counts.get((source, tok), 0)
            share_s = (TVD_SCALE * c_st) // t_s
            share_r = (TVD_SCALE * (c_t - c_st)) // max(t_r, 1)
            gap = abs(share_s - share_r)
            total_gap += gap
            if top is None or (-gap, tok) < top:
                top = (-gap, tok)
        out[source] = (t_s, t_r, total_gap // 2, top[1], -top[0])
    return out


def test_tvd_matches_python_reference(spark, duck, sf_dir):
    """Both engines already hash-match; this pins them to a THIRD
    implementation so a shared misreading of the estimator definition
    cannot self-confirm."""
    raw = duck.execute("SELECT source, text FROM documents").fetchall()
    expected = _py_tvd(raw)
    rows = STAGED["docs_token_drift_tvd"].fn(spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        t_s, t_r, tvd, top_tok, top_gap = expected[r.source]
        assert (r.src_tokens, r.rest_tokens, r.tvd_ppm) == (t_s, t_r, tvd), r.source
        assert (r.top_token, r.top_gap_ppm) == (top_tok, top_gap), r.source


# --- planted drift + adversarial lakes -----------------------------------


def _write_docs(tmp, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([s for s, _ in rows], pa.string()),
                "n_chars": pa.array(
                    [len(t) if t else 0 for _, t in rows], pa.int64()
                ),
            }
        ),
        f"{tmp}/documents.parquet",
    )


def _gate_compare(spark, lake, name):
    import duckdb

    q = STAGED[name]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{lake}/documents.parquet')"
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
    return sdf.columns, srows


def test_tvd_planted_disjoint_source(spark, tmp_path_factory):
    """A source whose vocabulary is fully disjoint from the rest of
    the corpus must read near-total drift (~1e6 ppm, exact up to the
    per-token quantization) with one of its own tokens on top; the
    engines must hash-match on the same lake."""
    tmp = str(tmp_path_factory.mktemp("tvd_planted"))
    rows = [("common", "alpha beta gamma delta")] * 6 + [
        ("drifted", "zulu zulu yankee xray"),
        ("drifted", "zulu yankee xray xray"),
    ]
    _write_docs(tmp, rows)
    cols, srows = _gate_compare(spark, tmp, "docs_token_drift_tvd")
    by_src = {dict(zip(cols, r))["source"]: dict(zip(cols, r)) for r in srows}
    d = by_src["drifted"]
    # disjoint vocab: sum of gaps = (sum of own shares) + (sum of
    # rest shares) ~ 2e6 -> tvd ~ 1e6 minus quantization
    assert d["tvd_ppm"] > 990_000
    assert d["top_token"] in {"zulu", "xray", "yankee"}
    assert by_src["common"]["tvd_ppm"] > 990_000  # complement view is symmetric here


def test_tvd_single_source_corpus(spark, tmp_path_factory):
    """The degenerate one-source lake exercises the GREATEST(t_r, 1)
    clamp identically in both engines (rest is empty: every token's
    rest-share is 0, so tvd = sum(share_s)/2 ~ 5e5)."""
    tmp = str(tmp_path_factory.mktemp("tvd_single"))
    _write_docs(tmp, [("only", "a b c d"), ("only", "a b")])
    cols, srows = _gate_compare(spark, tmp, "docs_token_drift_tvd")
    row = dict(zip(cols, srows[0]))
    assert row["rest_tokens"] == 0
    assert 490_000 <= row["tvd_ppm"] <= 500_000


@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    n_docs=st.integers(min_value=1, max_value=40),
    n_srcs=st.integers(min_value=1, max_value=5),
    n_null=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_tvd_differential_fuzz(spark, tmp_path_factory, seed, n_docs, n_srcs, n_null):
    """Random lakes — skewed source sizes, shared and private vocab,
    NULL and empty texts, punctuation-only docs — must hash-match the
    oracle (the normalization idiom, the ppm integer division, the
    empty-complement clamp, and the argmax tie-break)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    vocab = ["spark", "merge", "zz9", "a", "row", "fast", "key", "0x"]
    rows = []
    for i in range(n_docs):
        src = f"s{rng.integers(n_srcs)}"
        k = int(rng.integers(0, 9))
        words = [vocab[int(rng.integers(len(vocab)))] for _ in range(k)]
        text = " ".join(words) if k else ("..." if rng.integers(2) else "")
        rows.append((src, text))
    for i in range(min(n_null, len(rows))):
        rows[i] = (rows[i][0], None)
    tmp = str(tmp_path_factory.mktemp("tvd_fuzz"))
    _write_docs(tmp, rows)
    _gate_compare(spark, tmp, "docs_token_drift_tvd")


# --- laziness + plan shape ------------------------------------------------


def test_candidate_construction_laziness(spark, sf_dir):
    """The r14 candidate constructs without launching a Spark job —
    no exemptions."""
    tracker = spark.sparkContext.statusTracker()
    for name in _staged_names():
        fn = STAGED[name].fn
        fn(spark, sf_dir)  # warm table/footer caches
        before = set(tracker.getJobIdsForGroup(None) or ())
        fn(spark, sf_dir)
        after = set(tracker.getJobIdsForGroup(None) or ())
        assert after == before, f"{name} construction launched a job"


def test_tvd_plan_shape(spark, sf_dir):
    """Scale contract: the corpus is tokenized and counted ONCE —
    every consumer (vocabulary/source/grand totals, the join probe
    side) reads the persisted (source, tok) frame, so the plan shows
    InMemoryTableScans and NO second tokenize+count subtree; the
    comparison grid is assembled by broadcast (never a corpus-sized
    cartesian), and nothing drops to Python."""
    df = STAGED["docs_token_drift_tvd"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
    # four cache reads (source totals, vocab totals, grand total,
    # join probe side) of ONE cached build: every rendered copy of
    # the tokenize+count subtree under the scans carries the same
    # plan_id, i.e. the corpus exchange is physically built once
    assert plan.count("InMemoryTableScan") == 4
    corpus_builds = set(re.findall(r"REPARTITION_BY_NUM, \[plan_id=(\d+)\]", plan))
    assert len(corpus_builds) == 1, corpus_builds
    assert "BroadcastNestedLoopJoin" in plan  # the tiny comparison grid
