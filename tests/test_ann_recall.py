"""Recall of the sub-quadratic candidate generators against
independent pure-Python ground truths at sf0.01.

The correctness gate proves the LSH plans equal their own banded
oracle SQL; these tests answer the different question of how much of
the TRUE near-duplicate/neighbor set the banded parameters recover,
and that OR-amplification (more bands) buys recall as the s-curve
predicts. Ground truths come from numpy / hand-rolled shingle sets,
not from the engine under test."""

from __future__ import annotations

import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from noaa_data_pipeline_spark.plans.dedup import minhash_lsh_pairs
from noaa_data_pipeline_spark.plans.similarity import ann_lsh_pairs

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def cosine_truth():
    """All vector pairs with cosine >= 0.3 via numpy."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    emb = np.array(t["embedding"].to_pylist(), dtype=float)
    ids = np.array(t["vec_id"].to_pylist())
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cos = n @ n.T
    iu, ju = np.triu_indices(len(ids), 1)
    mask = cos[iu, ju] >= 0.3
    return {
        (min(a, b), max(a, b))
        for a, b in zip(ids[iu[mask]].tolist(), ids[ju[mask]].tolist())
    }


def test_hyperplane_lsh_recall_improves_with_bands(spark, cosine_truth):
    assert len(cosine_truth) > 100  # the fixture corpus has real pairs

    def recall(bands):
        got = {
            (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
            for r in ann_lsh_pairs(spark, SF_DIR, planes=3, bands=bands).collect()
        }
        assert got <= cosine_truth  # precision 1.0: cosine verify is exact
        return len(got & cosine_truth) / len(cosine_truth)

    r1 = recall(1)
    r4 = recall(4)
    # s-curve: p(cos 0.3) ~ 0.6/plane -> ~0.2 per 3-plane band;
    # 1 - (1 - p^3)^4 ~ 0.6. Deterministic md5 planes -> stable floor.
    assert r4 > r1
    assert r4 >= 0.4


def _shingle_sets(n=5):
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    out = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if w]
        out[doc_id] = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return out


@pytest.fixture(scope="module")
def jaccard_truth():
    """All doc pairs with shingle-Jaccard >= 0.5 via pure Python
    (inverted index, no engine code)."""
    sets = _shingle_sets()
    by_shingle: dict[str, list] = {}
    for d, s in sets.items():
        for sh in s:
            by_shingle.setdefault(sh, []).append(d)
    cand = {
        (a, b)
        for docs in by_shingle.values()
        for i, a in enumerate(docs)
        for b in docs[i + 1 :]
    }
    truth = set()
    for a, b in cand:
        a, b = min(a, b), max(a, b)
        inter = len(sets[a] & sets[b])
        if inter and inter / len(sets[a] | sets[b]) >= 0.5:
            truth.add((a, b))
    return truth


def test_minhash_lsh_recall_vs_exact_jaccard(spark, jaccard_truth):
    assert len(jaccard_truth) >= 10
    got = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in minhash_lsh_pairs(spark, SF_DIR, k=12, bands=4).collect()
    }
    assert got <= jaccard_truth  # exact-Jaccard verification: no false positives
    recall = len(got & jaccard_truth) / len(jaccard_truth)
    # knee (1/4)^(1/3) ~ 0.63; fixture near-dups sit well above it
    assert recall >= 0.9
    # more bands (k=12, b=6, r=2: knee ~ 0.41) cannot lose candidates
    got6 = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in minhash_lsh_pairs(spark, SF_DIR, k=12, bands=6).collect()
    }
    assert got6 >= got


def test_band_divisibility_guard(spark):
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(spark, SF_DIR, k=12, bands=5)


def test_block_matmul_topk_matches_exact_within_block(spark):
    """The BLAS path returns the same neighbors as the decimal-exact
    IVF entry (both search within the label block) with scores equal
    to float64 tolerance."""
    import numpy as np

    from noaa_data_pipeline_spark.plans.similarity import (
        block_matmul_scored,
        sim_ivf_probe1,
    )

    fast = block_matmul_scored(spark, SF_DIR).collect()
    exact = sim_ivf_probe1(spark, SF_DIR).collect()
    fast_k = {(r.query_id, r.rnk): (r.neighbor_id, r.cosine) for r in fast}
    exact_k = {(r.query_id, r.rnk): (r.neighbor_id, r.cosine) for r in exact}
    assert fast_k.keys() == exact_k.keys()
    for key, (nid, cos) in fast_k.items():
        e_nid, e_cos = exact_k[key]
        assert nid == e_nid, f"{key}: {nid} != {e_nid}"
        assert np.isclose(cos, e_cos, atol=1e-9), (key, cos, e_cos)


def test_minhash_hot_bucket_cap(spark, jaccard_truth):
    """max_bucket drops only candidate-generation width: capped runs
    return a subset of the uncapped pairs, a generous cap returns
    exactly the uncapped set, and precision stays 1.0 throughout."""
    base = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in minhash_lsh_pairs(spark, SF_DIR).collect()
    }
    generous = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in minhash_lsh_pairs(spark, SF_DIR, max_bucket=10**6).collect()
    }
    assert generous == base
    tight = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in minhash_lsh_pairs(spark, SF_DIR, max_bucket=2).collect()
    }
    assert tight <= base
    assert tight <= jaccard_truth


def test_ivf_multiprobe_structure_and_recall(spark):
    """Multi-probe IVF: every neighbor comes from one of the query's
    nprobe nearest cells, exactly TOP_K rows per query, and recall
    against the exact numpy top-k is at least the single-cell
    probe's (the whole point of probing a second cell)."""
    from noaa_data_pipeline_spark.plans.similarity import (
        N_QUERIES,
        NPROBE,
        TOP_K,
        sim_ivf_multiprobe,
        sim_ivf_probe1,
    )

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    emb = np.array(t["embedding"].to_pylist(), dtype=float)
    ids = np.array(t["vec_id"].to_pylist())
    labels = np.array(t["label"].to_pylist())
    norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)

    # exact top-k ground truth per query
    truth = {}
    for qid in range(N_QUERIES):
        qi = int(np.where(ids == qid)[0][0])
        cos = norm[qi] @ norm.T
        order = np.lexsort((ids, -cos))
        order = order[ids[order] != qid][:TOP_K]
        truth[qid] = set(ids[order].tolist())

    # numpy cell ranking: mean centroid per label, 2 nearest by L2
    cells = {}
    for lab in np.unique(labels):
        cells[lab] = emb[labels == lab].mean(axis=0)
    cell_ids = sorted(cells)
    cmat = np.array([cells[c] for c in cell_ids])

    multi = sim_ivf_multiprobe(spark, SF_DIR).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    lab_of = dict(zip(ids.tolist(), labels.tolist()))
    for qid, rows in by_q.items():
        assert len(rows) == TOP_K
        qi = int(np.where(ids == qid)[0][0])
        d2 = ((cmat - emb[qi]) ** 2).sum(axis=1)
        # engine centroids are decimal-exact while numpy's are
        # float64, so a near-tie between cells #NPROBE and #NPROBE+1
        # could rank differently: accept either (the exact 2 cells
        # are pinned by the oracle hash; this checks the SHAPE)
        near = np.argsort(d2, kind="stable")[: NPROBE + 1]
        probed_loose = {cell_ids[j] for j in near}
        got_cells = {lab_of[r.neighbor_id] for r in rows}
        assert got_cells <= probed_loose
        assert len(got_cells) <= NPROBE

    def recall(rows_by_q):
        hit = sum(
            len({r.neighbor_id for r in rows} & truth[q])
            for q, rows in rows_by_q.items()
        )
        return hit / (N_QUERIES * TOP_K)

    # NOT an invariant vs probe-1 (its cell is the query's LABEL, not
    # its nearest centroid, so the candidate sets aren't nested) —
    # assert an absolute floor instead. On this fixture the measured
    # recall is 0.325; probing 2 of 8 cells blind would expect ~0.25,
    # so 0.25 asserts the centroid ranking is doing real work while
    # staying robust to fixture regeneration.
    assert recall(by_q) >= 0.25
    # and probe-1 stays callable/structured (smoke, no cross-compare)
    p1 = sim_ivf_probe1(spark, SF_DIR).collect()
    assert len(p1) == N_QUERIES * TOP_K


def test_mmr_rerank_matches_numpy_greedy(spark):
    """sim_mmr_rerank against an independent numpy greedy MMR: same
    picks in the same order for every query (float64 throughout, so
    scores match to ~1e-12; pick identity must be exact)."""
    from noaa_data_pipeline_spark.plans.similarity import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        N_QUERIES,
        sim_mmr_rerank,
    )

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    emb = np.array(t["embedding"].to_pylist(), dtype=float)
    ids = np.array(t["vec_id"].to_pylist())
    norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)

    got = {}
    for r in sim_mmr_rerank(spark, SF_DIR).collect():
        got.setdefault(r.query_id, []).append((r.mmr_rank, r.neighbor_id, r.score))

    for qid in range(N_QUERIES):
        qi = int(np.where(ids == qid)[0][0])
        cos = norm[qi] @ norm.T
        order = np.lexsort((ids, -cos))
        order = order[ids[order] != qid][:MMR_POOL]
        pool = ids[order].tolist()
        rel = {int(ids[j]): float(cos[j]) for j in order}

        def referee_score(d, picked):
            di = int(np.where(ids == d)[0][0])
            if not picked:
                return rel[d]
            div = max(
                float(norm[di] @ norm[int(np.where(ids == p)[0][0])])
                for p in picked
            )
            return MMR_LAMBDA * rel[d] - (1 - MMR_LAMBDA) * div

        # follow SPARK's picks and assert each is argmax within float
        # tolerance of the referee — an exact-identity compare would
        # flip on genuine sub-ulp score gaps between the engine's
        # decimal-exact arithmetic and numpy's BLAS cosines
        picks = [n for _, n, _ in sorted(got[qid])]
        assert len(picks) == MMR_K and len(set(picks)) == MMR_K, qid
        assert set(picks) <= set(pool), qid
        for step in range(MMR_K):
            chosen = picks[step]
            already = picks[:step]
            best = max(
                referee_score(d, already) for d in pool if d not in already
            )
            assert referee_score(chosen, already) >= best - 1e-9, (qid, step)
        numpy_scores = []
        sel = []
        for p in picks:
            di = int(np.where(ids == p)[0][0])
            if sel:
                div = max(
                    float(norm[di] @ norm[int(np.where(ids == q)[0][0])]) for q in sel
                )
                numpy_scores.append(MMR_LAMBDA * rel[p] - (1 - MMR_LAMBDA) * div)
            else:
                numpy_scores.append(rel[p])
            sel.append(p)
        for (rk, n, s), ns in zip(sorted(got[qid]), numpy_scores):
            assert abs(s - ns) < 1e-9, (qid, rk)
