"""K-means verified against an independent numpy implementation of
the same deterministic specification (init = lowest vec_ids, ties to
lowest centroid id, means at 1e-6 fixed point)."""

from __future__ import annotations

import math

import numpy as np

from noaa_data_pipeline_spark.plans import iterative


def numpy_kmeans(ids, vecs, k, iterations):
    order = np.argsort(ids)
    ids, vecs = np.asarray(ids)[order], np.asarray(vecs)[order]
    centroids = vecs[:k].astype(np.float64).copy()
    assign = None
    for _ in range(iterations):
        d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the first (lowest cid) on ties
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                centroids[c] = np.floor(members * 1e6).sum(axis=0) / 1e6 / len(members)
    return ids, assign


def test_kmeans_matches_numpy(spark, duck, sf_dir):
    from pyspark.sql import functions as F
    from noaa_data_pipeline_spark.tables import load_table

    raw = load_table(spark, sf_dir, "embeddings")
    emb = raw.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    assigned, _ = iterative.kmeans(spark, emb, k=4, iterations=3)
    got = {r.vec_id: r.cid for r in assigned.collect()}

    rows = duck.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    nids, nassign = numpy_kmeans(ids, vecs, k=4, iterations=3)
    # numpy assign index i -> centroid seeded from vec i -> cid = ids[i]
    expected = {int(v): int(nids[a]) for v, a in zip(nids, nassign)}
    mismatches = {v: (got[v], expected[v]) for v in expected if got[v] != expected[v]}
    # float distance near-ties could flip an assignment between
    # engines; require exact agreement (the spec is deterministic)
    assert not mismatches, dict(list(mismatches.items())[:5])
    assert not math.isnan(sum(got.values()))
