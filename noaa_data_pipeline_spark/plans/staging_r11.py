"""Round-11 candidate operator, staged OUTSIDE the driver registry.

The round-10 gate window is exactly full (50 = 47 stale re-proves +
the 3 graph_eval promotions — see GATE_PRIORITY in
``plans/__init__.py``), so the fourth round-9-staged candidate waits
here, oracle-proven under pytest only (tests/test_staging_r11.py
runs the exact driver-gate compare), and round 11 promotes it by
moving the ``stage`` decorator to ``register`` and adding the name
to GATE_PRIORITY — the same staged-promotion path every round-7..10
operator took.

- ``sim_ivf_pq_adc_search`` — the production IVF+PQ combined search
  (faiss IndexIVFPQ): probe the nprobe nearest cells, ADC-score only
  within them. Composes the separately-proven halves
  (sim_ivf_multiprobe x sim_pq_adc_topk) into the shape a
  billion-vector deployment actually runs.

Reference anchor (spec, not code): extends SURVEY.md's similarity
lifecycle family beyond the reference's own surface, like the
round-5-10 additions it follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import Query
from .similarity import (
    NPROBE,
    N_QUERIES,
    TOP_K,
    _SQL_DEC,
    _SQL_EMB,
    _SQL_PQ_PREFIX,
    _SQL_SQDIST,
    _centroid_vectors,
    _embeddings,
    _pq_best_codes,
    _pq_codewords,
    _pq_subvectors,
    _sqdist,
    _sqdist_dbl,
    _sql_sqdist,
)

# --- staging registry (NOT the driver registry) -----------------------

STAGED: dict[str, Query] = {}


def stage(name: str, oracle: str | None = None, doc: str = ""):
    """Mirror of ``plans.register`` writing to the staging dict, so
    promotion in round 11 is a one-word decorator swap."""

    def deco(fn):
        STAGED[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


# --- sim_ivf_pq_adc_search ----------------------------------------------


@stage(
    "sim_ivf_pq_adc_search",
    oracle=f"""
    WITH emb AS ({_SQL_EMB}),
    {_SQL_PQ_PREFIX},
    ccomps AS (
        SELECT label, unnest(emb) AS val, generate_subscripts(emb, 1) AS dim
        FROM emb
    ),
    centroids AS (
        SELECT label, dim,
               CAST(CAST(SUM(CAST(val AS {_SQL_DEC})) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS cval
        FROM ccomps GROUP BY label, dim
    ),
    cvecs AS (
        SELECT label, list(cval ORDER BY dim) AS cvec FROM centroids GROUP BY label
    ),
    queries AS (
        SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
        FROM emb WHERE vec_id < {N_QUERIES}
    ),
    cellrank AS (
        SELECT q.query_id, v.label AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_SQL_SQDIST} ASC, v.label
               ) AS crnk
        FROM queries q CROSS JOIN cvecs v
    ),
    probes AS (SELECT query_id, cell FROM cellrank WHERE crnk <= {NPROBE}),
    codes AS (
        SELECT b.vec_id, e.label, b.s, b.code
        FROM best b JOIN emb e ON e.vec_id = b.vec_id
        WHERE b.rn = 1
    ),
    qdist AS (
        SELECT v.vec_id AS query_id, v.s, c.code,
               {_sql_sqdist('v.svec', 'c.cw')} AS qd
        FROM sub v JOIN codewords c ON c.s = v.s
        WHERE v.vec_id < {N_QUERIES}
    ),
    adc AS (
        SELECT p.query_id, cd.vec_id AS neighbor_id, SUM(q.qd) AS approx_d
        FROM codes cd
        JOIN probes p ON p.cell = cd.label
        JOIN qdist q ON q.query_id = p.query_id
                    AND q.s = cd.s AND q.code = cd.code
        WHERE cd.vec_id <> p.query_id
        GROUP BY p.query_id, cd.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(CAST(approx_d AS VARCHAR) AS DOUBLE) AS approx_dist_sq, rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY approx_d, neighbor_id
        ) AS rnk
        FROM adc
    ) r WHERE rnk <= {TOP_K}
    """,
)
def sim_ivf_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF+PQ search (the faiss IndexIVFPQ shape):
    each query probes its {NPROBE} nearest IVF cells by exact
    centroid distance, and within the probed cells scores candidates
    by ADC — the sum of precomputed per-subspace codeword distances —
    instead of full-dimension dot products. Composes the two halves
    the registry already proves separately: sim_ivf_multiprobe
    (cell probing, full-precision scoring) and sim_pq_adc_topk
    (ADC scoring, full-corpus scan); this entry is the shape a real
    billion-vector deployment runs, where neither full-corpus ADC nor
    full-precision cell scans are affordable.

    Exactness: centroid ranking and the ADC lookup tables reuse the
    decimal + VARCHAR-hop machinery (bit-identical ranking across
    engines; ties break on cell / code / neighbor_id); cell ranking
    orders on the string->double hop of the decimal distance
    (similarity._sqdist_dbl), the same DOUBLE the oracle's
    _SQL_SQDIST ranks by (r10 ADVICE: ranking on the raw decimal
    tie-broke differently when two distances rounded to one double);
    the final approx distance is a {2}-term sum of decimal-derived
    doubles.

    Scale: the centroid table (k x dim) and the per-query artifacts
    (probe list: queries x nprobe rows; ADC tables: queries x
    subspaces x codes entries — kilobytes) all BROADCAST onto the
    corpus-codes scan; the probed-cell restriction is a broadcast
    semi-filter, per-(query, vector) sums combine map-side, and
    per-query top-k is a WindowGroupLimit. The corpus never shuffles
    and the scored volume drops from corpus x queries (sim_pq_adc_topk)
    to corpus x queries x nprobe / k — the IVF contract applied to
    the compressed domain."""
    emb = _embeddings(spark, sf_dir)
    sub = _pq_subvectors(emb)
    codes = _pq_best_codes(sub).select("vec_id", "label", "s", "code")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
    )
    cellrank = q.crossJoin(F.broadcast(_centroid_vectors(emb))).select(
        "query_id",
        F.col("label").alias("cell"),
        _sqdist_dbl(F.col("q_emb"), F.col("cvec")).alias("d2"),
    )
    cw = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (
        cellrank.withColumn("crnk", F.row_number().over(cw))
        .filter(F.col("crnk") <= NPROBE)
        .select("query_id", "cell")
    )
    qdist = (
        sub.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(_pq_codewords(sub)), "s")
        .select(
            F.col("vec_id").alias("query_id"),
            "s",
            "code",
            _sqdist(F.col("svec"), F.col("cw")).alias("qd"),
        )
    )
    adc = (
        codes.join(F.broadcast(probes), codes.label == F.col("cell"))
        .join(F.broadcast(qdist), ["query_id", "s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd").alias("approx_d"))
    )
    w = Window.partitionBy("query_id").orderBy("approx_d", "neighbor_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("approx_d").cast("string").cast("double").alias("approx_dist_sq"),
            "rnk",
        )
    )
