"""Corpus lifecycle / maintenance operators.

The standing-jobs family a 100 TB training-data lake runs between
queries: incremental dedup of a new ingest batch against the stored
corpus index, semantic (embedding-space) dedup and its output-linear
purge form, ANN index maintenance (inserting a vector batch into an
existing IVF index), corpus-statistics quality bucketing, and
streaming small-file compaction.

History: built and oracle-proven in round 7 as the staged surface
``plans/staging_r8.py`` (outside the registry — the r7 gate window
was full), promoted into the driver registry in round 8 with the
GATE_PRIORITY rotation. VERDICT/GATE_LOG citations of
``staging_r8.py`` line numbers refer to this file pre-rename.

Reference anchors (spec, not code): the reference's nightly parquet
re-snapshot loop (weather_data.rs:92-146) is the compaction shape;
the dedup/quality/ANN ops extend SURVEY.md's LLM-pipeline family.
"""

from __future__ import annotations

import atexit
import glob
import hashlib
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, table_path
from . import register
from .common import SCALE


# --- semantic dedup over embedding clusters ---------------------------

SEM_K = 8
SEM_ITERS = 2
SEM_COSINE_MIN = 0.3


def _sem_assign_ctes(k: int, iterations: int) -> str:
    """Unrolled Lloyd CTEs ending in ``assign{iterations}`` — the same
    exact-arithmetic construction as iterative._kmeans_oracle_sql
    (scaled-long centroid means, index-order distance accumulation,
    argmin ties on cid), restated here so the staged oracle does not
    edit the gated module this round."""
    from .similarity import _sql_dot

    dist = (
        "list_sum(list_transform(list_zip(e.emb, c.c_emb), "
        "x -> (x[1] - x[2]) * (x[1] - x[2])))"
    )
    emb_expr = "CAST(embedding AS DOUBLE[])"
    parts = [
        f"""emb AS (
        SELECT vec_id, {emb_expr} AS emb,
               sqrt({_sql_dot(emb_expr, emb_expr)}) AS norm
        FROM embeddings
    )""",
        f"cent0 AS (SELECT vec_id AS cid, emb AS c_emb FROM emb ORDER BY vec_id LIMIT {k})",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""assign{i} AS (
            SELECT vec_id, emb, norm, cid FROM (
                SELECT e.vec_id, e.emb, e.norm, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id ORDER BY {dist}, c.cid
                       ) AS rn
                FROM emb e CROSS JOIN cent{i - 1} c
            ) ranked WHERE rn = 1
        )"""
        )
        if i < iterations:
            parts.append(
                f"""cent{i} AS (
                SELECT cid, list(mean ORDER BY dim) AS c_emb FROM (
                    SELECT cid, dim,
                           (CAST(SUM(CAST(FLOOR(val * {SCALE}) AS BIGINT)) AS DOUBLE)
                               / {SCALE}) / COUNT(val) AS mean
                    FROM (
                        SELECT cid, generate_subscripts(emb, 1) AS dim,
                               unnest(emb) AS val
                        FROM assign{i}
                    ) comps
                    GROUP BY cid, dim
                ) m GROUP BY cid
            )"""
            )
    return ",\n".join(parts)


def _sem_pairs_ctes(k: int = SEM_K, iterations: int = SEM_ITERS) -> str:
    """CTE chain ending in ``sem_pairs(cid, vec_a, vec_b, cosine)`` —
    shared by the pair oracle and the purge-report oracle."""
    from .similarity import _sql_dot

    cos = f"{_sql_dot('a.emb', 'b.emb')} / (a.norm * b.norm)"
    return f"""{_sem_assign_ctes(k, iterations)},
    sem_pairs AS MATERIALIZED (
        -- MATERIALIZED mirrors the cc oracle in plans/iterative.py:
        -- the recursive closure re-reads this per round.
        -- norm > 0 on BOTH sides, mirrored in the Spark plan: a
        -- vector tiny enough that every decimal(·,15) x*x product
        -- rounds to 0 has norm 0, and a mixed pair could divide a
        -- NONZERO dot by 0 (DuckDB: inf, which passes >=; Spark
        -- ANSI: DIVIDE_BY_ZERO error) — excluded explicitly so
        -- neither engine's division-by-zero convention is load-bearing
        SELECT a.cid AS cid, a.vec_id AS vec_a, b.vec_id AS vec_b,
               {cos} AS cosine
        FROM assign{iterations} a JOIN assign{iterations} b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE a.norm > 0 AND b.norm > 0
          AND {cos} >= {SEM_COSINE_MIN}
    )"""


def _sem_oracle_sql(k: int = SEM_K, iterations: int = SEM_ITERS) -> str:
    return f"""
    WITH {_sem_pairs_ctes(k, iterations)}
    SELECT cid, vec_a, vec_b, cosine FROM sem_pairs
    """


def _np_assign(mat, centroids: list[tuple[int, list[float]]]):
    """Nearest-centroid ids for a (n, dim) float64 matrix, bit-exact
    to the oracle's sequential fold: the squared-distance accumulator
    runs dimension-by-dimension IN INDEX ORDER (vectorized across
    rows, sequential across dims), so every distance is the identical
    IEEE double the oracle's list_sum / Spark's F.aggregate produce —
    np.sum's pairwise reordering would break the argmin tie
    guarantee. ``centroids`` must be sorted by cid: np.argmin takes
    the first minimum, which is then the lowest cid, matching the
    oracle's ORDER BY dist, cid."""
    import numpy as np

    assert all(
        centroids[i][0] < centroids[i + 1][0] for i in range(len(centroids) - 1)
    ), "centroids must be sorted by cid for the argmin tie-break"
    cols = []
    for _cid, c_emb in centroids:
        acc = np.zeros(mat.shape[0], dtype=np.float64)
        for k in range(mat.shape[1]):
            d = mat[:, k] - c_emb[k]
            acc = acc + d * d
        cols.append(acc)
    idx = np.argmin(np.stack(cols, axis=1), axis=1)
    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    return cids[idx]


# Lloyd results per source-content fingerprint: the clusters entry,
# the purge entry, and repeated test invocations all need the same
# centroids — recomputing the collect/toPandas rounds per call would
# triple the driver-side phase (review finding)
_SEM_CENT_CACHE: dict[str, list[tuple[int, list[float]]]] = {}


def _semantic_centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    """SEM_ITERS-round Lloyd centroids, cached per embeddings-table
    fingerprint. The phase never touches norms, so it reads the raw
    vectors and skips _embeddings' decimal norm computation."""
    import numpy as np
    import pandas as pd

    key = _table_fingerprint(sf_dir, "embeddings")
    cached = _SEM_CENT_CACHE.get(key)
    if cached is not None:
        return cached
    raw = load_table(spark, sf_dir, "embeddings")
    kemb = raw.repartition(spark.sparkContext.defaultParallelism, "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    seeds = kemb.orderBy("vec_id").limit(SEM_K).select("vec_id", "emb").collect()
    centroids = sorted((r["vec_id"], list(r["emb"])) for r in seeds)
    for _ in range(SEM_ITERS - 1):
        cents = centroids  # bind for the closure

        def lloyd_partials(batches):
            """Per-batch (cid, dim, scaled-long sum, count) partials:
            integer partials commute, so partitioning can't change the
            combined mean; the mean formula below mirrors the oracle's
            (SUM(FLOOR(val*SCALE))::DOUBLE / SCALE) / COUNT exactly."""
            for pdf in batches:
                mat = np.array(pdf["emb"].tolist(), dtype=np.float64)
                if mat.size == 0:
                    continue
                cids = _np_assign(mat, cents)
                sc = np.floor(mat * SCALE).astype(np.int64)
                for cid in np.unique(cids):
                    m = sc[cids == cid]
                    yield pd.DataFrame(
                        {
                            "cid": np.full(mat.shape[1], int(cid), dtype=np.int64),
                            "dim": np.arange(mat.shape[1], dtype=np.int64),
                            "s": m.sum(axis=0),
                            "n": np.full(mat.shape[1], m.shape[0], dtype=np.int64),
                        }
                    )

        parts = kemb.mapInPandas(
            lloyd_partials, schema="cid long, dim long, s long, n long"
        ).toPandas()
        combined = parts.groupby(["cid", "dim"], sort=True).sum().reset_index()
        centroids = sorted(
            (
                int(cid),
                [
                    (float(r.s) / SCALE) / float(r.n)
                    for r in g.sort_values("dim").itertuples()
                ],
            )
            for cid, g in combined.groupby("cid")
        )
    _SEM_CENT_CACHE[key] = centroids
    return centroids


@register("dedup_semantic_clusters", oracle=_sem_oracle_sql())
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic near-dup detection: embeddings are
    k-means-clustered ({SEM_ITERS} Lloyd rounds over {SEM_K} seed
    centroids), then cosine pairs are generated ONLY within a cluster
    and kept at >= {SEM_COSINE_MIN}. Unlike ``dedup_embedding_cosine``
    (label-blocked), the blocking key here is unsupervised — the shape
    used when no labels exist, which is the 100 TB corpus reality.
    Scale: the centroid set is control-plane-small (k x dim doubles),
    so each Lloyd round collects it to the driver and inlines it as
    literals — assignment is then a pure map-side expression over the
    corpus (the MLlib k-means shape: only centroids ever leave the
    executors). The pair join shuffles on cid, so cost is the sum of
    per-cluster squares, not corpus-squared; k rises with corpus size
    to bound cluster width. Exactness: a double-dot prefilter (margin
    1e-6, far beyond fold rounding) bounds the candidate set, then the
    surviving pairs get the decimal dot with the VARCHAR hop
    (similarity._dot) so the emitted cosine is hash-stable across
    engines; centroid means use scaled-long sums like the oracle."""
    import numpy as np
    import pandas as pd

    from .similarity import _dot, _embeddings

    final_cents = _semantic_centroids(spark, sf_dir)

    def assign_members(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["emb"].tolist(), dtype=np.float64)
            out = pdf.copy()
            out["cid"] = _np_assign(mat, final_cents)
            yield out[["cid", "vec_id", "emb", "norm"]]

    emb = _embeddings(spark, sf_dir)
    # norm > 0 (the DECIMAL norm — the actual divisor downstream),
    # mirrored in the oracle's WHERE: a vector tiny enough that every
    # decimal x*x rounds to 0 would otherwise reach the exact stage
    # with a 0 divisor and abort under Spark's ANSI mode
    members = (
        emb.filter(F.col("norm") > 0)
        .select("vec_id", "emb", "norm")
        .mapInPandas(
            assign_members,
            schema="cid long, vec_id long, emb array<double>, norm double",
        )
    )

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one cluster via a single BLAS
        matmul (the sim_block_matmul pattern): float64 GEMM error is
        ~1e-13 relative, so the 1e-6 margin cannot miss a pair whose
        exact cosine clears the threshold; the decimal recompute
        downstream decides final membership, so BLAS summation order
        never reaches the output."""
        mat = np.array(pdf["emb"].tolist(), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        # an exactly-zero vector yields NaN cosine here; NaN >=
        # threshold is False so the pair drops. (Vectors whose
        # DECIMAL norm rounds to 0 while the float norm doesn't are
        # already excluded upstream by the members norm > 0 filter —
        # this guard only covers the float-zero case.)
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = (mat @ mat.T) / np.outer(norms, norms)
            ii, jj = np.where(sims >= SEM_COSINE_MIN - 1e-6)
        keep = ids[ii] < ids[jj]
        return pd.DataFrame(
            {
                "cid": np.full(int(keep.sum()), int(pdf["cid"].iloc[0]), dtype=np.int64),
                "vec_a": ids[ii[keep]].astype(np.int64),
                "vec_b": ids[jj[keep]].astype(np.int64),
            }
        )

    cands = members.groupBy("cid").applyInPandas(
        cluster_pairs, schema="cid long, vec_a long, vec_b long"
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"), F.col("norm").alias("norm_a")
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"), F.col("norm").alias("norm_b")
    )
    # explode-as-barrier (r15, the ann_lsh_pairs note): keeps the
    # exact-confirm threshold from being pushed into the embedding
    # attach joins, which evaluated the decimal fold twice per
    # numpy-prefiltered candidate.
    return (
        cands.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "cid",
            "vec_a",
            "vec_b",
            F.explode(
                F.array(
                    _dot(F.col("emb_a"), F.col("emb_b"))
                    / (F.col("norm_a") * F.col("norm_b"))
                )
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= SEM_COSINE_MIN)
    )


# --- perplexity-proxy quality bucketing -------------------------------

RARE_MAX = 2  # a trigram seen <= RARE_MAX times corpus-wide is "rare"
PPM_LOW = 200_000  # > 20% rare trigrams -> low quality (noise-like)
PPM_HIGH = 50_000  # < 5% rare -> high quality (fluent/common text)


@register(
    "text_perplexity_proxy",
    oracle=f"""
    WITH tg AS (
        -- list-valued range + unnest: the range() TABLE function
        -- cannot take a lateral column parameter in DuckDB
        SELECT doc_id, substr(text, CAST(i AS INTEGER), 3) AS tg
        FROM (
            SELECT doc_id, text, unnest(range(1, length(text) - 1)) AS i
            FROM documents WHERE length(text) >= 3
        )
    ),
    cnts AS (SELECT tg, COUNT(*) AS cnt FROM tg GROUP BY tg),
    per_doc AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               CAST(SUM(CASE WHEN c.cnt <= {RARE_MAX} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        FROM tg t JOIN cnts c USING (tg)
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_trigrams,
           CAST((1000000 * n_rare) // n_trigrams AS BIGINT) AS rare_ppm,
           CASE WHEN (1000000 * n_rare) // n_trigrams > {PPM_LOW} THEN 'low'
                WHEN (1000000 * n_rare) // n_trigrams > {PPM_HIGH} THEN 'medium'
                ELSE 'high' END AS quality_bucket
    FROM per_doc
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality bucketing without a model: a document
    whose char trigrams are corpus-rare is high-surprise (high
    perplexity under the corpus' own n-gram statistics). The score is
    the rare-trigram rate in ppm — deliberately integer-exact (counts
    and integer division only, no log/exp) so the cross-engine hash
    gate applies, unlike a float log-prob whose libm rounding differs
    between engines. Scale: the trigram explode is map-side; corpus
    counts are one map-side-combined shuffle over a vocabulary bounded
    by charset^3 (not corpus size); the rare set (cnt <= {RARE_MAX})
    is a small fraction of that bounded vocabulary and broadcasts, so
    the corpus-side frame never shuffles for the scoring join."""
    docs = load_table(spark, sf_dir, "documents")
    tg = docs.filter(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, char_length(text) - 2), i -> substring(text, i, 3))")
        ).alias("tg"),
    )
    rare = tg.groupBy("tg").count().filter(F.col("count") <= RARE_MAX).select("tg")
    # only RARE occurrences survive the semi join, so the per-doc
    # shuffle carries a small fraction of the corpus; the total
    # trigram count needs no second pass at all (= char_length - 2)
    rare_per_doc = (
        tg.join(F.broadcast(rare), "tg", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_rare"))
    )
    base = docs.filter(F.length("text") >= 3).select(
        "doc_id", (F.char_length("text") - 2).cast("long").alias("n_trigrams")
    )
    per_doc = base.join(rare_per_doc, "doc_id", "left").select(
        "doc_id", "n_trigrams", F.coalesce(F.col("n_rare"), F.lit(0)).alias("n_rare")
    )
    ppm = F.expr("(1000000 * n_rare) div n_trigrams")
    return per_doc.select(
        "doc_id",
        "n_trigrams",
        ppm.alias("rare_ppm"),
        F.when(ppm > PPM_LOW, "low")
        .when(ppm > PPM_HIGH, "medium")
        .otherwise("high")
        .alias("quality_bucket"),
    )


def _sem_purge_oracle_sql() -> str:
    return f"""
    WITH RECURSIVE {_sem_pairs_ctes()},
    cc_edges AS MATERIALIZED (
        SELECT vec_a AS src, vec_b AS dst FROM sem_pairs
        UNION ALL
        SELECT vec_b AS src, vec_a AS dst FROM sem_pairs
    ),
    reach(node, start) AS (
        SELECT src, src FROM cc_edges
        UNION
        SELECT e.dst, r.start FROM reach r JOIN cc_edges e ON e.src = r.node
    ),
    cc_labels AS (SELECT node, MIN(start) AS component FROM reach GROUP BY node),
    removed AS (SELECT node AS vec_id FROM cc_labels WHERE node <> component)
    SELECT e.label,
           CAST(COUNT(*) AS BIGINT) AS vecs_before,
           CAST(COUNT(r.vec_id) AS BIGINT) AS vecs_removed,
           CAST(COUNT(*) - COUNT(r.vec_id) AS BIGINT) AS vecs_after
    FROM embeddings e
    LEFT JOIN removed r ON e.vec_id = r.vec_id
    GROUP BY e.label
    """


@register("dedup_semantic_purge", oracle=_sem_purge_oracle_sql())
def dedup_semantic_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The output-linear form of semantic dedup (the shape SemDeDup
    deployments actually emit): connected components over the
    within-cluster cosine pairs pick one keeper per duplicate clique
    (smallest vec_id), and the result is per-label keep/purge
    accounting — one row per label, never one per clique edge, so
    output size is O(corpus), not O(dup-multiplicity^2) (the x20
    replica-lake probe showed why that matters: exact-dup cliques make
    the pair frame quadratic). Composition: dedup_semantic_clusters
    pairs -> plans/iterative.connected_components (pointer-jumping,
    O(log diameter) rounds) -> left-join accounting, mirroring
    dedup_purge_report for the MinHash pipeline."""
    from .iterative import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup_semantic_clusters(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    removed = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("vec_id"), F.lit(1).alias("is_removed"))
    )
    # shuffle_hash on the removed side (the docs_curation_pipeline_e2e
    # precedent): SMJ sorted the CORPUS-scale embeddings side within
    # every partition; the build side is the non-canonical dup-vec id
    # set — 8-byte rows, partition-bounded. NOTE (r15 ADVICE): the
    # hint is honored unconditionally when buildable (no size
    # fallback, no AQE demotion) — safety rests on the id side staying
    # partition-bounded.
    return (
        emb.join(removed.hint("shuffle_hash"), "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count("*").alias("vecs_before"),
            F.count("is_removed").alias("vecs_removed"),
            (F.count("*") - F.count("is_removed")).alias("vecs_after"),
        )
    )


# --- incremental dedup: new batch vs corpus signature index -----------

NEW_BATCH_PCT = 90  # docs with hash-pct >= 90 play the "new batch"


def _incremental_oracle_sql() -> str:
    from .dedup import _SQL_DOC_PCT, JACCARD_THRESHOLD

    from ..operators import textops

    return f"""
    WITH shingles AS ({textops.sql_shingles('documents')}),
    split AS (SELECT doc_id, {_SQL_DOC_PCT} AS pct FROM documents),
    sigs AS (
        SELECT doc_id, {textops.sql_minhash_aggs()}
        FROM shingles GROUP BY doc_id
    ),
    bands AS ({textops.sql_band_selects('sigs')}),
    nb AS (SELECT b.* FROM bands b JOIN split USING (doc_id)
           WHERE pct >= {NEW_BATCH_PCT}),
    ib AS (SELECT b.* FROM bands b JOIN split USING (doc_id)
           WHERE pct < {NEW_BATCH_PCT}),
    candidates AS (
        SELECT DISTINCT n.doc_id AS new_doc_id, i.doc_id AS index_doc_id
        FROM nb n JOIN ib i ON n.band = i.band AND n.bucket = i.bucket
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    overlap AS (
        SELECT a.doc_id AS new_doc_id, b.doc_id AS index_doc_id,
               COUNT(*) AS n_common
        FROM shingles a
        JOIN split sa ON a.doc_id = sa.doc_id AND sa.pct >= {NEW_BATCH_PCT}
        JOIN shingles b ON a.shingle = b.shingle
        JOIN split sb ON b.doc_id = sb.doc_id AND sb.pct < {NEW_BATCH_PCT}
        GROUP BY 1, 2
    )
    SELECT c.new_doc_id, c.index_doc_id,
           o.n_common * 1.0 / (za.n_sh + zb.n_sh - o.n_common) AS jaccard
    FROM candidates c
    JOIN overlap o ON c.new_doc_id = o.new_doc_id
                  AND c.index_doc_id = o.index_doc_id
    JOIN sizes za ON c.new_doc_id = za.doc_id
    JOIN sizes zb ON c.index_doc_id = zb.doc_id
    WHERE o.n_common * 1.0 / (za.n_sh + zb.n_sh - o.n_common)
          >= {JACCARD_THRESHOLD}
    """


@register("dedup_incremental_minhash", oracle=_incremental_oracle_sql())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection: a newly ingested batch (the
    {100 - NEW_BATCH_PCT}% of docs with hash-pct >= {NEW_BATCH_PCT},
    standing in for today's crawl) is deduplicated against the
    EXISTING corpus through its MinHash band index — the standing
    shape of a daily 100 TB ingest, where re-running the full-corpus
    self-join per batch (dedup_minhash_lsh) would be quadratic in
    days. Scale: per-batch cost is O(batch x bands) for signatures
    plus a band-bucket join against the stored index (here derived
    from the lake so the DuckDB oracle can see it; a deployment reads
    the persisted signature table and appends the batch's signatures
    back to it after the run — the swap point is the `bands` frame).
    Verification joins only candidate docs' shingles, new-side vs
    index-side, so the corpus never self-joins. Emits
    (new_doc_id, index_doc_id, jaccard >= threshold)."""
    from ..operators import textops
    from .dedup import _doc_pct, _shingles_cached, JACCARD_THRESHOLD

    sh = _shingles_cached(spark, sf_dir)
    sigs = sh.groupBy("doc_id").agg(*textops.minhash_agg_cols())
    bands = (
        sigs.select("doc_id", F.explode(F.array(*textops.band_cols())).alias("bb"))
        .select(
            "doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
            (_doc_pct() >= NEW_BATCH_PCT).alias("is_new"),
        )
        .persist()  # lazy: both split sides share one signature pass
    )
    nb = bands.filter(F.col("is_new")).alias("n")
    ib = bands.filter(~F.col("is_new")).alias("i")
    candidates = (
        nb.join(
            ib,
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bucket") == F.col("i.bucket")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc_id"),
            F.col("i.doc_id").alias("index_doc_id"),
        )
        .distinct()
        .persist()  # feeds the semi-join reduction and the final join
    )
    # shuffle_hash on the verification joins — the minhash_lsh_pairs
    # rationale and fallback note apply verbatim (r15)
    cand_docs = (
        candidates.select(F.col("new_doc_id").alias("doc_id"))
        .union(candidates.select("index_doc_id"))
        .distinct()
        .hint("shuffle_hash")
    )
    cand_sh = sh.join(cand_docs, "doc_id", "left_semi").withColumn(
        "is_new", _doc_pct() >= NEW_BATCH_PCT
    )
    sizes = cand_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = cand_sh.filter(F.col("is_new")).alias("a")
    sb = cand_sh.filter(~F.col("is_new")).alias("b")
    overlap = (
        sa.join(sb.hint("shuffle_hash"), F.col("a.shingle") == F.col("b.shingle"))
        .groupBy(
            F.col("a.doc_id").alias("new_doc_id"),
            F.col("b.doc_id").alias("index_doc_id"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    verified = (
        overlap.join(za, F.col("new_doc_id") == F.col("za.doc_id"))
        .join(zb, F.col("index_doc_id") == F.col("zb.doc_id"))
        .select(
            "new_doc_id",
            "index_doc_id",
            (
                F.col("n_common")
                * F.lit(1.0)
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return candidates.join(
        verified.hint("shuffle_hash"), ["new_doc_id", "index_doc_id"]
    ).select("new_doc_id", "index_doc_id", "jaccard")


# --- incremental IVF: insert + search a new vector batch --------------

IVF_NEW_PCT = 90  # vectors with hash-pct >= 90 play the "new batch"
IVF_TOP_K = 5

# Persisted frames of the LAST sim_incremental_ivf_insert invocation,
# unpersisted on the next call (r8 ADVICE: gate sweeps accumulated
# cached partitions across repeated invocations).
_IVF_INSERT_PERSISTED: list[DataFrame] = []

_SQL_VEC_PCT = (
    "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


def _vec_pct() -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )


def _ivf_incremental_oracle_sql() -> str:
    from .similarity import _SQL_DEC, _SQL_EMB, _sql_dot

    sqd = (
        f"CAST(CAST(list_sum(list_transform(list_zip(q.emb, cv.cvec), "
        f"x -> CAST((x[1] - x[2]) * (x[1] - x[2]) AS {_SQL_DEC}))) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
    WITH emb AS ({_SQL_EMB}),
    split AS (SELECT vec_id, {_SQL_VEC_PCT} AS pct FROM embeddings),
    idx AS (SELECT e.* FROM emb e JOIN split USING (vec_id)
            WHERE pct < {IVF_NEW_PCT} AND e.norm > 0),
    newb AS (SELECT e.* FROM emb e JOIN split USING (vec_id)
             WHERE pct >= {IVF_NEW_PCT} AND e.norm > 0),
    comps AS (
        SELECT label, unnest(emb) AS val, generate_subscripts(emb, 1) AS dim
        FROM idx
    ),
    centroids AS (
        SELECT label, dim,
               CAST(CAST(SUM(CAST(val AS {_SQL_DEC})) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS cval
        FROM comps GROUP BY label, dim
    ),
    cent_vec AS (
        SELECT label, list(cval ORDER BY dim) AS cvec FROM centroids GROUP BY label
    ),
    assigned AS (
        SELECT vec_id AS new_vec_id, emb, norm, cell FROM (
            SELECT q.vec_id, q.emb, q.norm, cv.label AS cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id ORDER BY {sqd}, cv.label
                   ) AS rn
            FROM newb q CROSS JOIN cent_vec cv
        ) r WHERE rn = 1
    ),
    scored AS (
        SELECT a.new_vec_id, a.cell, i.vec_id AS neighbor_id,
               {_sql_dot('a.emb', 'i.emb')} / (a.norm * i.norm) AS cosine
        FROM assigned a JOIN idx i ON i.label = a.cell
    )
    SELECT new_vec_id, cell, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY new_vec_id ORDER BY cosine DESC, neighbor_id
        ) AS rnk
        FROM scored
    ) r WHERE rnk <= {IVF_TOP_K}
    """


@register("sim_incremental_ivf_insert", oracle=_ivf_incremental_oracle_sql())
def sim_incremental_ivf_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index maintenance: a new vector batch (hash-pct >=
    {IVF_NEW_PCT}) is INSERTED into the existing IVF index — each new
    vector is assigned to its nearest index centroid (exact decimal
    squared-L2, ties to the lowest cell, the faiss `add` step) and
    immediately searched against that cell's index vectors (top-
    {IVF_TOP_K} by exact cosine). Complements sim_ivf_probe1 (which
    cell-partitions BOTH sides by the stored label): here the new
    batch has no cell until assignment, which is the daily-ingest
    reality. Scale: centroids are k x dim — broadcast; assignment is
    map-side over the batch. The cell-local search is the
    dedup_semantic_clusters shape: one BLAS GEMM per (cell x batch)
    cogroup emits top-{IVF_TOP_K} CANDIDATES with a 1e-6 margin below
    the approximate k-th score (float64 GEMM error is ~1e-13
    relative, so no vector whose exact cosine belongs in the top k
    can fall outside the margin), and only the O(batch x k)
    survivors get the decimal-exact cosine + final ROW_NUMBER — the
    emitted values never see BLAS rounding. The r7 staged form ran
    the decimal fold on every (batch x cell-width) pair, which is
    quadratic in corpus size at fixed cell count (cells widen as the
    index grows) and measured 7x DuckDB at x20; this form is 100x
    cheaper per candidate-pair and the exact stage is output-sized.
    The centroid recompute here stands in for reading the stored
    centroid table an index service maintains.

    Cache lifecycle (r8 ADVICE): the persisted idx/assigned frames of
    the PREVIOUS invocation are unpersisted on entry, so a gate sweep
    that calls this entry repeatedly holds at most one invocation's
    cached partitions instead of accumulating forever; the current
    invocation's frames stay cached because the returned plan is
    lazy. The batch-sized broadcasts (assigned carries q_emb, cands
    is batch x ~k pairs) are size-gated on the embeddings table: past
    the cap the joins fall back to shuffle hash joins (AQE may still
    re-broadcast from runtime stats), because a 100 TB lake's daily
    batch does not fit a driver broadcast."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from .common import BROADCAST_FILE_CAP, table_bytes
    from .similarity import _centroid_vectors, _dot, _embeddings, _sqdist_dbl

    while _IVF_INSERT_PERSISTED:
        try:
            _IVF_INSERT_PERSISTED.pop().unpersist()
        except Exception:
            pass  # frame from a stopped session
    emb_bytes = table_bytes(sf_dir, "embeddings")
    batch_small = (
        emb_bytes is not None
        and emb_bytes * (100 - IVF_NEW_PCT) // 100 < BROADCAST_FILE_CAP
    )
    maybe_broadcast = F.broadcast if batch_small else (lambda df: df)

    emb = _embeddings(spark, sf_dir)
    # persisted lazily: both the candidate cogroup and the exact
    # rescoring join consume idx, and the decimal norm fold over the
    # full index is worth computing once (a stored index ships
    # precomputed norms; the cache stands in for that)
    # norm > 0 on BOTH sides and in the oracle (the dedup_semantic
    # guard, review r8): cosine is undefined for zero vectors —
    # without the filter a zero-norm NEW vector's all-NaN GEMM row
    # silently dropped every candidate Spark-side while the oracle
    # emitted NULL-cosine rows, and a zero-norm INDEX vector could
    # poison np.partition's kth with NaN
    idx = emb.filter((_vec_pct() < IVF_NEW_PCT) & (F.col("norm") > 0)).persist()
    newb = emb.filter((_vec_pct() >= IVF_NEW_PCT) & (F.col("norm") > 0))
    cent = _centroid_vectors(idx)
    w_assign = Window.partitionBy("vec_id").orderBy("sqd", "label")
    assigned = (
        newb.select("vec_id", "emb", "norm")
        .crossJoin(F.broadcast(cent))
        # ranked on the string->double hop, the DOUBLE the oracle's
        # cell-assignment window orders by (r10 ADVICE, the
        # sim_ivf_multiprobe fix applied here too)
        .withColumn("sqd", _sqdist_dbl(F.col("emb"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_id").alias("new_vec_id"),
            F.col("emb").alias("q_emb"),
            F.col("norm").alias("q_norm"),
            F.col("label").alias("cell"),
        )
        .persist()  # lazy: feeds the cogroup and the final select
    )
    _IVF_INSERT_PERSISTED.extend([idx, assigned])

    def cell_topk_candidates(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        """left = one cell's index vectors, right = the new vectors
        assigned to that cell. One GEMM scores the whole block; per
        new vector, everything within 1e-6 of the approximate k-th
        cosine survives (>= k rows iff ties/margin), so the exact
        stage downstream sees a superset of the true top-k and its
        ROW_NUMBER over the candidates equals the global one for
        every rank <= k."""
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"new_vec_id": [], "neighbor_id": []}).astype("int64")
        imat = np.array(left["emb"].tolist(), dtype=np.float64)
        qmat = np.array(right["q_emb"].tolist(), dtype=np.float64)
        inorm = left["norm"].to_numpy(dtype=np.float64)
        qnorm = right["q_norm"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = (qmat @ imat.T) / np.outer(qnorm, inorm)
        iids = left["vec_id"].to_numpy()
        qids = right["new_vec_id"].to_numpy()
        out_q, out_i = [], []
        k = IVF_TOP_K
        for r in range(sims.shape[0]):
            row = sims[r]
            if row.shape[0] > k:
                kth = np.partition(row, -k)[-k]
                keep = np.where(row >= kth - 1e-6)[0]
            else:
                keep = np.arange(row.shape[0])
            out_q.append(np.full(keep.shape[0], qids[r], dtype=np.int64))
            out_i.append(iids[keep].astype(np.int64))
        return pd.DataFrame(
            {"new_vec_id": np.concatenate(out_q), "neighbor_id": np.concatenate(out_i)}
        )

    cands = (
        idx.select("label", "vec_id", "emb", "norm")
        .groupBy("label")
        .cogroup(assigned.groupBy("cell"))
        .applyInPandas(cell_topk_candidates, schema="new_vec_id long, neighbor_id long")
    )
    # exact rescoring: candidates are output-sized (batch x ~k), so
    # both joins broadcast the small side and the decimal fold runs
    # only on survivors
    scored = (
        idx.join(maybe_broadcast(cands), idx["vec_id"] == cands["neighbor_id"])
        .join(
            maybe_broadcast(assigned.select("new_vec_id", "q_emb", "q_norm", "cell")),
            "new_vec_id",
        )
        .select(
            "new_vec_id",
            "cell",
            "neighbor_id",
            (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm"))).alias(
                "cosine"
            ),
        )
    )
    w_topk = Window.partitionBy("new_vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_topk).cast("long"))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("new_vec_id", "cell", "neighbor_id", "cosine", "rnk")
    )


# --- streaming small-file compaction ----------------------------------

FRAG_FILES = 64  # simulated micro-batch fragmentation of the lake
TARGET_FILE_BYTES = 8 * 1024 * 1024  # compaction target (local-scale)

_COMPACT_ROOT = f"/tmp/noaa_spark_compacted_{os.getpid()}"
_COMPACT_CACHE: dict[str, str] = {}


def _table_fingerprint(sf_dir: str, name: str) -> str:
    """Content fingerprint of one source table (same contract as
    scale._bucket_tag): full path + file stats, so a regenerated lake
    can never serve a stale cached artifact (compacted copy,
    centroids)."""
    n, total, mtime = 0, 0, 0.0
    for p in glob.glob(table_path(sf_dir, name).replace(f"{name}.parquet", f"{name}*")):
        paths = (
            [
                q
                for q in glob.glob(os.path.join(p, "**", "*"), recursive=True)
                if os.path.isfile(q)
            ]
            if os.path.isdir(p)
            else [p]
        )
        for q in paths:
            st = os.stat(q)
            n += 1
            total += st.st_size
            mtime = max(mtime, st.st_mtime)
    return hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|{n}|{total}|{mtime}".encode()
    ).hexdigest()[:10]


def _parquet_files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "*.parquet"))


def _cleanup_compact_root() -> None:
    shutil.rmtree(_COMPACT_ROOT, ignore_errors=True)


# mirror dedup._cleanup_shingle_dirs: the pid-keyed root would
# otherwise leak ~2x the events table + checkpoint files per process
atexit.register(_cleanup_compact_root)


def run_compaction(spark: SparkSession, frag: str, comp: str, ckpt: str) -> None:
    """One availableNow compaction pass over the fragmented dir:
    incremental file-source stream + foreachBatch writer. The
    checkpoint makes this the standing maintenance job shape — a
    later pass with new micro-batch files compacts ONLY the new
    files, which is what keeps the job O(new data) on a 100 TB/day
    ingest lake (covered by test_compaction_processes_only_new_files)."""
    frag_bytes = sum(os.path.getsize(f) for f in _parquet_files(frag))
    n_out = max(1, math.ceil(frag_bytes / TARGET_FILE_BYTES))
    schema = spark.read.parquet(frag).schema

    def _write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.coalesce(n_out).write.mode("append").parquet(comp)

    q = (
        spark.readStream.schema(schema)
        .parquet(frag)
        .writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_events(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Fragment the events table into a simulated micro-batch lake,
    then compact it with one availableNow streaming pass. Returns
    (fragmented_dir, compacted_dir); both are cached per source
    fingerprint for re-entrancy."""
    fp = _table_fingerprint(sf_dir, "events")
    if fp in _COMPACT_CACHE:
        root = _COMPACT_CACHE[fp]
        return os.path.join(root, "fragmented"), os.path.join(root, "compacted")
    root = os.path.join(_COMPACT_ROOT, fp)
    frag = os.path.join(root, "fragmented")
    comp = os.path.join(root, "compacted")
    ckpt = os.path.join(root, "ckpt")
    # simulate a streaming sink that left FRAG_FILES tiny files
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(FRAG_FILES).write.mode("overwrite").parquet(frag)
    run_compaction(spark, frag, comp, ckpt)
    _COMPACT_CACHE[fp] = root
    return frag, comp


@register(
    "stream_compaction_report",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_compaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as a Structured Streaming maintenance
    job: a fragmented micro-batch lake (64 tiny files, the classic
    streaming-sink pathology) is rewritten into target-size files by
    an availableNow foreachBatch pass, and the gated output is the
    per-type count + scaled-exact value sum read FROM THE COMPACTED
    COPY — equal to the source aggregate iff compaction lost or
    duplicated nothing. File-count reduction is asserted in pytest
    (file counts aren't SQL-oracle-able). Scale: the stream source
    checkpoints consumed files, so the standing job is O(new files)
    per trigger; the coalesce width derives from observed bytes /
    target file size, not a constant.

    Relationship to ``weather.streaming_ingest.compact_partition``:
    that one is the batch per-partition rewrite (atomic dir swap,
    scheduler-driven); this is the checkpointed STREAMING variant
    that never re-reads already-compacted input — the pairing a lake
    runs as close-partition rewrite + continuous small-file sweep."""
    _, comp = compact_events(spark, sf_dir)
    return (
        spark.read.parquet(comp)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.floor(F.col("value") * 1000000).cast("long")).cast("double") / 1000000.0)
            .alias("sum_value"),
        )
    )
