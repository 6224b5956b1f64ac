"""Round-11 candidates: all three now PROMOTED.

``sim_ivf_pq_adc_search`` promoted in round 11; the other two
promoted in round 12 per the GATE_LOG rotation plan (first driver
evidence rides the r12 gate window). Their registration took the
registry to 149, triggering the r10 cap policy: the q9/q21
``*_bucketed`` twins — holding fresh r11 driver rows — folded into
their routed defaults (plans/scale.py FOLDED), bringing the registry
back to 147. The STAGED dict below is now empty but the ``stage``
machinery stays for future candidate rounds, and
tests/test_staging_r11.py keeps running the staging-protocol extras
(fuzz, restriction-consistency, the KMV eager-fill laziness
exemption) against the promoted entries.

- ``sim_ivf_pq_adc_search`` — the production IVF+PQ combined search
  (faiss IndexIVFPQ): probe the nprobe nearest cells, ADC-score only
  within them. Composes the separately-proven halves
  (sim_ivf_multiprobe x sim_pq_adc_topk) into the shape a
  billion-vector deployment actually runs.
- ``events_kmv_theta_sketch_overlap`` — KMV/theta-sketch set
  operations (union AND intersection estimates) across audience
  segments: the DataSketches-style answer to audience overlap that
  HLL cannot give, with the sketch fully SQL-expressible so the
  cross-engine hash gate checks the actual estimates.
- ``sim_ivf_pq_residual_search`` — RESIDUAL-encoded IVF+PQ (the
  faithful faiss IndexIVFPQ): vectors quantize as x - centroid and
  each query builds a per-probed-cell ADC table from its own
  residual — the encoding that makes real IVFPQ indexes quantize
  well, completing sim_ivf_pq_adc_search to the production
  algorithm.

Reference anchors (spec, not code): extend SURVEY.md's similarity
lifecycle and sketch families beyond the reference's own surface,
like the round-5-10 additions they follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import Query, register
from .graph_eval import _swap_persisted
from .similarity import (
    DIM,
    NPROBE,
    N_QUERIES,
    PQ_SUBDIM,
    TOP_K,
    _DEC,
    _SQL_CENTROIDS,
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


def _reuse_or_swap(slot: list[DataFrame], frame: DataFrame) -> DataFrame:
    """``_swap_persisted`` with SAME-PLAN REUSE (r13): a repeat
    invocation on the same lake rebuilds a byte-identical logical
    plan, and swapping would drop the materialized cache only to
    rebuild it from scratch on the next action — for slots that hold
    a built search INDEX (subvectors, codewords, corpus codes) the
    production contract is faiss's add-once/search-many, so the warm
    frame is returned instead. A different lake reaches a different
    leaf relation (tables._TABLE_CACHE keys relations by content
    fingerprint), sameResult is false, and the swap path keeps the
    bounded one-invocation-per-slot cache contract. A frame whose
    owning session was stopped (test fixtures) fails the comparison
    and falls through to the swap."""
    if slot:
        prev = slot[0]
        try:
            same = prev._jdf.queryExecution().analyzed().sameResult(
                frame._jdf.queryExecution().analyzed()
            )
        except Exception:  # noqa: BLE001 - stopped-session py4j errors
            same = False
        if same:
            return prev
    return _swap_persisted(slot, frame)


def reset_search_index_slots() -> None:
    """Drop every IVFPQ index slot (adc + residual), forcing the next
    invocation to pay the full index BUILD (codeword training + corpus
    code assignment). Benchmark hook: tools/bench_scale.py calls this
    to record the cold build-inclusive wall beside each repeated-run
    point, so the reuse lifecycle can never hide the build cost from
    the scale curve (r13 VERDICT: "the cold number must keep
    travelling with the curve")."""
    for slot in (
        _ADC_SUB_PERSISTED,
        _ADC_CODEWORDS_PERSISTED,
        _ADC_CODES_PERSISTED,
        _RESID_CVECS_PERSISTED,
        _RESID_RSUB_PERSISTED,
        _RESID_CODEWORDS_PERSISTED,
        _RESID_CODES_PERSISTED,
    ):
        for frame in slot:
            try:
                frame.unpersist()
            except Exception:  # noqa: BLE001 - stopped-session py4j errors
                pass
        slot.clear()


# --- sim_ivf_pq_adc_search ----------------------------------------------

# Persisted frames of the LAST invocation (graph_eval lifecycle): the
# subvector explode feeds three subtrees (code assignment, the
# codeword training inside it, the query ADC tables) and the codeword
# table two — without the persists each consumer re-runs the corpus
# pass (the r12 residual-search finding; same ~25%-of-wall class).
# The entry threads the persisted codewords frame EXPLICITLY into its
# own query-ADC join (r12 ADVICE: don't lean on cache matching where
# a variable will do); the one remaining implicit reader is the
# identical _pq_codewords(sub) plan rebuilt INSIDE _pq_best_codes
# (whose signature belongs to plans/similarity.py and is shared by
# three registered entries there), which hits the cache through
# CacheManager's SEMANTIC plan matching — a behavior
# tests/test_staging_r11.py::test_adc_codeword_cache_actually_hits
# pins with an InMemoryTableScan count, so a canonicalization miss
# can't silently turn the persist into dead weight.
_ADC_SUB_PERSISTED: list[DataFrame] = []
_ADC_CODEWORDS_PERSISTED: list[DataFrame] = []
# r13: the corpus code-assignment frame (the built PQ INDEX — one
# row per (vector, subspace) with its argmin codeword) gets its own
# slot. The x500 profile pinned the code assignment as THE wall of
# the whole entry (the scored corpus x codes-per-subspace decimal
# folds + the argmin window): ~27 s of the 27.3 s x500 run, paid on
# EVERY execution while the search itself (broadcast probes + ADC
# lookups + top-k) is seconds. In production IVFPQ (faiss: add()
# vs search()) the index is built once per ingest batch and amortized
# across queries — persisting codes makes the entry's repeated-run
# cost match that contract, exactly like the residual search's three
# r12 slots.
_ADC_CODES_PERSISTED: list[DataFrame] = []


@register(
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
    the compressed domain.

    Routing (r15, the r14 VERDICT task-2 close): when a DECLARED
    materialized index matches this lake's content+construction
    fingerprint (plans/staging_r14.pq_index_available — the
    bucketed_lake_available ladder), the entry serves the SAME rows
    from the published parquet layout instead of building the index
    in-session: probed-cell restriction becomes storage-level dynamic
    partition pruning on the inverted-list files, and a cold session
    pays search-only cost (GATE_LOG r14 index-as-data numbers:
    ~27 s build vs ~0.9 s prebuilt search at x500). Output is
    bit-identical (fuzz-proven through the parquet round-trip), so
    the oracle covers both legs; SPARK_GRAFT_PQ_INDEX=0/1 pins the
    leg deterministically for gates and benches."""
    from .staging_r14 import pq_index_available, sim_ivf_pq_adc_prebuilt

    if pq_index_available(spark, sf_dir):
        return sim_ivf_pq_adc_prebuilt(spark, sf_dir)
    emb = _embeddings(spark, sf_dir)
    sub = _reuse_or_swap(_ADC_SUB_PERSISTED, _pq_subvectors(emb))
    codewords = _reuse_or_swap(_ADC_CODEWORDS_PERSISTED, _pq_codewords(sub))
    codes = _reuse_or_swap(
        _ADC_CODES_PERSISTED,
        _pq_best_codes(sub).select("vec_id", "label", "s", "code"),
    )
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
        .join(F.broadcast(codewords), "s")
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


# --- events_kmv_theta_sketch_overlap -------------------------------------

KMV_K = 32  # sketch size (k smallest hashes retained per segment)
KMV_CUT = 150.0  # segment = users with a type-s event of value > CUT
# 60-bit hash domain: first 15 hex digits of md5. 2^60 is a power of
# two, so its DOUBLE literal is exact and the estimate arithmetic
# (small-int * 2^60 / theta) is a single IEEE division on both
# engines — bit-identical.
KMV_CAP = 1 << 60

# Persisted sketch of the LAST invocation (graph_eval lifecycle)
_KMV_PERSISTED: list[DataFrame] = []

_SQL_KMV_H = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)


@register(
    "events_kmv_theta_sketch_overlap",
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT event_type, {_SQL_KMV_H} AS h
        FROM events WHERE value > {KMV_CUT}
    ),
    sk AS (
        SELECT event_type, h, ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY h
        ) AS rn
        FROM hashes
        QUALIFY rn <= {KMV_K}
    ),
    stats AS (
        SELECT event_type,
               CASE WHEN COUNT(*) = {KMV_K}
                    THEN MAX(CASE WHEN rn = {KMV_K} THEN h END)
                    ELSE {KMV_CAP} END AS theta,
               COUNT(*) AS n_sk
        FROM sk GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               LEAST(a.theta, b.theta) AS theta,
               a.theta AS theta_a, b.theta AS theta_b,
               a.n_sk AS n_a, b.n_sk AS n_b
        FROM stats a JOIN stats b ON a.event_type < b.event_type
    ),
    ua AS (
        SELECT p.type_a, p.type_b, s.h
        FROM pairs p JOIN sk s ON s.event_type = p.type_a AND s.h < p.theta
    ),
    ub AS (
        SELECT p.type_a, p.type_b, s.h
        FROM pairs p JOIN sk s ON s.event_type = p.type_b AND s.h < p.theta
    ),
    uni AS (
        SELECT type_a, type_b, COUNT(*) AS n_union FROM (
            SELECT DISTINCT type_a, type_b, h FROM (
                SELECT * FROM ua UNION ALL SELECT * FROM ub
            )
        ) GROUP BY type_a, type_b
    ),
    inter AS (
        SELECT ua.type_a, ua.type_b, COUNT(*) AS n_inter
        FROM ua JOIN ub ON ua.type_a = ub.type_a
                       AND ua.type_b = ub.type_b AND ua.h = ub.h
        GROUP BY ua.type_a, ua.type_b
    )
    SELECT p.type_a, p.type_b,
           CAST(CASE WHEN p.n_a = {KMV_K} THEN {KMV_K - 1} ELSE p.n_a END AS DOUBLE)
               * {KMV_CAP}.0 / CAST(p.theta_a AS DOUBLE) AS est_a,
           CAST(CASE WHEN p.n_b = {KMV_K} THEN {KMV_K - 1} ELSE p.n_b END AS DOUBLE)
               * {KMV_CAP}.0 / CAST(p.theta_b AS DOUBLE) AS est_b,
           CAST(u.n_union AS DOUBLE) * {KMV_CAP}.0 / CAST(p.theta AS DOUBLE)
               AS est_union,
           CAST(COALESCE(i.n_inter, 0) AS DOUBLE) * {KMV_CAP}.0
               / CAST(p.theta AS DOUBLE) AS est_intersect
    FROM pairs p
    JOIN uni u ON u.type_a = p.type_a AND u.type_b = p.type_b
    LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
    """,
)
def events_kmv_theta_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch SET OPERATIONS across audience segments: per
    event type, the segment "users with a value > {KMV_CUT} event of
    that type" is sketched as its {KMV_K} smallest 60-bit user hashes
    (a bottom-k / KMV sketch), and every segment pair reports
    estimated cardinalities for each side, the union, and the
    intersection — the audience-overlap question (DataSketches-style
    theta sketches) that the registry's other sketches (HLL distinct,
    CMS heavy hitters, GK percentiles) cannot answer, because HLL
    unions but never intersects.

    Estimator: theta_s = the k-th smallest hash (or the 2^60 domain
    cap when the segment has fewer than k members, making the sketch
    exact); est = |{{h < theta}}| * 2^60 / theta. Pair operations use
    theta = min(theta_a, theta_b); hashes below theta from both
    sketches give union (distinct) and intersection (match) samples.
    The same arithmetic runs on both engines over md5-derived hashes,
    so — unlike the HLL entry, whose estimate is algorithm-opaque —
    the actual ESTIMATES hash-match the oracle.

    Scale: ONE corpus-side exchange — the (event_type, h) distinct
    with map-side partial dedup — then a WindowGroupLimit keeps k
    rows per segment; everything after operates on k x segments rows
    (kilobytes at any corpus size: the sketch property) via broadcast
    joins. At 100 TB the sketches are also mergeable across
    ingest batches (bottom-k of a union = bottom-k of the per-batch
    bottom-k's), the same associativity contract the scaled-long
    aggregates rely on."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > KMV_CUT)
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    )
    hashes = ev.select("event_type", h).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    # The sketch IS the stored artifact (k x segments rows), and the
    # pair assembly below references it from five subtrees (stats on
    # both pair sides, the union/intersection samples) — without the
    # persist the corpus-side distinct re-runs once per reference.
    # Unpersist-on-reentry (the graph_eval lifecycle), then an EAGER
    # count(): this is the one place the registry's lazy-persist rule
    # inverts, because five stages of ONE job hit the cold cache
    # together and serialize on the block locks — measured at x200:
    # no persist 6.4 s, lazy persist 3.45 s, eager fill 1.34 s. The
    # count is a k x segments job (sketch-sized, not corpus-sized: it
    # reads the same exchange the cache fill needs anyway).
    # r10 ADVICE: the construction-time job is the documented
    # exemption in tests/test_staging_r11.py::CONSTRUCTION_LAZY_EXEMPT
    # — the record travelled with the entry through its r12 promotion
    # (the test now exercises the registered entry), and any future
    # laziness meta-test must carry the same exemption.
    sk = _swap_persisted(
        _KMV_PERSISTED,
        hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= KMV_K),
    )
    sk.count()
    stats = sk.groupBy("event_type").agg(
        F.when(
            F.count("*") == KMV_K,
            F.max(F.when(F.col("rn") == KMV_K, F.col("h"))),
        )
        .otherwise(F.lit(KMV_CAP))
        .alias("theta"),
        F.count("*").alias("n_sk"),
    )
    a = stats.select(
        F.col("event_type").alias("type_a"),
        F.col("theta").alias("theta_a"),
        F.col("n_sk").alias("n_a"),
    )
    b = stats.select(
        F.col("event_type").alias("type_b"),
        F.col("theta").alias("theta_b"),
        F.col("n_sk").alias("n_b"),
    )
    pairs = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .withColumn("theta", F.least("theta_a", "theta_b"))
    )
    ska = sk.select(F.col("event_type").alias("type_a"), "h")
    skb = sk.select(F.col("event_type").alias("type_b"), F.col("h").alias("hb"))
    ua = (
        pairs.select("type_a", "type_b", "theta")
        .join(F.broadcast(ska), "type_a")
        .filter(F.col("h") < F.col("theta"))
        .select("type_a", "type_b", "h")
    )
    ub = (
        pairs.select("type_a", "type_b", "theta")
        .join(F.broadcast(skb), "type_b")
        .filter(F.col("hb") < F.col("theta"))
        .select("type_a", "type_b", F.col("hb").alias("h"))
    )
    uni = (
        ua.unionByName(ub)
        .distinct()
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_union"))
    )
    # broadcast (r15): ub is a sketch-sample frame (k x pairs rows,
    # kilobytes at any corpus size — the docstring's own bound); this
    # was the one post-sketch join still planning as SortMergeJoin
    inter = (
        ua.join(F.broadcast(ub.withColumnRenamed("h", "hb")), ["type_a", "type_b"])
        .filter(F.col("h") == F.col("hb"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_inter"))
    )
    cap_d = F.lit(float(KMV_CAP))

    def est(cnt, theta):
        return cnt.cast("double") * cap_d / theta.cast("double")

    return (
        pairs.join(F.broadcast(uni), ["type_a", "type_b"])
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            est(
                F.when(F.col("n_a") == KMV_K, F.lit(KMV_K - 1)).otherwise(
                    F.col("n_a")
                ),
                F.col("theta_a"),
            ).alias("est_a"),
            est(
                F.when(F.col("n_b") == KMV_K, F.lit(KMV_K - 1)).otherwise(
                    F.col("n_b")
                ),
                F.col("theta_b"),
            ).alias("est_b"),
            est(F.col("n_union"), F.col("theta")).alias("est_union"),
            est(F.coalesce(F.col("n_inter"), F.lit(0)), F.col("theta")).alias(
                "est_intersect"
            ),
        )
    )


# --- sim_ivf_pq_residual_search ------------------------------------------

# residual codebook size: codewords are keyed by vec_id % RESID_CODES
# (the registry's deterministic stand-in for a k-means assignment —
# the BUILD_MOD / label idiom), so training stays closed-form and the
# oracle expressible. Residual codes must NOT key on the IVF cell:
# within one cell the residual mean is ~0, which would collapse the
# codebook to near-zero words.
RESID_CODES = 4

# Persisted frames of the LAST invocation (graph_eval lifecycle, one
# slot per frame). Why three: the entry's tiny broadcast frames
# (centroids, residual codewords) and the corpus-code input (rsub)
# are each CONSUMED FROM MULTIPLE SUBTREES of one plan, and every
# BroadcastExchange re-runs its subtree as its own job — without the
# persists one search call pays the corpus scan+explode ~4x (r12
# profile at x200: cvecs built 3x, the 25.6M-row codebook agg 2x,
# the rsub explode 2x — 10.5 s wall, 2.11x DuckDB, vs 1.71x at x100
# because DuckDB's materialized CTEs pay each subtree ONCE). Lazy
# persists (no count — the construction-laziness test still holds);
# the first consumer fills each cache.
_RESID_CVECS_PERSISTED: list[DataFrame] = []
_RESID_RSUB_PERSISTED: list[DataFrame] = []
_RESID_CODEWORDS_PERSISTED: list[DataFrame] = []
_RESID_CODES_PERSISTED: list[DataFrame] = []

_SQL_RESID_SUBS = f"""
    resid AS (
        SELECT e.vec_id, e.label, e.vec_id % {RESID_CODES} AS ckey,
               list_transform(list_zip(e.emb, v.cvec), x -> x[1] - x[2]) AS remb
        FROM emb e JOIN cvecs v ON v.label = e.label
    ),
    rsub AS (
        SELECT vec_id, label, ckey, s,
               CASE s WHEN 0 THEN remb[1:{PQ_SUBDIM}]
                      ELSE remb[{PQ_SUBDIM + 1}:{DIM}] END AS svec
        FROM resid, (SELECT 0 AS s UNION ALL SELECT 1) subs
    ),
    rcomps AS (
        SELECT s, ckey, unnest(svec) AS val,
               generate_subscripts(svec, 1) AS dim
        FROM rsub
    ),
    rcodebook AS (
        SELECT s, ckey AS code, dim,
               CAST(CAST(SUM(CAST(val AS {_SQL_DEC})) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS cval
        FROM rcomps GROUP BY s, ckey, dim
    ),
    rcodewords AS (
        SELECT s, code, list(cval ORDER BY dim) AS cw
        FROM rcodebook GROUP BY s, code
    ),
    rdists AS (
        SELECT v.vec_id, v.label, v.s, c.code,
               {_sql_sqdist('v.svec', 'c.cw')} AS d
        FROM rsub v JOIN rcodewords c ON c.s = v.s
    ),
    rbest AS (
        SELECT vec_id, label, s, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM rdists
    )"""


@register(
    "sim_ivf_pq_residual_search",
    oracle=f"""
    WITH emb AS ({_SQL_EMB}),
    {_SQL_CENTROIDS},
    cvecs AS (
        SELECT label, list(cval ORDER BY dim) AS cvec FROM centroids GROUP BY label
    ),
    {_SQL_RESID_SUBS},
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
    qresid AS (
        SELECT p.query_id, p.cell,
               list_transform(list_zip(q.q_emb, v.cvec), x -> x[1] - x[2]) AS remb
        FROM probes p
        JOIN queries q ON q.query_id = p.query_id
        JOIN cvecs v ON v.label = p.cell
    ),
    qrsub AS (
        SELECT query_id, cell, s,
               CASE s WHEN 0 THEN remb[1:{PQ_SUBDIM}]
                      ELSE remb[{PQ_SUBDIM + 1}:{DIM}] END AS svec
        FROM qresid, (SELECT 0 AS s UNION ALL SELECT 1) subs
    ),
    qdist AS (
        SELECT v.query_id, v.cell, v.s, c.code,
               {_sql_sqdist('v.svec', 'c.cw')} AS qd
        FROM qrsub v JOIN rcodewords c ON c.s = v.s
    ),
    adc AS (
        SELECT q.query_id, cd.vec_id AS neighbor_id, SUM(q.qd) AS approx_d
        FROM rbest cd
        JOIN qdist q ON q.cell = cd.label
                    AND q.s = cd.s AND q.code = cd.code
        WHERE cd.rn = 1 AND cd.vec_id <> q.query_id
        GROUP BY q.query_id, cd.vec_id
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
def sim_ivf_pq_residual_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL-encoded IVF+PQ search — the faithful faiss IndexIVFPQ:
    vectors are PQ-encoded as the residual x - centroid(cell(x))
    rather than the raw vector, and each query builds a SEPARATE ADC
    lookup table per probed cell from ITS residual q - centroid(cell).
    Residual encoding is why real IVFPQ indexes quantize well: within
    a cell the residual distribution is centered, so a shared codebook
    spends its codewords on the local geometry instead of the global
    spread. Completes the staged sim_ivf_pq_adc_search (raw-vector
    ADC) to the production algorithm.

    Exactness: centroids, residual codebooks, code assignment, and
    ADC tables all reuse the decimal + VARCHAR-hop machinery; cell
    ranking orders on the string->double hop (the r10 ADVICE
    convention); residuals themselves are single IEEE double
    subtractions of decimal-derived values — bit-identical across
    engines. Ties break on code / cell / neighbor_id everywhere.

    Scale: same contract as the non-residual search — the centroid
    table, residual codebooks (RESID_CODES x {2} x subdim), probe
    lists, and the per-(query, cell) ADC tables (queries x nprobe x
    subspaces x codes rows — kilobytes) all BROADCAST onto the
    corpus-codes scan; per-(query, vector) sums combine map-side;
    per-query top-k is a WindowGroupLimit; the corpus never shuffles.
    The extra nprobe factor on the ADC tables is the documented
    faiss trade: residual tables cannot be shared across cells.

    Measured (r12, x200 = 400k vecs, same-session A/B): the lazy
    persists above are worth ~25% of the wall — 11.7 s/1.55x with
    them vs 14.7 s/2.06x without (paired against DuckDB 7.1-7.6 s on
    the same box state; an earlier 10.5 s/2.11x pre-persist pair sat
    on a DuckDB page-cache-cold 5.0 s denominator — the ratio, not
    the raw wall, is the comparable number across box drift). Curve:
    2.66x (x20) -> 1.71x (x100) -> 1.55x (x200).

    Routing (r15, the r14 VERDICT task-2 close): identical ladder to
    sim_ivf_pq_adc_search — a DECLARED materialized index (v2 layout:
    resid_codewords + resid_codes inverted lists) serves the same
    rows with file-level partition pruning and search-only cold cost;
    SPARK_GRAFT_PQ_INDEX pins the leg; outputs are bit-identical
    through the parquet round-trip (fuzz-proven), so the oracle
    covers both legs."""
    from .staging_r14 import pq_index_available, sim_ivf_pq_residual_prebuilt

    if pq_index_available(spark, sf_dir):
        return sim_ivf_pq_residual_prebuilt(spark, sf_dir)
    emb = _embeddings(spark, sf_dir)
    cvecs = _reuse_or_swap(_RESID_CVECS_PERSISTED, _centroid_vectors(emb))
    resid = emb.join(F.broadcast(cvecs), "label").select(
        "vec_id",
        "label",
        (F.col("vec_id") % RESID_CODES).alias("ckey"),
        F.zip_with("emb", "cvec", lambda x, c: x - c).alias("emb"),
    )
    rsub = _reuse_or_swap(
        _RESID_RSUB_PERSISTED,
        _pq_subvectors(resid).withColumn("ckey", F.col("vec_id") % RESID_CODES),
    )
    # closed-form residual codebook: per (s, ckey) subvector means
    rcomps = rsub.select("s", "ckey", F.posexplode("svec").alias("dim", "val"))
    rcodebook = rcomps.groupBy("s", F.col("ckey").alias("code"), "dim").agg(
        (
            F.sum(F.col("val").cast(_DEC)).cast("string").cast("double")
            / F.count("*")
        ).alias("cval")
    )
    rcodewords = _reuse_or_swap(
        _RESID_CODEWORDS_PERSISTED,
        rcodebook.groupBy("s", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                lambda st: st["cval"],
            ).alias("cw")
        ),
    )
    rdists = rsub.join(F.broadcast(rcodewords), "s").select(
        "vec_id",
        "label",
        "s",
        "code",
        _sqdist(F.col("svec"), F.col("cw")).alias("d"),
    )
    rw = Window.partitionBy("vec_id", "s").orderBy("d", "code")
    codes = _reuse_or_swap(
        _RESID_CODES_PERSISTED,
        rdists.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "s", "code"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
    )
    cellrank = q.crossJoin(F.broadcast(cvecs)).select(
        "query_id",
        F.col("label").alias("cell"),
        "q_emb",
        _sqdist_dbl(F.col("q_emb"), F.col("cvec")).alias("d2"),
    )
    cw = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (
        cellrank.withColumn("crnk", F.row_number().over(cw))
        .filter(F.col("crnk") <= NPROBE)
        .select("query_id", "cell", "q_emb")
    )
    qresid = probes.join(
        F.broadcast(cvecs.select(F.col("label").alias("cell"), "cvec")), "cell"
    ).select(
        F.col("query_id").alias("vec_id"),
        F.col("cell").alias("label"),  # rides through _pq_subvectors
        F.zip_with("q_emb", "cvec", lambda x, c: x - c).alias("emb"),
    )
    qrsub = _pq_subvectors(qresid).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        "s",
        "svec",
    )
    qdist = qrsub.join(F.broadcast(rcodewords), "s").select(
        "query_id",
        "cell",
        "s",
        "code",
        _sqdist(F.col("svec"), F.col("cw")).alias("qd"),
    )
    adc = (
        codes.join(
            F.broadcast(qdist),
            (codes.label == qdist.cell) & (codes.s == qdist.s) & (codes.code == qdist.code),
        )
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
