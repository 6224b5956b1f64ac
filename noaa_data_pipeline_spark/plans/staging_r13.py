"""Round-13 surface: one r13-REGISTERED consolidation entry plus the
remaining staged candidates.

Executed at r13 (r12 VERDICT task 3): ``emb_dim_reduction_eval`` is
REGISTERED here (decorator swap, the staging_r11 precedent), its two
parents retired — emb_matryoshka_truncate_eval FOLDED
(plans/graph_eval.py → plans/scale.py FOLDED) and the standalone
``emb_jl_projection_eval`` candidate deleted (its whole surface is
the consolidated entry's 'jl' axis; the JL helpers below are what
remains of it). The rest follow the r9-r12 staging protocol (DuckDB
oracle + driver-gate-equivalent pytest compare + differential fuzz +
laziness + plan-shape + bench_scale rows) before any registry
promotion:

- JL sign projection (Achlioptas 2003's database-friendly +/-1
  variant): the helpers project every embedding through a
  deterministic {+1,-1}^(r x d) matrix; the sign matrices nest
  (width r is a prefix of width r'), so ONE r_max-wide projection
  pass serves every width via slices, exactly like the matryoshka
  prefix trick. Consumed by ``emb_dim_reduction_eval``'s 'jl' axis.
- ``sample_weighted_priority`` — priority sampling / sequential
  Poisson sampling (Ohlsson 1998; Duffield-Lund-Thorup 2007): each
  doc draws a deterministic uniform from the portable md5 idiom,
  ranks by floor(u * SCALE / weight), and the k smallest per stratum
  are the sample — inclusion probability approximately proportional
  to weight, the estimator family curation pipelines use for
  weighted corpus subsetting (quality-weighted doc selection, PPS
  throughput probes) when full weighted reservoirs are overkill.
  Everything is 64-bit integer arithmetic end to end, so the gate
  compare is exact by construction — no decimal hops, no floats
  anywhere in the entry.
- ``sim_hard_negatives`` — hard-negative mining for contrastive
  training: per anchor, the top-k most-similar DIFFERENT-label
  vectors plus the anchor's best same-label cosine and the margin
  between them. The label-constrained retrieval shape the
  similarity family lacked (every existing entry ranks the whole
  corpus; a contrastive curator ranks within a predicate partition
  of it and thresholds on the positive-negative margin).
- ``emb_dim_reduction_eval`` — REGISTERED r13: both
  dimension-reduction axes (matryoshka raw prefix + JL sign
  projection) in ONE corpus pass, row-identical per axis to the two
  entries it replaced (pytest-pinned identity), freeing a registry
  slot under the cap while making the comparison cheaper than
  either parent ran alone.

Reference anchors (spec, not code): extend SURVEY.md's sampling/split
family (sample_stratified_hash, split_train_val_hash precedents) and
the embedding eval family (emb_matryoshka_truncate_eval precedent),
like the round-5-12 additions they follow.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import Query, register
from .graph_eval import _swap_persisted
from .similarity import DIM, _SQL_DEC, _SQL_EMB, _dot, _embeddings, _sql_dot

# --- staging registry (NOT the driver registry) -----------------------

STAGED: dict[str, Query] = {}


def stage(name: str, oracle: str | None = None, doc: str = ""):
    """Mirror of ``plans.register`` writing to the staging dict, so a
    round-13 promotion is a one-word decorator swap (the staging_r11/
    staging_r12 precedent)."""

    def deco(fn):
        STAGED[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


# --- emb_jl_projection_eval --------------------------------------------

JL_DIMS = (8, 16, 32)  # projected widths to evaluate (nested prefixes)
JL_R = max(JL_DIMS)  # one projection pass at the widest width
JL_QUERIES = 8  # vec_id < 8 are the query vectors (sim_* idiom)
JL_K = 5  # top-k overlap window (matryoshka idiom)


def _jl_sign(plane: int, dim: int) -> float:
    """One +/-1 sign-matrix entry, derived from the repo's portable
    md5 idiom (Python md5 == JVM md5 == DuckDB md5) so the Spark-side
    literals and the oracle's in-SQL derivation are the same matrix.
    The 'jl|' salt decorrelates it from the LSH hyperplane family,
    which hashes the un-salted 'plane|dim' string."""
    h = hashlib.md5(f"jl|{plane}|{dim}".encode()).hexdigest()[:8]
    return 1.0 if int(h, 16) % 2 == 0 else -1.0


def _jl_project() -> Column:
    """The full r_max-wide projection of the ``emb`` column: an array
    of {JL_R} exact decimal-fold dots against literal sign vectors.
    Inlined literals keep the pass entirely map-side (zip_with +
    aggregate per plane, like the LSH sign bits)."""
    return F.array(
        *[
            _dot(
                F.col("emb"),
                F.array(*[F.lit(_jl_sign(j, d + 1)) for d in range(DIM)]),
            )
            for j in range(JL_R)
        ]
    )


_SQL_JL_SIGNS = f"""
        SELECT p.range AS plane, d.range + 1 AS dim,
               CASE WHEN CAST(('0x' || substr(md5('jl|' || p.range || '|' || (d.range + 1)), 1, 8)) AS BIGINT) % 2 = 0
                    THEN 1.0 ELSE -1.0 END AS comp
        FROM range({JL_R}) p, range({DIM}) d
"""


def _sql_jl_cosine(r: int, q: str, c: str) -> str:
    qs, cs = f"{q}.pemb[1:{r}]", f"{c}.pemb[1:{r}]"
    return (
        f"{_sql_dot(qs, cs)} / NULLIF("
        f"sqrt({_sql_dot(qs, qs)}) * sqrt({_sql_dot(cs, cs)}), 0)"
    )


# RETIRED at r13 (the consolidation the r12 VERDICT task 3 ordered):
# the standalone emb_jl_projection_eval candidate's entire surface is
# the 'jl' axis of the registered emb_dim_reduction_eval below — same
# helpers (_jl_sign/_jl_project/_sql_jl_cosine/_SQL_JL_SIGNS), same
# constants, and the consolidated entry's own oracle re-derives the
# axis independently in SQL, so nothing lost its truth pin. Its r11
# scale record (x100 0.25x; x200: Spark 41.3 s while the DuckDB
# oracle OOMs on its ~800M-row unnest-join intermediate) stays in
# BENCH_SCALE/GATE_LOG under the old name.


# --- sample_weighted_priority --------------------------------------------

WSAMP_K = 16  # sample size per stratum
# priority = floor(h40 * SCALE / weight): h40 < 2^40 keeps the
# multiply under 2^63 (1.1e12 * 1e6 = 1.1e18 < 9.2e18), so the whole
# key is exact 64-bit integer arithmetic on both engines
WSAMP_SCALE = 1_000_000


def _wsamp_priority_sql(engine: str) -> str:
    """The rank key, spelled for each engine over the SAME integer
    ops: u = top 40 bits of the portable 60-bit md5 hash (salted
    'wsamp|' so it is independent of the split/stratify entries'
    un-salted doc_id hashes), weight = GREATEST(COALESCE(n_chars,1),1)
    (the null/zero-weight guard), priority = (u * SCALE) intdiv w.
    Smallest-priority-first IS priority sampling's order statistic
    (rank by u_i / w_i; Ohlsson's sequential Poisson form)."""
    if engine == "spark":
        h = (
            "shiftright(cast(conv(substr(md5(concat('wsamp|', "
            "cast(doc_id as string))), 1, 15), 16, 10) as bigint), 20)"
        )
        return f"({h} * {WSAMP_SCALE}) div greatest(coalesce(n_chars, 1), 1)"
    h = (
        "(CAST(('0x' || substr(md5('wsamp|' || CAST(doc_id AS VARCHAR)), 1, 15)) "
        "AS BIGINT) >> 20)"
    )
    return f"({h} * {WSAMP_SCALE}) // GREATEST(COALESCE(n_chars, 1), 1)"


@stage(
    "sample_weighted_priority",
    oracle=f"""
    WITH base AS (
        SELECT source, doc_id,
               GREATEST(COALESCE(n_chars, 1), 1) AS weight,
               {_wsamp_priority_sql('duckdb')} AS priority
        FROM documents
    ),
    stats AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS stratum_docs,
               CAST(SUM(weight) AS BIGINT) AS stratum_weight
        FROM base GROUP BY source
    ),
    ranked AS (
        SELECT source, doc_id, weight, priority,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY priority, doc_id
               ) AS sample_rank
        FROM base
    )
    SELECT r.source, CAST(r.sample_rank AS BIGINT) AS sample_rank,
           r.doc_id, r.weight, r.priority,
           s.stratum_docs, s.stratum_weight
    FROM ranked r JOIN stats s USING (source)
    WHERE r.sample_rank <= {WSAMP_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement, {WSAMP_K} docs per source
    stratum, inclusion probability approximately proportional to
    weight (= n_chars): priority sampling / sequential Poisson
    sampling (rank by u/w, keep the k smallest), with the uniform u
    drawn deterministically from the portable md5 idiom so the sample
    is reproducible and cross-engine exact. Output rows carry the
    stratum's total doc count and weight so a consumer can form the
    Horvitz-Thompson-style expansion weights without a second scan.

    Exactness: the entire entry is 64-bit integer arithmetic —
    h40 * {WSAMP_SCALE} stays under 2^63 and the integer division is
    identical on both engines for non-negative operands (weight >= 1
    by the GREATEST guard) — so the gate compare is exact by
    construction; ties (same priority) break on doc_id in both.

    Scale: the rank key is map-side (one md5 per row, no joins); the
    per-stratum top-k is a row_number window that Spark plans as
    WindowGroupLimit with a PARTIAL pass, so each map task forwards at
    most k rows per stratum into the one source-keyed exchange — the
    shuffle carries O(k x strata x tasks), not the corpus. The
    stratum stats aggregate is map-side combined to one row per
    source and broadcast back onto the k-row sample. At 100 TB this
    is the weighted-subset shape that avoids both a global sort and a
    weighted reservoir's sequential state.

    Measured (BENCH_SCALE, r11 third session): the Spark wall is the
    job floor, FLAT at 1.18 s from x100 (500k docs) to x200 (1M) and
    1.89 s at x500 (2.5M), so the single-box ratio vs DuckDB's
    0.13-0.29 s reads 9.1x/6.8x/6.5x — recorded honestly: the op is
    two sub-second scans of three columns, too cheap for the fixed
    per-job cost to amortize on one box (the bloom-prune precedent).
    The plan is shaped for the 100 TB contract, not the toy ratio:
    the alternative single-exchange plan (stats as unbounded window
    aggs sharing the row_number partition) would kill the partial
    WindowGroupLimit and shuffle the full corpus, which is the wrong
    trade everywhere it matters.

    Deep tier (r12, tools/bench_docs_deep.py — documents-only lakes,
    closing the r11 VERDICT's promotion question with numbers): once
    the corpus outgrows the floor the ratio CONVERGES exactly as the
    plan predicts — docsx1000 (5M docs) 6.7x (Spark 2.94 s still
    floor-bound vs DuckDB 0.44 s), docsx5000 (25M) **1.46x**
    (2.77 s vs 1.90 s — Spark flat, 32-way scan engaged), docsx10000
    (50M) **1.15x** (5.42 s vs 4.71 s, both compute-bound). Under
    the 2x bar at every point where the input exceeds the job floor;
    promotion-eligible on evidence, queued behind the r13
    consolidation order (GATE_LOG)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        F.greatest(F.coalesce(F.col("n_chars"), F.lit(1)), F.lit(1))
        .cast("long")
        .alias("weight"),
        F.expr(_wsamp_priority_sql("spark")).alias("priority"),
    )
    stats = base.groupBy("source").agg(
        F.count("*").alias("stratum_docs"),
        F.sum("weight").alias("stratum_weight"),
    )
    win = Window.partitionBy("source").orderBy(
        F.asc("priority"), F.asc("doc_id")
    )
    return (
        base.withColumn("sample_rank", F.row_number().over(win).cast("long"))
        .filter(F.col("sample_rank") <= WSAMP_K)
        .join(F.broadcast(stats), "source")
        .select(
            "source",
            "sample_rank",
            "doc_id",
            "weight",
            "priority",
            "stratum_docs",
            "stratum_weight",
        )
    )


# --- sim_hard_negatives --------------------------------------------------

HN_QUERIES = 8  # vec_id < 8 are the anchor vectors (sim_* idiom)
HN_K = 5  # hard negatives kept per anchor

# Persisted scored-pair frame of the LAST invocation (the negatives
# ranking and the positive-ceiling aggregate both consume it).
_HN_PAIRS_PERSISTED: list[DataFrame] = []


@stage(
    "sim_hard_negatives",
    oracle=f"""
    WITH emb AS ({_SQL_EMB}),
    pairs AS (
        SELECT q.vec_id AS query_id, q.label AS q_label,
               c.vec_id AS neighbor_id, c.label AS label,
               {_sql_dot('q.emb', 'c.emb')} / NULLIF(q.norm * c.norm, 0) AS cosine
        FROM emb q JOIN emb c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {HN_QUERIES}
    ),
    neg AS (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC NULLS LAST, neighbor_id
               ) AS neg_rank
        FROM pairs WHERE label <> q_label
    ),
    pos AS (
        SELECT query_id, MAX(cosine) AS pos_best_cosine
        FROM pairs WHERE label = q_label GROUP BY query_id
    )
    SELECT n.query_id, CAST(n.neg_rank AS BIGINT) AS neg_rank,
           n.neighbor_id, n.cosine AS neg_cosine,
           p.pos_best_cosine,
           p.pos_best_cosine - n.cosine AS margin
    FROM neg n LEFT JOIN pos p USING (query_id)
    WHERE n.neg_rank <= {HN_K}
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor
    vector, the top-{HN_K} most-similar vectors of a DIFFERENT label
    (the negatives that actually move an InfoNCE/triplet loss),
    alongside the anchor's positive ceiling (best same-label cosine)
    and the margin between them — the number a curriculum scheduler
    thresholds on (margin <= 0 means a negative currently outranks
    every positive: the anchor is in the loss's active set). The
    label-constrained retrieval shape the similarity family lacked:
    brute/ANN/IVF entries rank over the whole corpus; this ranks
    within a predicate partition of it.

    Exactness: every cosine goes through the decimal-dot VARCHAR hop
    (bit-identical doubles both engines), MAX and subtraction are
    single IEEE ops on those bits, rankings tie-break on neighbor_id,
    and zero-norm vectors score NULL (NULLIF) and sort last; anchors
    with no same-label peer carry NULL ceiling/margin on both sides.

    Scale: ONE anchor-broadcast pass scores the corpus (persisted —
    both the negatives window and the positives aggregate consume
    it); per-anchor top-k is a WindowGroupLimit; the positives
    ceiling is a {HN_QUERIES}-row aggregate broadcast back onto the
    k-row output. The corpus is scanned once and never shuffled.

    Measured (BENCH_SCALE, r11 third session): x5 1.95x (job floor),
    x20 0.81x, x100 0.73x (Spark 3.4 s vs DuckDB 4.7 s at 200k
    vectors), x200 1.54x (Spark 8.2 s vs 5.3 s at 400k) — recorded
    honestly: Spark's wall grows ~linearly with the pair volume
    (compute-bound on the decimal folds) while DuckDB's stays
    near-flat 4.7 -> 5.3 s across the doubling (the same fixed
    hash/threading regime the PCA covariance rows documented), so
    the single-box ratio crosses 1 between x100 and x200 while
    staying under the 2x bar; at cluster scale the scoring pass is
    embarrassingly parallel. cluster2x16 within the serialization-tax
    band at a sub-second wall (BENCH_CLUSTER)."""
    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < HN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    pairs = _swap_persisted(
        _HN_PAIRS_PERSISTED,
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
            "query_id",
            "q_label",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            (
                _dot(F.col("q_emb"), F.col("emb"))
                / F.nullif(F.col("q_norm") * F.col("norm"), F.lit(0.0))
            ).alias("cosine"),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc_nulls_last("cosine"), F.asc("neighbor_id")
    )
    neg = (
        pairs.filter(F.col("label") != F.col("q_label"))
        .withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= HN_K)
    )
    pos = (
        pairs.filter(F.col("label") == F.col("q_label"))
        .groupBy("query_id")
        .agg(F.max("cosine").alias("pos_best_cosine"))
    )
    return neg.join(F.broadcast(pos), "query_id", "left").select(
        "query_id",
        "neg_rank",
        "neighbor_id",
        F.col("cosine").alias("neg_cosine"),
        "pos_best_cosine",
        (F.col("pos_best_cosine") - F.col("cosine")).alias("margin"),
    )


# --- emb_dim_reduction_eval (consolidation candidate) --------------------

# One corpus pass serves BOTH dimension-reduction axes: 'mrl' slices
# the raw embedding prefix (matryoshka), 'jl' slices the persisted
# sign-projection array. Same widths/k/queries as the two entries it
# consolidates (MRL_DIMS == JL_DIMS, MRL_K == JL_K, MRL_QUERIES ==
# JL_QUERIES), so its per-axis output must equal theirs row for row —
# the cross-entry identity tests/test_staging_r13.py pins.
_DRE_PAIRS_PERSISTED: list[DataFrame] = []
# Own corpus slot (r11 ADVICE, kept after the jl parent's retirement
# made this the only consumer): one persist slot per entry is the
# _swap_persisted contract — a shared slot would unpersist another
# entry's cached input mid-session.
_DRE_CORPUS_PERSISTED: list[DataFrame] = []


def _sql_mrl_cosine(d: int, q: str, c: str) -> str:
    qs, cs = f"{q}.emb[1:{d}]", f"{c}.emb[1:{d}]"
    return (
        f"{_sql_dot(qs, cs)} / NULLIF("
        f"sqrt({_sql_dot(qs, qs)}) * sqrt({_sql_dot(cs, cs)}), 0)"
    )


@register(
    "emb_dim_reduction_eval",
    oracle=f"""
    WITH emb AS ({_SQL_EMB}),
    signs AS ({_SQL_JL_SIGNS}),
    comps AS (
        SELECT vec_id, unnest(emb) AS val, generate_subscripts(emb, 1) AS dim
        FROM emb
    ),
    pcomps AS (
        SELECT c.vec_id, s.plane,
               CAST(CAST(SUM(CAST(c.val * s.comp AS {_SQL_DEC})) AS VARCHAR) AS DOUBLE) AS pval
        FROM comps c JOIN signs s ON c.dim = s.dim
        GROUP BY c.vec_id, s.plane
    ),
    proj AS (
        SELECT vec_id, list(pval ORDER BY plane) AS pemb
        FROM pcomps GROUP BY vec_id
    ),
    corpus AS (
        SELECT e.vec_id, e.emb, e.norm, p.pemb
        FROM emb e JOIN proj p USING (vec_id)
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_sql_dot('q.emb', 'c.emb')} / NULLIF(q.norm * c.norm, 0) AS cos_full,
               {', '.join(f"{_sql_mrl_cosine(r, 'q', 'c')} AS cos_mrl_{r}" for r in JL_DIMS)},
               {', '.join(f"{_sql_jl_cosine(r, 'q', 'c')} AS cos_jl_{r}" for r in JL_DIMS)}
        FROM corpus q JOIN corpus c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {JL_QUERIES}
    ),
    full_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cos_full DESC NULLS LAST, neighbor_id
            ) AS rnk FROM pairs
        ) r WHERE rnk <= {JL_K}
    ),
    axis_topk AS (
        {' UNION ALL '.join(f'''
        SELECT '{axis}' AS axis, {r} AS r_dim, query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cos_{axis}_{r} DESC NULLS LAST, neighbor_id
            ) AS rnk FROM pairs
        ) r WHERE rnk <= {JL_K}''' for axis in ('mrl', 'jl') for r in JL_DIMS)}
    )
    SELECT t.axis, CAST(t.r_dim AS BIGINT) AS r_dim, t.query_id,
           CAST(SUM(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           CAST({JL_K} AS BIGINT) AS k
    FROM axis_topk t
    LEFT JOIN full_topk f
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY t.axis, t.r_dim, t.query_id
    """,
)
def emb_dim_reduction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH dimension-reduction axes in one corpus pass: per query,
    per width r in {JL_DIMS}, and per axis ('mrl' = matryoshka raw
    prefix, 'jl' = sign-projection prefix), the exact-top-{JL_K}
    overlap of the reduced ranking. (axis, r_dim, query_id,
    n_overlap, k) — row-identical per axis to the two entries it
    replaced: the FOLDED emb_matryoshka_truncate_eval (the 'mrl'
    identity stays pytest-pinned against the folded parent) and the
    deleted emb_jl_projection_eval candidate (the 'jl' axis is
    re-derived independently by this entry's own oracle SQL), because
    the constants match and the scoring goes through the same
    decimal-dot hops.

    REGISTERED r13 — the consolidation the r12 VERDICT task 3
    ordered (GATE_LOG r11 "cap arithmetic"): one entry covers both
    per-axis parents, frees a registry slot, and makes the comparison
    CHEAPER than either parent alone ran — the full-cosine truth pass
    and the pair broadcast are paid once for both axes, and the
    widths slice the same persisted arrays.

    Scale: identical contract to its parents — one map-side
    projection pass (persisted), one query-broadcast scored-pair
    frame (persisted), WindowGroupLimit top-k per (axis, width),
    broadcast-sized overlap joins; the corpus never shuffles.

    Measured (BENCH_SCALE, r11 third session): x20 0.39x, x100 0.53x
    (Spark 35.1 s vs DuckDB 65.9 s at 200k vectors — both axes for
    ~1.9x the JL-alone Spark wall, i.e. the truth pass and pair
    broadcast amortize); cluster2x16 **0.95x** of local32 — the only
    staged entry where the two-JVM profile WINS, because the heavy
    decimal folds parallelize across isolated heaps
    (BENCH_CLUSTER)."""
    emb = _embeddings(spark, sf_dir)
    # Prefix norms precomputed ONCE PER VECTOR in the persisted corpus
    # frame (r15, guide §1.2): the per-pair cosine used to re-derive
    # sqrt(dot(prefix, prefix)) for both sides inside every scored
    # pair — ~half the pair stage's decimal-fold volume was these
    # norms, recomputed corpus-many times for each query vector and
    # query-many times for each corpus vector. The value is the same
    # expression on the same slice, so the pair result is
    # bit-identical. r15 same-session A/B at sf0.1 with the persisted
    # frames dropped before each run (i.e. timing the real pair
    # compute, which the bench's warm-cache protocol does not):
    # 1.78 s -> 1.54 s, identical result hash.
    def pre_norm(col: str, axis: str, r: int):
        s = F.slice(col, 1, r)
        return F.sqrt(_dot(s, s)).alias(f"n_{axis}_{r}")

    corpus = _swap_persisted(
        _DRE_CORPUS_PERSISTED,
        emb.select(
            "vec_id",
            "emb",
            "norm",
            _jl_project().alias("pemb"),
        ).select(
            "vec_id",
            "emb",
            "norm",
            "pemb",
            *[
                pre_norm("emb" if a == "mrl" else "pemb", a, r)
                for a in ("mrl", "jl")
                for r in JL_DIMS
            ],
        ),
    )
    q = corpus.filter(F.col("vec_id") < JL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("pemb").alias("q_pemb"),
        *[
            F.col(f"n_{a}_{r}").alias(f"q_n_{a}_{r}")
            for a in ("mrl", "jl")
            for r in JL_DIMS
        ],
    )

    def axis_cos(axis: str, r: int):
        if axis == "mrl":
            qs, cs = F.slice("q_emb", 1, r), F.slice("emb", 1, r)
        else:
            qs, cs = F.slice("q_pemb", 1, r), F.slice("pemb", 1, r)
        return (
            _dot(qs, cs)
            / F.nullif(
                F.col(f"q_n_{axis}_{r}") * F.col(f"n_{axis}_{r}"), F.lit(0.0)
            )
        ).alias(f"cos_{axis}_{r}")

    pairs = _swap_persisted(
        _DRE_PAIRS_PERSISTED,
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("q_emb"), F.col("emb"))
                / F.nullif(F.col("q_norm") * F.col("norm"), F.lit(0.0))
            ).alias("cos_full"),
            *[axis_cos(a, r) for a in ("mrl", "jl") for r in JL_DIMS],
        ),
    )

    def topk(order_col: str):
        w = Window.partitionBy("query_id").orderBy(
            F.desc_nulls_last(order_col), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= JL_K)
            .select("query_id", "neighbor_id")
        )

    full_topk = topk("cos_full")
    axis_topk = None
    for a in ("mrl", "jl"):
        for r in JL_DIMS:
            t = topk(f"cos_{a}_{r}").select(
                F.lit(a).alias("axis"),
                F.lit(r).cast("long").alias("r_dim"),
                "query_id",
                "neighbor_id",
            )
            axis_topk = t if axis_topk is None else axis_topk.unionByName(t)
    return (
        axis_topk.join(
            F.broadcast(full_topk.withColumn("hit", F.lit(1))),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("axis", "r_dim", "query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_overlap"),
            F.lit(JL_K).cast("long").alias("k"),
        )
    )
