"""Round-12 candidates: the PCA pair REGISTERED at r13, the rest
staged.

Executed at r13 (r12 VERDICT task 3): ``emb_pca_power_iteration`` +
``emb_pca_project_scores`` promoted into the capacity the r13
consolidation freed (decorator swap, the staging_r11 precedent) —
they share the training subtree, x100 0.09-0.12x vs DuckDB. The
others follow the r9-r11 staging protocol (DuckDB oracle +
driver-gate-equivalent pytest compare + differential fuzz + laziness
+ plan-shape + bench_scale rows) before any registry promotion:

- ``dedup_containment_ngram`` — ASYMMETRIC near-dup detection: exact
  shingle-set containment C(A,B) = |A∩B| / min(|A|,|B|). Jaccard
  misses the quote/boilerplate-superset case (a small doc embedded
  in a much larger one has low Jaccard but containment ~1); RefinedWeb
  and Gopher-style curation pipelines run a containment pass for
  exactly that reason. Pairs are classified ``near_dup`` (symmetric,
  Jaccard also high) vs ``containment`` (asymmetric only), with the
  contained side identified. The synthetic corpus only contains
  symmetric duplicates, so the asymmetric branch is proven by the
  planted-superset differential fuzz in tests/test_staging_r12.py.
- ``lake_bloom_semijoin_prune`` — the runtime-filter scale technique:
  build a deterministic Bloom filter (m bits, k md5-derived probes)
  over a selective dimension segment, broadcast it as ONE sorted bit
  array, and evaluate fact-side membership entirely map-side — the
  shape Spark's own InjectRuntimeFilter/BloomFilterAggregate pair
  produces for big joins, made explicit and cross-engine-checkable.
  The report quantifies what the filter buys (rows pruned) and what
  it costs (observed false positives vs the exact semi-join), with a
  false-negative self-check column that must be identically zero.
- ``emb_pca_power_iteration`` — the eigen primitive the embedding
  family was missing (OPQ rotations, whitening, and dim reduction
  all start from the top principal components): exact scaled-long
  covariance, then an unrolled in-plan power iteration whose floats
  stay bit-identical across engines because both sides apply the
  same IEEE ops in the same fold order. Zero driver state.

Reference anchors (spec, not code): extend SURVEY.md's dedup family,
the lake/scale-technique family (skew_salted_user_join,
lake_bucketed_copartition_join precedents), and the embedding
lifecycle family beyond the reference's own surface, like the
round-5-11 additions they follow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textops
from ..tables import load_table
from . import Query, register
from .dedup import _shingles_cached
from .similarity import DIM, _SQL_EMB, _embeddings

# --- staging registry (NOT the driver registry) -----------------------

STAGED: dict[str, Query] = {}


def stage(name: str, oracle: str | None = None, doc: str = ""):
    """Mirror of ``plans.register`` writing to the staging dict, so a
    round-12 promotion is a one-word decorator swap (the
    staging_r11 precedent)."""

    def deco(fn):
        STAGED[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


# --- dedup_containment_ngram ------------------------------------------

# keep pairs whose smaller shingle set is >= 80% inside the overlap
CONTAINMENT_PPM = 800_000
# a pair this symmetric is an ordinary near-dup, not a containment
NEAR_DUP_J_PPM = 800_000

_SQL_CONTAINMENT_PAIRS = f"""
    shingles AS ({textops.sql_shingles('documents')}),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        FROM shingles GROUP BY doc_id
    ),
    overlap AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM shingles a
        JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    scored AS (
        SELECT o.doc_a, o.doc_b,
               sa.n_sh AS n_a, sb.n_sh AS n_b, o.n_common,
               (1000000 * o.n_common) // LEAST(sa.n_sh, sb.n_sh)
                   AS containment_ppm,
               (1000000 * o.n_common) // (sa.n_sh + sb.n_sh - o.n_common)
                   AS jaccard_ppm
        FROM overlap o
        JOIN sizes sa ON o.doc_a = sa.doc_id
        JOIN sizes sb ON o.doc_b = sb.doc_id
    )
"""


@register(
    "dedup_containment_ngram",
    oracle=f"""
    WITH {_SQL_CONTAINMENT_PAIRS}
    SELECT doc_a, doc_b, n_a, n_b, n_common, containment_ppm, jaccard_ppm,
           CASE WHEN jaccard_ppm >= {NEAR_DUP_J_PPM} THEN 'near_dup'
                ELSE 'containment' END AS relation,
           CASE WHEN n_a < n_b THEN doc_a
                WHEN n_b < n_a THEN doc_b
                ELSE doc_a END AS contained_doc_id
    FROM scored
    WHERE containment_ppm >= {CONTAINMENT_PPM}
    """,
)
def dedup_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs by exact 5-token-shingle overlap:
    C = |A∩B| / min(|A|,|B|) >= 0.8, classified ``near_dup`` when the
    Jaccard is also >= 0.8 (symmetric duplicate — dedup_minhash_lsh
    territory) vs ``containment`` (the quote/superset case Jaccard
    structurally under-scores: J <= C * min/max). The contained side
    is the smaller shingle set (tie -> doc_a, which is always the
    smaller id).

    All arithmetic is integer (counts and ppm integer division), so
    the cross-engine hash gate applies exactly — the house rule that
    keeps float rounding out of comparison columns.

    Scale: identical shape to dedup_ngram_jaccard — the shingle
    equi-join is the only corpus-sized shuffle and its pair fan-out
    is bounded by shared-shingle frequency (near-linear for natural
    text); sizes join back on doc ids. At 100 TB the production
    parameterization samples shingles by hash mod p on BOTH sides of
    the ratio (containment stays estimable under DIVIDE-style
    sampling because numerator and denominator sample identically);
    the registered default keeps the exact semantics the oracle can
    verify. The corpus is never pair-joined in full."""
    sh = _shingles_cached(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    # shuffle_hash on the self-join build side (r16; the
    # dedup_minhash_lsh verification-join precedent): past the
    # broadcast threshold the planner picks SMJ, which sorts BOTH
    # shingle sides per partition — hashing one side instead measured
    # 5.6-6.2 -> 3.3-4.3 s at x100mut (14.5M shingles, identical
    # 237k output rows) and parity at sf0.1 (where the un-hinted plan
    # broadcasts anyway). The hint is honored unconditionally (no
    # size fallback, no AQE demotion): the per-task build is one
    # partition of the shingle frame, bounded by the width sizing
    # (scale-adaptive locally, AQE advisory-size ceiling on cluster),
    # and SMJ remains one hint-removal away for a deployment whose
    # partitions outgrow that.
    overlap = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    scored = (
        overlap.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("sa.n_sh").alias("n_a"),
            F.col("sb.n_sh").alias("n_b"),
            "n_common",
            F.expr("(1000000 * n_common) div least(sa.n_sh, sb.n_sh)").alias(
                "containment_ppm"
            ),
            F.expr(
                "(1000000 * n_common) div (sa.n_sh + sb.n_sh - n_common)"
            ).alias("jaccard_ppm"),
        )
    )
    return scored.filter(F.col("containment_ppm") >= CONTAINMENT_PPM).select(
        "doc_a",
        "doc_b",
        "n_a",
        "n_b",
        "n_common",
        "containment_ppm",
        "jaccard_ppm",
        F.when(F.col("jaccard_ppm") >= NEAR_DUP_J_PPM, F.lit("near_dup"))
        .otherwise(F.lit("containment"))
        .alias("relation"),
        F.when(F.col("n_a") < F.col("n_b"), F.col("doc_a"))
        .when(F.col("n_b") < F.col("n_a"), F.col("doc_b"))
        .otherwise(F.col("doc_a"))
        .alias("contained_doc_id"),
    )


# --- lake_bloom_semijoin_prune -----------------------------------------

BLOOM_M = 16384  # filter bits (~5.4 bits/key at the sf0.01 build side)
BLOOM_K = 3  # hash probes per key
BLOOM_SEGMENT = "BUILDING"  # the selective build-side predicate


def _bloom_pos(key: Column, j: int, m: int = BLOOM_M) -> Column:
    """Probe j's bit position for ``key``: bits [20j, 20j+20) of a
    single 60-bit integer taken from md5's first 15 hex chars, mod m —
    the repo's portable-hash idiom (identical in Java and DuckDB),
    sliced Kirsch-Mitzenmacher style so the probe side pays ONE hash
    and ONE hex->int conversion per key instead of k of each (real
    Bloom implementations derive all k positions from one or two base
    hashes for the same reason). k <= 3 (3 x 20 bits in the 60), and
    m <= 2^20."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    return F.shiftright(h, 20 * j).bitwiseAND(F.lit((1 << 20) - 1)) % m


def _sql_bloom_pos(key: str, j: int, m: int = BLOOM_M) -> str:
    return (
        f"((CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT) "
        f">> {20 * j}) & {(1 << 20) - 1}) % {m}"
    )


@stage(
    "lake_bloom_semijoin_prune",
    oracle=f"""
    WITH build AS (
        SELECT DISTINCT c_custkey AS k FROM customer
        WHERE c_mktsegment = '{BLOOM_SEGMENT}'
    ),
    hpos AS (
        SELECT DISTINCT
            ((CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)
              >> (20 * j)) & 1048575) % {BLOOM_M} AS pos
        FROM build CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS j)
    ),
    flags AS (
        SELECT
            ({" AND ".join(f"({_sql_bloom_pos('o.o_custkey', j)}) IN (SELECT pos FROM hpos)" for j in range(BLOOM_K))})
                AS pass_bloom,
            o.o_custkey IN (SELECT k FROM build) AS is_member
        FROM orders o
    )
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build_keys,
        CAST({BLOOM_M} AS BIGINT) AS m_bits,
        CAST({BLOOM_K} AS BIGINT) AS k_hashes,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM hpos) AS bits_set,
        CAST(COUNT(*) AS BIGINT) AS n_probe,
        CAST(SUM(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
        CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
        CAST(SUM(CASE WHEN pass_bloom AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
        CAST(SUM(CASE WHEN is_member AND NOT pass_bloom THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
        CASE WHEN COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END) > 0
             THEN (1000000 * SUM(CASE WHEN pass_bloom AND NOT is_member THEN 1 ELSE 0 END))
                  // (COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END))
             ELSE 0 END AS fp_ppm
    FROM flags
    """,
)
def lake_bloom_semijoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter semi-join prune report: build an
    m=BLOOM_M-bit, k=BLOOM_K-probe Bloom filter over the
    BLOOM_SEGMENT-segment customer keys, broadcast it as one sorted
    bit-position array, test every order map-side, and compare
    against the exact semi-join. Registered binding of
    :func:`bloom_semijoin_report` at the oracle-expressible fixed
    defaults; production tuning (m sized ~10 bits/key off the build
    cardinality estimate, like Spark's own InjectRuntimeFilter
    sizing) happens through the parameters.

    This is the explicit form of the runtime filter every warehouse
    injects into selective big joins (Spark: InjectRuntimeFilter /
    BloomFilterAggregate; the reference's analogue is its semi-join
    reduction of fetched METAR rows to indexed stations,
    crates/daemon/src/domains/observations/download_observations.rs:254-256)
    — made deterministic
    (md5-derived positions, identical in both engines) so the FP/FN
    accounting itself is hash-gate-checkable. ``n_false_neg`` is a
    structural self-check: a Bloom filter can never produce false
    negatives, so the column must be 0 on every lake (the fuzz test
    asserts it across random lakes).

    Scale: the build side aggregates to <= m distinct bit positions
    (sketch-sized regardless of corpus scale) and crosses onto the
    probe side as a 1-row broadcast (the audited 1-row
    BroadcastNestedLoopJoin pattern); membership is a map-side
    array_contains x k — the probe corpus NEVER shuffles, and the
    only full-width pass is the final partial-then-global count
    aggregation. The exact-truth comparison broadcasts the build key
    set (dimension-sized). At 100 TB: m scales with the build-side
    cardinality (m ~ 10n bits for ~1% FP at k=3), still broadcastable
    at billions of build keys via int ranges; the report's fp_ppm is
    the signal that says when m is undersized."""
    return bloom_semijoin_report(spark, sf_dir)


def bloom_semijoin_report(
    spark: SparkSession,
    sf_dir: str,
    m: int = BLOOM_M,
    k_hashes: int = BLOOM_K,
    segment: str = BLOOM_SEGMENT,
) -> DataFrame:
    """Parameterized core of ``lake_bloom_semijoin_prune`` — see the
    staged binding's docstring for semantics and scale notes."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = (
        cust.filter(F.col("c_mktsegment") == segment)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    pos = build.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("k"), j, m) for j in range(k_hashes)])
        ).alias("pos")
    ).distinct()
    # Pack the filter into dense 64-bit words so membership is an
    # O(1) element_at + shift/AND per probe — an array_contains over
    # the raw position list is an O(m) linear scan per probe and was
    # measured 50x slower than the oracle's hashed IN at x5. This is
    # also how Spark's own BloomFilterImpl stores its bits.
    n_words = (m + 63) // 64
    words = pos.groupBy((F.col("pos") / 64).cast("long").alias("word_idx")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").alias(
            "word"
        )
    )
    # densify sparse (word_idx, word) rows into one fixed-length array
    # via a map lookup per slot — sketch-sized work, and one frame
    # fewer to broadcast than a range-frame outer join
    bits_row = words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word_idx", "word")))
        ).alias("wmap")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            "i -> coalesce(wmap[CAST(i AS BIGINT)], CAST(0 AS BIGINT)))"
        ).alias("words")
    )
    build_agg = build.agg(F.count("*").cast("long").alias("n_build_keys"))
    member = build.withColumn("is_member", F.lit(True))
    probe = orders.select("o_custkey")
    if not 1 <= k_hashes <= 3:
        raise ValueError(f"k_hashes must be 1..3 (20-bit slices), got {k_hashes}")
    if m > 1 << 20:
        raise ValueError(f"m must be <= 2^20 (20-bit slices), got {m}")
    pass_bloom = F.lit(True)
    for j in range(k_hashes):  # map-side membership: ALL k positions set
        p = (
            f"((shiftright(CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 15), 16, 10) AS BIGINT), {20 * j}) & 1048575) % {m})"
        )
        pass_bloom = pass_bloom & F.expr(
            f"(shiftright(element_at(words, CAST({p} / 64 AS INT) + 1), "
            f"CAST({p} % 64 AS INT)) & 1) = 1"
        )
    flags = (
        probe.crossJoin(F.broadcast(bits_row))
        .withColumn("pass_bloom", pass_bloom)
        .join(F.broadcast(member), F.col("o_custkey") == F.col("k"), "left")
        .withColumn("is_member", F.coalesce(F.col("is_member"), F.lit(False)))
    )
    report = flags.agg(
        F.count("*").cast("long").alias("n_probe"),
        F.sum(F.when(F.col("pass_bloom"), 1).otherwise(0)).cast("long").alias("n_pass_bloom"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).cast("long").alias("n_true_match"),
        F.sum(F.when(F.col("pass_bloom") & ~F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("is_member") & ~F.col("pass_bloom"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_neg"),
    )
    return (
        report.crossJoin(F.broadcast(build_agg))
        # same subtree as the probe-side broadcast -> ReusedExchange,
        # not a second materialization; bits_set = set-bit population
        # of the packed words (== COUNT(DISTINCT pos) by construction)
        .crossJoin(F.broadcast(bits_row))
        .select(
            "n_build_keys",
            F.lit(m).cast("long").alias("m_bits"),
            F.lit(k_hashes).cast("long").alias("k_hashes"),
            F.expr(
                "aggregate(words, CAST(0 AS BIGINT), (acc, w) -> acc + bit_count(w))"
            ).alias("bits_set"),
            "n_probe",
            "n_pass_bloom",
            "n_true_match",
            "n_false_pos",
            "n_false_neg",
            F.when(
                (F.col("n_probe") - F.col("n_true_match")) > 0,
                F.expr("(1000000 * n_false_pos) div (n_probe - n_true_match)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("fp_ppm"),
        )
    )


# --- emb_pca_power_iteration --------------------------------------------

PCA_ITERS = 24  # unrolled power-iteration steps (see convergence note)
_PCA_S = "1000000000.0"  # 1e-9 fixed-point moment/loading resolution


def _pca_matvec_sql(v: str, dim: int) -> str:
    """DuckDB C·v with an explicit 0.0-seeded left fold in index
    order, the same association Spark's ``aggregate`` uses — IEEE
    doubles summed in the same order are bit-identical, which is what
    lets the hash gate check a 24-step float recurrence at all."""
    return (
        f"list_transform(range(0, {dim}), i -> "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(0, {dim}), j -> rows[i + 1][j + 1] * {v}[j + 1])), "
        "(a, b) -> a + b))"
    )


def _pca_ctes(dim: int = DIM, iters: int = PCA_ITERS) -> str:
    """Shared WITH-body (through the ``sc`` CTE) for the two PCA
    oracles; ``muv`` and ``emb`` stay in scope for the projection
    entry's final select."""
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
    itw{k} AS MATERIALIZED (
        SELECT rows, {_pca_matvec_sql('v', dim)} AS w, v FROM it{k - 1}
    ),
    it{k} AS MATERIALIZED (
        SELECT rows,
               CASE WHEN nrm = 0.0 THEN v
                    ELSE list_transform(w, x -> x / nrm) END AS v
        FROM (SELECT rows, w, v,
                     sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                          list_transform(w, x -> x * x)), (a, b) -> a + b)) AS nrm
              FROM itw{k}) t
    )""")
    return f"""
    WITH emb AS ({_SQL_EMB}),
    lvl1 AS (
        SELECT generate_subscripts(emb, 1) - 1 AS i, unnest(emb) AS xi, emb FROM emb
    ),
    pairs AS (
        SELECT i, xi, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS xj FROM lvl1
    ),
    m2q AS (
        SELECT i, j, SUM(CAST(FLOOR(xi * xj * {_PCA_S}) AS BIGINT)) AS s2q
        FROM pairs GROUP BY i, j
    ),
    m1q AS (
        SELECT i, SUM(CAST(FLOOR(xi * {_PCA_S}) AS BIGINT)) AS s1q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lvl1 GROUP BY i
    ),
    muv AS (
        SELECT list(CAST(s1q AS DOUBLE) / {_PCA_S} / n ORDER BY i) AS mu,
               MAX(n) AS n_vecs
        FROM m1q
    ),
    m2rows AS (
        SELECT i, list(CAST(s2q AS DOUBLE) / {_PCA_S} ORDER BY j) AS mrow
        FROM m2q GROUP BY i
    ),
    m2m AS (SELECT list(mrow ORDER BY i) AS m2 FROM m2rows),
    it0 AS MATERIALIZED (
        SELECT list_transform(range(0, {dim}), i ->
                 list_transform(range(0, {dim}), j ->
                   m2m.m2[i + 1][j + 1] / CAST(muv.n_vecs AS DOUBLE)
                   - muv.mu[i + 1] * muv.mu[j + 1])) AS rows,
               list_transform(range(0, {dim}), i -> CAST(0.125 AS DOUBLE)) AS v
        FROM m2m, muv
    ),{','.join(its)},
    fin AS (
        SELECT rows, v, {_pca_matvec_sql('v', dim)} AS wf FROM it{iters}
    ),
    sc AS (
        SELECT v,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(0, {dim}), i -> v[i + 1] * wf[i + 1])), (a, b) -> a + b) AS lam,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(0, {dim}), i -> rows[i + 1][i + 1])), (a, b) -> a + b) AS trc
        FROM fin
    )"""


def _pca_oracle_sql(dim: int = DIM, iters: int = PCA_ITERS) -> str:
    return f"""
    {_pca_ctes(dim, iters)}
    SELECT CAST(generate_subscripts(v, 1) - 1 AS BIGINT) AS dim,
           CAST(FLOOR(unnest(v) * {_PCA_S}) AS BIGINT) AS loading_q,
           CAST(FLOOR(lam * {_PCA_S}) AS BIGINT) AS eigenvalue_q,
           CASE WHEN trc > 0 THEN CAST(FLOOR(lam / trc * 1000000.0) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS evr_ppm
    FROM sc
    """


def _pca_project_oracle_sql(dim: int = DIM, iters: int = PCA_ITERS) -> str:
    return f"""
    {_pca_ctes(dim, iters)}
    SELECT e.vec_id,
           CAST(FLOOR(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(0, {dim}), i ->
                    sc.v[i + 1] * (e.emb[i + 1] - muv.mu[i + 1]))),
                (a, b) -> a + b) * {_PCA_S}) AS BIGINT) AS proj_q
    FROM emb e, sc, muv
    """


@register("emb_pca_power_iteration", oracle=_pca_oracle_sql())
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus: exact
    mean-centered covariance, then PCA_ITERS unrolled power-iteration
    steps run ENTIRELY in-plan — zero driver state (contrast
    kmeans_embeddings' k x dim Lloyd partials), completing the
    embedding-ops family with the eigen primitive OPQ rotation /
    whitening / dim-reduction pipelines are built on.

    Cross-engine exactness for a float recurrence: second moments and
    means accumulate as FLOOR-scaled longs (order-independent, exact;
    |x| <= 30 at 100M rows stays inside int64); every double after
    that derives from IEEE ops applied in the SAME association and
    fold order on both engines (Spark ``aggregate`` and DuckDB
    ``list_reduce`` both left-fold, both seeded 0.0 via list_prepend;
    sqrt/divide are correctly rounded per IEEE 754), so 24 iterations
    stay bit-identical and the gate hashes quantized loadings.
    Convergence is the honest power-iteration story: (lambda2/
    lambda1)^k — the synthetic corpus' near-flat spectrum reaches a
    0.98 Rayleigh ratio at k=24 (asserted), while a spiked spectrum
    (the planted-fuzz case, and real embedding corpora with dominant
    directions) converges to >0.99 cosine.

    Scale: the covariance explode is N x d^2 rows but shuffles only
    d^2 = 4096 keys after map-side combine — one bounded exchange; at
    100 TB the production path computes per-partition numpy partials
    via mapInPandas and merges d^2 scalars (float partials, outside
    the hash gate — the documented trade), or samples vectors. The
    iteration is 1-row work in a single unbarriered Project chain:
    each step's intermediates (w_k, n_k) are referenced more than
    once, so CollapseProject's multi-reference guard keeps the
    per-step Projects separate operators and each value is computed
    once per step (r15 A/B: the former per-step repartition(1)
    barriers cost 25 one-row exchange stages of pure scheduling —
    1.42 s vs 0.90 s at sf0.1, bit-identical output; the historical
    unbounded-inlining hazard belonged to the old posexplode output
    shape, whose Generate-inferred size()>0 filter carried the whole
    recurrence — hence the range(d) x 1-row broadcast below, which
    stays). The deflation sibling (staging_r14) keeps its own 1-row
    barriers: its lam1 IS single-referenced inside a d^2-cell lambda,
    the exact shape the guard does not protect.

    Reference anchor (spec, not code): extends SURVEY.md's
    embedding/similarity lifecycle family (kmeans_embeddings,
    emb_pq_codes precedents) beyond the reference's own surface."""
    vN = f"v{PCA_ITERS}"
    cur = _pca_state(spark, sf_dir)
    dims = spark.range(DIM).select(F.col("id").cast("long").alias("dim"))
    return dims.crossJoin(F.broadcast(cur.select(vN, "lam", "trace"))).select(
        "dim",
        F.floor(
            F.expr(f"element_at({vN}, CAST(dim AS INT) + 1)") * F.lit(1e9)
        )
        .cast("long")
        .alias("loading_q"),
        F.floor(F.col("lam") * F.lit(1e9)).cast("long").alias("eigenvalue_q"),
        F.when(
            F.col("trace") > 0, F.floor(F.col("lam") / F.col("trace") * F.lit(1e6))
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("evr_ppm"),
    )


def _pca_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row frame (rows, mu, v{PCA_ITERS}, lam, trace): the learned
    component plus the statistics both PCA entries read. See
    emb_pca_power_iteration's docstring for why the recurrence needs
    no 1-row barriers (and which sibling shape still does)."""
    emb = _embeddings(spark, sf_dir)
    lvl1 = emb.select(F.posexplode("emb").alias("i", "xi"), "emb")
    pairs = lvl1.select("i", "xi", F.posexplode("emb").alias("j", "xj"))
    m2q = pairs.groupBy("i", "j").agg(
        F.sum(F.floor(F.col("xi") * F.col("xj") * F.lit(1e9)).cast("long")).alias(
            "s2q"
        )
    )
    m1q = lvl1.groupBy("i").agg(
        F.sum(F.floor(F.col("xi") * F.lit(1e9)).cast("long")).alias("s1q"),
        F.count("*").cast("long").alias("n"),
    )
    mu_row = m1q.agg(
        F.expr(
            f"transform(sort_array(collect_list(struct(i, s1q, n))), "
            f"x -> CAST(x.s1q AS DOUBLE) / {_PCA_S} / x.n)"
        ).alias("mu"),
        F.max("n").alias("n_vecs"),
    )
    m2rows = m2q.groupBy("i").agg(
        F.expr(
            f"transform(sort_array(collect_list(struct(j, s2q))), "
            f"x -> CAST(x.s2q AS DOUBLE) / {_PCA_S})"
        ).alias("mrow")
    )
    m2_row = m2rows.agg(
        F.expr("transform(sort_array(collect_list(struct(i, mrow))), x -> x.mrow)").alias(
            "m2"
        )
    )
    base = (
        m2_row.crossJoin(F.broadcast(mu_row))
        .withColumn(
            "rows",
            F.expr(
                f"transform(sequence(0, {DIM - 1}), i -> transform(sequence(0, {DIM - 1}), j -> "
                "element_at(element_at(m2, i + 1), j + 1) / CAST(n_vecs AS DOUBLE) "
                "- element_at(mu, i + 1) * element_at(mu, j + 1)))"
            ),
        )
        .select("rows", "mu")
    )
    matvec = (
        f"transform(sequence(0, {DIM - 1}), i -> aggregate(sequence(0, {DIM - 1}), "
        "CAST(0.0 AS DOUBLE), "
        "(acc, j) -> acc + element_at(element_at(rows, i + 1), j + 1) * element_at({v}, j + 1)))"
    )
    cur = base.withColumn(
        "v0", F.expr(f"transform(sequence(0, {DIM - 1}), i -> CAST(0.125 AS DOUBLE))")
    )
    for k in range(1, PCA_ITERS + 1):
        cur = (
            cur.withColumn(f"w{k}", F.expr(matvec.format(v=f"v{k - 1}")))
            .withColumn(
                f"n{k}",
                F.expr(
                    f"sqrt(aggregate(w{k}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
                ),
            )
            .withColumn(
                f"v{k}",
                F.expr(
                    f"CASE WHEN n{k} = 0.0 THEN v{k - 1} ELSE transform(w{k}, x -> x / n{k}) END"
                ),
            )
            .select("rows", "mu", f"v{k}")
        )
    vN = f"v{PCA_ITERS}"
    cur = (
        cur.withColumn("wf", F.expr(matvec.format(v=vN)))
        .withColumn(
            "lam",
            F.expr(
                f"aggregate(sequence(0, {DIM - 1}), CAST(0.0 AS DOUBLE), "
                f"(acc, i) -> acc + element_at({vN}, i + 1) * element_at(wf, i + 1))"
            ),
        )
        .withColumn(
            "trace",
            F.expr(
                f"aggregate(sequence(0, {DIM - 1}), CAST(0.0 AS DOUBLE), "
                "(acc, i) -> acc + element_at(element_at(rows, i + 1), i + 1))"
            ),
        )
    )
    return cur


@register("emb_pca_project_scores", oracle=_pca_project_oracle_sql())
def emb_pca_project_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train -> apply: project every embedding onto the corpus' own
    learned top component, proj = v . (x - mu) — the downstream shape
    a curation pipeline actually runs (dominant-direction outlier
    pruning, 1-d binning for stratified sampling, whitening's first
    step). One row per vector, fixed-point scores.

    Scale: this is THE broadcast-apply pattern — the learned state
    (one 64-float vector + mean) crosses onto the corpus as a 1-row
    broadcast and every score is a map-side fixed-order fold; the
    corpus never shuffles. Training cost is emb_pca_power_iteration's
    (shared plan subtree, same barrier-free chain); apply cost is linear and
    embarrassingly parallel. Cross-engine exactness inherits the
    power-iteration argument (same IEEE ops, same fold order; see
    emb_pca_power_iteration)."""
    cur = _pca_state(spark, sf_dir)
    vN = f"v{PCA_ITERS}"
    emb = _embeddings(spark, sf_dir)
    state = cur.select(F.col(vN).alias("pc"), "mu")
    return emb.crossJoin(F.broadcast(state)).select(
        "vec_id",
        F.floor(
            F.expr(
                f"aggregate(sequence(0, {DIM - 1}), CAST(0.0 AS DOUBLE), "
                "(acc, i) -> acc + element_at(pc, i + 1) * "
                "(element_at(emb, i + 1) - element_at(mu, i + 1)))"
            )
            * F.lit(1e9)
        )
        .cast("long")
        .alias("proj_q"),
    )
