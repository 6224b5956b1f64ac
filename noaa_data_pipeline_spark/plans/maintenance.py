"""Index-maintenance and rule-based curation operators.

Staged in round 8 (as ``staging_r9.py``, oracle-proven under pytest
at three SFs and three engine configs) and promoted into the driver
registry in round 9 — the same staged-promotion path the round-7
lifecycle operators took. The four entries:

- ``ivf_centroid_drift_report`` — ANN index maintenance, step 1: how
  far has each IVF cell's TRUE mean moved from the centroid the
  index was trained on? The faiss-style health check that decides
  when to retrain the coarse quantizer.
- ``ivf_cell_rebalance`` — ANN index maintenance, step 2: split
  oversized cells on their widest dimension at its midpoint — the
  classic quantizer-rebalance that keeps probe cost flat as inserts
  skew cell sizes.
- ``ivf_retrain_centroids`` — ANN index maintenance, step 3: retrain
  the coarse quantizer on the rebalanced assignment (per-cell means,
  exact at 1e-6 fixed-point resolution), producing the retrained
  centroid table for the next index build — closes the lifecycle
  ``sim_incremental_ivf_insert`` started.
- ``docs_gopher_rule_filter`` — rule-based document quality
  filtering in the style of the published Gopher/MassiveText rules
  (word-count bounds, mean-word-length bounds, stop-word presence,
  max single-word dominance), each rule integer-exact so the
  cross-engine hash gate applies, with per-rule reject accounting.

Reference anchors (spec, not code): the dedup/quality ops extend
SURVEY.md's LLM-pipeline family; the IVF pair extends the similarity
lifecycle surface (plans/lifecycle.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textops
from ..tables import load_table
from . import register
from .common import SCALE
from .similarity import _DEC, _SQL_DEC

# --- IVF index maintenance -------------------------------------------
#
# The "trained" centroids are the per-cell means of the corpus as it
# stood at index-build time, modeled deterministically as the vectors
# with vec_id % 5 < 4 (an 80% prefix-stable sample — the same
# size-independent hash-sampling idiom as split_train_val_hash); the
# remaining 20% are the post-build inserts. Both aggregates share ONE
# (label, dim) exchange; every mean is a scaled-long sum, exact at
# 1e-6 fixed-point resolution — each element quantizes DOWN by up to
# 1e-6 before summing, so these means intentionally diverge from the
# decimal-exact centroids the search entries derive via
# similarity._centroid_vectors (r10 ADVICE; the fixed-point form is
# the hot-path choice, see below). (common.SCALE fixed point — see
# common.py's overflow envelope:
# per-(cell, dim) sums stay under 2^63/1e6 up to ~1e10 members per
# cell, far past any real IVF cell), so the hot path is plain long
# addition inside whole-stage codegen instead of the similarity
# stack's decimal machinery (measured: the decimal form paid ~1.3 s
# more per query at x100 — GATE_LOG round 9).

BUILD_MOD = 5  # vec_id % 5 < 4 -> in the index-build snapshot
# needs_retrain when drift^2 * n_now > DRIFT_C: mean drift of a
# random 20% insert stream scales ~ 1/sqrt(n), so drift^2 * n is the
# scale-invariant statistic (measured 0.10-0.45 with median ~0.25 at
# sf0.001, sf0.01 AND sf0.1); the constant sits at the center so the
# flag stays non-degenerate at every SF instead of saturating as the
# corpus grows.
DRIFT_C = 0.25


def _emb_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, emb double[]) — the maintenance loader.

    Deliberately NOT similarity._embeddings: that loader computes a
    decimal-exact norm per row and repartitions the whole corpus by
    vec_id (its consumers need both). The maintenance plans are pure
    scan -> aggregate pipelines whose only exchanges carry k x dim
    aggregate rows, so inheriting the loader's repartition made the
    corpus shuffle itself the dominant cost — and the rebalance
    family pays it once per broadcast-build subtree (sizes, spreads,
    split plan, final projection all re-run the scan). Dropping it
    cut ivf_cell_rebalance 2.2 s -> ~1 s at x100 (GATE_LOG round 9).
    Scan parallelism comes from input splits, which is exactly what
    a real many-file lake provides at 100 TB."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").alias("cell"),
        F.col("embedding").cast("array<double>").alias("emb"),
    )


def _sql_mean(cond: str) -> str:
    # scaled-long exact mean, the common.sql_davg pattern with a
    # conditional numerator/denominator; NULL (not 0/0) when no rows
    # match the condition, same as the decimal form it replaced
    return (
        f"(CAST(SUM(CASE WHEN {cond} THEN "
        f"CAST(FLOOR(val * {SCALE}) AS BIGINT) END) AS DOUBLE) / {SCALE}.0)"
        f" / SUM(CASE WHEN {cond} THEN 1 ELSE 0 END)"
    )


@register(
    "ivf_centroid_drift_report",
    oracle=f"""
    WITH comps AS (
        SELECT label AS cell, vec_id % {BUILD_MOD} < {BUILD_MOD - 1} AS in_build,
               unnest(CAST(embedding AS DOUBLE[])) AS val,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ),
    means AS (
        SELECT cell, dim,
               {_sql_mean('TRUE')} AS m_now,
               {_sql_mean('in_build')} AS m_then,
               SUM(CASE WHEN in_build THEN 1 ELSE 0 END) AS n_then_d,
               COUNT(*) AS n_now_d
        FROM comps GROUP BY cell, dim
    ),
    drift AS (
        SELECT cell,
               MAX(n_then_d) AS n_then, MAX(n_now_d) AS n_now,
               CAST(CAST(list_sum(list_transform(
                   list((m_now - m_then) ORDER BY dim),
                   x -> CAST(x * x AS {_SQL_DEC}))) AS VARCHAR) AS DOUBLE)
                   AS drift_sq
        FROM means GROUP BY cell
    )
    SELECT cell, CAST(n_then AS BIGINT) AS n_then,
           CAST(n_now AS BIGINT) AS n_now,
           sqrt(drift_sq) AS drift,
           CAST(CASE WHEN n_then = 0 THEN 1
                     WHEN drift_sq * n_now > {DRIFT_C} THEN 1
                     ELSE 0 END AS INTEGER) AS needs_retrain
    FROM drift
    """,
)
def ivf_centroid_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index health check: per cell, compare the centroid the
    index was TRAINED on (mean of the build-time snapshot) against
    the cell's CURRENT mean, and flag cells whose quantizer has
    drifted enough to warrant retraining — the faiss-style
    maintenance report that completes the lifecycle
    ``sim_incremental_ivf_insert`` (plans/lifecycle.py) started.

    Exactness: both means are scaled-long sums, exact at 1e-6
    fixed-point resolution (FLOOR(val * 1e6) summed as BIGINT —
    associative, so partitioning cannot change the result, and plain
    long addition inside whole-stage codegen instead of the
    similarity stack's interpreted decimal aggregate; each element
    quantizes down by < 1e-6, identically in both engines); the
    dim-wise squared differences still fold in
    DECIMAL with the VARCHAR hop (64 rows per cell — off the hot
    path) so the drift is bit-identical across engines; the retrain
    flag compares the scale-invariant ``drift^2 * n_now`` statistic
    (drift of a random insert stream shrinks ~ 1/sqrt(n), so a raw
    threshold would saturate as the corpus grows) against a literal.

    Scale: ONE corpus-side exchange on (cell, dim) — k x dim rows out
    of the corpus scan with map-side partial aggregation — then a
    k-row regroup; the corpus is never joined, shuffled, or
    collected, so the plan is identical at 100 TB (plan-asserted:
    exactly two hash exchanges, both aggregate-sized). Scans only
    (label, vec_id, embedding)."""
    emb = _emb_cells(spark, sf_dir).select(
        "cell",
        (F.col("vec_id") % BUILD_MOD < BUILD_MOD - 1).alias("in_build"),
        F.posexplode("emb").alias("dim0", "val"),
    )
    scaled = F.floor(F.col("val") * SCALE).cast("long")
    sc_mean = lambda cond, n: (  # noqa: E731
        F.sum(F.when(cond, scaled)).cast("double") / SCALE / n
    )
    means = emb.groupBy("cell", "dim0").agg(
        sc_mean(F.lit(True), F.count("*")).alias("m_now"),
        sc_mean(
            F.col("in_build"),
            F.sum(F.when(F.col("in_build"), 1).otherwise(0)),
        ).alias("m_then"),
        F.sum(F.when(F.col("in_build"), 1).otherwise(0)).cast("long").alias("n_then_d"),
        F.count("*").cast("long").alias("n_now_d"),
    )
    drift = means.groupBy("cell").agg(
        F.max("n_then_d").alias("n_then"),
        F.max("n_now_d").alias("n_now"),
        # DuckDB's list_sum SKIPS NULL elements but returns NULL when
        # ALL elements are NULL — a dim with no build-snapshot members
        # has m_then NULL, so the fold must filter NULL diffs out
        # instead of NULL-poisoning the sum, and an all-NULL cell
        # (n_then = 0) must yield NULL drift (review r8:
        # partially-ragged cells diverged)
        F.when(
            F.size(
                F.filter(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("dim0", "m_now", "m_then"))
                        ),
                        lambda s: s["m_now"] - s["m_then"],
                    ),
                    lambda x: x.isNotNull(),
                )
            )
            == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.aggregate(
                F.filter(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("dim0", "m_now", "m_then"))
                        ),
                        lambda s: s["m_now"] - s["m_then"],
                    ),
                    lambda x: x.isNotNull(),
                ),
                F.lit(0).cast(_DEC),
                lambda acc, x: (acc + (x * x).cast(_DEC)).cast(_DEC),
            )
            .cast("string")
            .cast("double")
        )
        .alias("drift_sq"),
    )
    return drift.select(
        "cell",
        "n_then",
        "n_now",
        F.sqrt("drift_sq").alias("drift"),
        F.when(F.col("n_then") == 0, 1)
        .when(F.col("drift_sq") * F.col("n_now") > DRIFT_C, 1)
        .otherwise(0)
        .cast("int")
        .alias("needs_retrain"),
    )


# Split cells larger than OVERSIZE x the mean cell size. Production
# quantizers rebalance at 2-4x with real k-means imbalance; the
# synthetic labels are near-uniform, so the staged parameter sits at
# 1.05 to keep the split path exercised at every SF (3-4 of 10 cells).
# The threshold is evaluated as the INTEGER comparison
# ``DEN * n * k > NUM * total_n`` (n > NUM/DEN * total/k) — a float
# ``n > 1.05 * mean`` is not cross-engine exact (DuckDB folds the
# 1.05 literal in DECIMAL, Spark in DOUBLE; within one ulp of an
# integer cell size the engines could disagree and relabel an entire
# cell — review r8).
OVERSIZE_NUM, OVERSIZE_DEN = 21, 20  # = 1.05

# the rebalance assignment, shared by ivf_cell_rebalance (emits it)
# and ivf_retrain_centroids (retrains on it) — in SQL as CTEs and in
# Spark as a frame-building helper, the same factoring the r8
# semantic pair used (_sem_pairs_ctes)
_REBAL_SQL_CTES = f"""
    WITH emb AS (
        SELECT vec_id, label AS cell, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    sizes AS (SELECT cell, COUNT(*) AS n FROM emb GROUP BY cell),
    totals AS (
        SELECT SUM(n) AS total_n, COUNT(*) AS k FROM sizes
    ),
    oversized AS (
        SELECT s.cell FROM sizes s, totals t
        WHERE {OVERSIZE_DEN} * s.n * t.k > {OVERSIZE_NUM} * t.total_n
    ),
    spreads AS (
        SELECT e.cell, dim, MAX(val) AS mx, MIN(val) AS mn
        FROM (
            SELECT cell, unnest(emb) AS val, generate_subscripts(emb, 1) AS dim
            FROM emb WHERE cell IN (SELECT cell FROM oversized)
        ) e GROUP BY e.cell, dim
    ),
    split_dims AS (
        SELECT cell, dim AS split_dim, (mn + mx) / 2 AS mid
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY cell ORDER BY mx - mn DESC, dim
            ) AS rnk FROM spreads
        ) r WHERE rnk = 1
    ),
    assigned AS (
        SELECT e.vec_id, e.cell AS old_cell, e.emb,
               CASE WHEN s.cell IS NULL THEN CAST(e.cell AS VARCHAR)
                    WHEN e.emb[s.split_dim] > s.mid
                        THEN CAST(e.cell AS VARCHAR) || '_hi'
                    ELSE CAST(e.cell AS VARCHAR) || '_lo' END AS new_cell
        FROM emb e LEFT JOIN split_dims s ON e.cell = s.cell
    )
"""


def _rebalance_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of the ``assigned`` CTE: every vector with its
    (old_cell, new_cell) assignment and the embedding still attached."""
    emb = _emb_cells(spark, sf_dir)
    sizes = emb.groupBy("cell").agg(F.count("*").alias("n"))
    totals = sizes.agg(F.sum("n").alias("total_n"), F.count("*").alias("k"))
    oversized = sizes.join(
        F.broadcast(totals),
        OVERSIZE_DEN * F.col("n") * F.col("k") > OVERSIZE_NUM * F.col("total_n"),
    ).select("cell")
    spreads = (
        emb.join(F.broadcast(oversized), "cell")
        .select("cell", F.posexplode("emb").alias("dim0", "val"))
        .groupBy("cell", "dim0")
        .agg(F.max("val").alias("mx"), F.min("val").alias("mn"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cell").orderBy(
        F.desc(F.col("mx") - F.col("mn")), F.asc("dim0")
    )
    split_dims = (
        spreads.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            F.col("cell").alias("s_cell"),
            (F.col("dim0") + 1).alias("split_dim"),  # 1-based like SQL
            ((F.col("mn") + F.col("mx")) / 2).alias("mid"),
        )
    )
    return (
        emb.join(F.broadcast(split_dims), emb.cell == F.col("s_cell"), "left")
        .select(
            "vec_id",
            F.col("cell").alias("old_cell"),
            "emb",
            F.when(F.col("s_cell").isNull(), F.col("cell").cast("string"))
            .when(
                # try_element_at: an embedding SHORTER than the split
                # dim (ragged/empty row in an oversized cell) must
                # yield NULL -> '_lo' like the oracle's e.emb[dim],
                # not an ANSI INVALID_ARRAY_INDEX abort (review r8)
                F.try_element_at("emb", F.col("split_dim").cast("int")) > F.col("mid"),
                F.concat(F.col("cell").cast("string"), F.lit("_hi")),
            )
            .otherwise(F.concat(F.col("cell").cast("string"), F.lit("_lo")))
            .alias("new_cell"),
        )
    )


@register(
    "ivf_cell_rebalance",
    oracle=_REBAL_SQL_CTES
    + "SELECT vec_id, old_cell, new_cell FROM assigned",
)
def ivf_cell_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance, rebalance step: cells that grew past
    OVERSIZE x the mean cell size are split in two on their widest
    dimension (max value spread, ties to the lowest dim) at its
    midpoint — the deterministic median-of-extremes split a
    production quantizer applies between retrains to keep per-probe
    cost flat as inserts skew cell sizes. Emits every vector's
    (old_cell, new_cell) assignment; unsplit cells pass through.

    Exactness: spreads/midpoints are raw double max/min/subtract/
    halve — single IEEE ops, bit-identical across engines; no
    accumulation, so no decimal machinery needed.

    Scale: cell sizes and per-(cell,dim) extremes are tiny mergeable
    aggregates (k and k x dim rows); the split plan (cell ->
    split_dim, mid) broadcasts back into the corpus scan, so the
    corpus itself is never shuffled — assignment is one map-side
    projection, the same no-corpus-shuffle contract as the IVF
    search entries. Measured x20->x200 (round-9 rewrite: the loader
    repartition that re-shuffled the corpus once per broadcast-build
    subtree is gone): Spark wall flat 0.8-1.2 s (pure fixed cost)
    while the DuckDB twin grows linearly — ratio falls 4.3x (x20) ->
    1.87x (x100) -> 0.58x (x200)."""
    return _rebalance_assigned(spark, sf_dir).select(
        "vec_id", "old_cell", "new_cell"
    )


@register(
    "ivf_retrain_centroids",
    oracle=_REBAL_SQL_CTES
    + f"""
    SELECT new_cell AS cell, dim,
           (CAST(SUM(CAST(FLOOR(val * {SCALE}) AS BIGINT)) AS DOUBLE)
               / {SCALE}.0) / COUNT(*) AS centroid,
           COUNT(*) AS n_vectors
    FROM (
        SELECT new_cell, unnest(emb) AS val,
               generate_subscripts(emb, 1) AS dim
        FROM assigned
    ) u
    GROUP BY new_cell, dim
    """,
)
def ivf_retrain_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance, final step: retrain the coarse
    quantizer on the rebalanced assignment — each (possibly split)
    cell's new centroid is the fixed-point mean of its members,
    emitted as (cell, dim, centroid, n_vectors) rows. This closes the
    lifecycle the registry started: sim_incremental_ivf_insert adds
    vectors, ivf_centroid_drift_report decides WHEN to act,
    ivf_cell_rebalance splits the oversized cells, and this entry
    produces the retrained centroid table for the next index build.
    (The SEARCH entries' demo bindings — sim_ivf_probe1/multiprobe —
    recompute decimal-exact centroids via similarity._centroid_vectors
    so their oracles stay expressible; this entry's 1e-6 fixed-point
    means intentionally diverge from those in the 15th decimal, r10
    ADVICE. A production index consumes THIS table.)

    Exactness: the same scaled-long mean as the drift report, exact
    at 1e-6 fixed-point resolution (associative long sums —
    partitioning cannot change the result; each element quantizes
    down by < 1e-6, identically in both engines), so means are
    bit-identical across engines at long-add speed.

    Scale: ONE exchange — the corpus explodes to (new_cell, dim)
    components with map-side partial sums, and only k' x dim
    aggregate rows shuffle; the corpus itself never moves. The
    rebalance assignment it builds on is itself map-side (broadcast
    split plan), so end-to-end the fact table is scanned, never
    shuffled."""
    comps = _rebalance_assigned(spark, sf_dir).select(
        F.col("new_cell").alias("cell"),
        F.posexplode("emb").alias("dim0", "val"),
    )
    return comps.groupBy("cell", (F.col("dim0") + 1).alias("dim")).agg(
        (
            F.sum(F.floor(F.col("val") * SCALE).cast("long")).cast("double")
            / SCALE
            / F.count("*")
        ).alias("centroid"),
        F.count("*").alias("n_vectors"),
    )


# --- Gopher-style rule filter ----------------------------------------
#
# The published MassiveText/Gopher quality heuristics, restricted to
# the rules the synthetic corpus can exercise and re-expressed as
# INTEGER comparisons (no ratios -> no float division -> the
# cross-engine hash gate applies):
#   R1  50 <= n_words <= 100000          (Gopher word-count bounds)
#   R2  3 <= mean word length <= 10      (as 3*nw <= nchars <= 10*nw)
#   R3  >= 2 distinct stop words present (Gopher stop-word rule)
#   R4  most frequent word <= 20% of all (as 5*top_count <= n_words)
#
# Gopher's published stop list is (the, be, to, of, and, that, have,
# with); the synthetic corpus's 31-word vocabulary contains exactly
# two function words — 'the' and 'a' — so the staged parameterization
# uses those (each in ~84% of docs, so the >=2 rule splits the corpus
# instead of rejecting everything); production swaps the full list.

GOPHER_STOPS = ("the", "a")


@register(
    "docs_gopher_rule_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               string_split({textops.SQL_NORM.format(col='text')}, ' ') AS toks,
               CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                    AS BIGINT) AS n_alnum
        FROM documents
        WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT doc_id, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS w FROM t) u
        GROUP BY doc_id, w
    ),
    tops AS (SELECT doc_id, MAX(c) AS top_count FROM counts GROUP BY doc_id),
    feat AS (
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_words, t.n_alnum,
               CAST(tp.top_count AS BIGINT) AS top_count,
               CAST({' + '.join(f"CASE WHEN list_contains(t.toks, '{s}') THEN 1 ELSE 0 END" for s in GOPHER_STOPS)}
                    AS BIGINT) AS n_stops
        FROM t JOIN tops tp ON t.doc_id = tp.doc_id
    )
    SELECT doc_id, n_words, n_alnum, top_count, n_stops,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS INTEGER) AS r_wordcount,
           CAST(CASE WHEN 3 * n_words <= n_alnum AND n_alnum <= 10 * n_words THEN 1 ELSE 0 END AS INTEGER) AS r_meanlen,
           CAST(CASE WHEN n_stops >= 2 THEN 1 ELSE 0 END AS INTEGER) AS r_stopwords,
           CAST(CASE WHEN 5 * top_count <= n_words THEN 1 ELSE 0 END AS INTEGER) AS r_topword,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                      AND 3 * n_words <= n_alnum AND n_alnum <= 10 * n_words
                      AND n_stops >= 2
                      AND 5 * top_count <= n_words THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM feat
    """,
)
def docs_gopher_rule_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based document quality filter in the style of the
    published Gopher/MassiveText heuristics, with per-rule
    accounting so a curation run can report WHICH rule rejected how
    many documents (the published pipelines log exactly this).

    Every statistic is an integer and every rule an integer
    comparison (mean-length bounds as ``3*nw <= chars <= 10*nw``,
    word-dominance as ``5*top <= nw``), so the result is
    hash-identical across engines with no decimal machinery.

    Scale: every feature derives from ONE per-(doc, token) count
    frame — n_words = SUM(c), n_alnum = SUM(c x token length) (the
    tokens are exactly the [a-z0-9] runs of lower(text), so their
    summed length IS the alphanumeric char count), top_count =
    MAX(c), n_stops from the distinct-token rows — all whole-stage
    codegen hash aggregates. The explicit doc_id repartition
    satisfies the clustered distribution of BOTH groupBys
    (HashPartitioning(doc_id) clusters (doc_id, tok)), so the
    pipeline runs on a single exchange (plan-asserted); on a real
    many-file lake the scan supplies the parallelism, the
    repartition is dropped, and the exchanges carry map-side-combined
    (doc, token) partial counts instead of the corpus. This replaced
    an r8-staged zero-exchange sorted-array fold
    (F.aggregate + array_sort): interpreted per-element HOF
    evaluation measured 34 s / 2.62x DuckDB at x100 — the counted
    form is the same integer semantics at hash-aggregate speed."""
    # NULL text is rejected before rule evaluation (not scored as an
    # all-rules-fail row — that would inflate every per-rule reject
    # count with documents that were never evaluated); found by the
    # adversarial-lake fuzz, where Spark's NULL-propagating rule bits
    # diverged from the oracle's inner-join drop
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = textops.tokens_df(
        docs, partitions=spark.sparkContext.defaultParallelism
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    feat = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.col("c") * F.length("tok")).cast("long").alias("n_alnum"),
        F.max("c").cast("long").alias("top_count"),
        F.sum(
            F.when(F.col("tok").isin(*GOPHER_STOPS), 1).otherwise(0)
        ).cast("long").alias("n_stops"),
    )
    r1 = F.col("n_words").between(50, 100000)
    r2 = (3 * F.col("n_words") <= F.col("n_alnum")) & (
        F.col("n_alnum") <= 10 * F.col("n_words")
    )
    r3 = F.col("n_stops") >= 2
    r4 = 5 * F.col("top_count") <= F.col("n_words")
    as_int = lambda c: F.when(c, 1).otherwise(0).cast("int")  # noqa: E731
    return feat.select(
        "doc_id", "n_words", "n_alnum", "top_count", "n_stops",
        as_int(r1).alias("r_wordcount"),
        as_int(r2).alias("r_meanlen"),
        as_int(r3).alias("r_stopwords"),
        as_int(r4).alias("r_topword"),
        as_int(r1 & r2 & r3 & r4).alias("keep"),
    )
