"""Round-14 candidates: staged, not registered.

Two operators following the r9-r13 staging protocol (DuckDB oracle +
driver-gate-equivalent pytest compare + independent third
implementation / numpy reference + differential fuzz + laziness +
plan-shape) before any registry promotion:

- ``docs_token_drift_tvd`` — per-source token-distribution DRIFT
  against the rest of the corpus: the total-variation distance
  between a source's unigram distribution and the complement's
  (leave-one-out), plus the single token contributing the largest
  share gap. This is the mixture-monitoring primitive a training-data
  pipeline runs per ingest batch: a source whose vocabulary diverges
  (spam injection, language drift, template flooding) shows up as a
  TVD spike, and the top-gap token says WHY. The existing mixture
  entries (docs_domain_mixture_resample, source_curation_report)
  weight and resample by source-level counts; none of them compares
  the CONTENT distributions — this is the drift axis the family
  lacked. TVD is chosen over KL exactly for the gate: KL needs
  ln(), whose last-ulp rounding is libm-specific (NOT covered by the
  repo's IEEE same-fold-order argument, which only relies on
  correctly-rounded +,*,/,sqrt), while TVD over ppm-quantized shares
  is 64-bit integer arithmetic end to end — exact by construction on
  both engines, like sample_weighted_priority.

Estimator definition (what the oracle pins, exactly): per token,
each side's share is quantized to ppm with integer division —
share_ppm = (1_000_000 * count) div total — and the reported drift is
tvd_ppm = floor(sum_tok |share_s - share_r| / 2) over the FULL corpus
vocabulary (tokens absent from the source contribute the rest-share
they fail to cover). The ppm quantization bounds the deviation from
exact TVD at vocab/2e6 per side while making the result
cross-engine hash-exact; a source that shares no tokens with the
complement reads ~1_000_000.

- ``emb_pca_top2_deflation`` — the top TWO principal components via
  Hotelling deflation over the r13-registered power-iteration
  machinery: deflate the exact quantized covariance by the first
  component and run the same unrolled in-plan recurrence again. The
  eigenBASIS extension (OPQ rotation, whitening, 2-d embedding maps
  consume multiple components); comp-1 rows are definitionally the
  registered entry's output, pytest-pinned.

Reference anchors (spec, not code): extends SURVEY.md's curation /
mixtures family (docs_domain_mixture_resample,
source_curation_report precedents) and the embedding eigen family
(emb_pca_power_iteration precedent), like the round-5-13 additions
they follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textops
from ..tables import load_table
from . import Query
from .graph_eval import _swap_persisted

# --- staging registry (NOT the driver registry) -----------------------

STAGED: dict[str, Query] = {}


def stage(name: str, oracle: str | None = None, doc: str = ""):
    """Mirror of ``plans.register`` writing to the staging dict, so a
    promotion is a one-word decorator swap (the staging_r11-r13
    precedent)."""

    def deco(fn):
        STAGED[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


# --- docs_token_drift_tvd -------------------------------------------------

TVD_SCALE = 1_000_000  # ppm share quantization

# Persisted (source, tok) count frame of the LAST invocation
# (graph_eval lifecycle): four subtrees consume it — the comparison
# grid's source totals, the vocabulary totals, the grand total, and
# the left-join probe side. Without the persist, exchange reuse
# covers the re-aggregations but NOT the join side living under a
# BroadcastExchange, so the corpus tokenize+count ran twice
# (observed in the executed plan while staging).
_TVD_COUNTS_PERSISTED: list[DataFrame] = []

_SQL_TVD_TOKS = f"""
    toks AS (
        SELECT source,
               unnest(string_split({textops.SQL_NORM.format(col='text')}, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
        FROM toks GROUP BY source, tok
    ),
    tok_tot AS (
        SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM counts GROUP BY tok
    ),
    src_tot AS (
        SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM counts GROUP BY source
    ),
    grand AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM counts),
    scored AS (
        SELECT f.source, f.t_s, (g.n - f.t_s) AS t_r, f.tok,
               ABS(({TVD_SCALE} * COALESCE(c.c_st, 0)) // f.t_s
                   - ({TVD_SCALE} * (f.c_t - COALESCE(c.c_st, 0)))
                     // GREATEST(g.n - f.t_s, 1)) AS gap
        FROM (SELECT s.source, s.t_s, v.tok, v.c_t
              FROM src_tot s CROSS JOIN tok_tot v) f
        CROSS JOIN grand g
        LEFT JOIN counts c ON c.source = f.source AND c.tok = f.tok
    )
"""


@stage(
    "docs_token_drift_tvd",
    oracle=f"""
    WITH {_SQL_TVD_TOKS},
    agg AS (
        SELECT source, t_s, t_r,
               CAST(SUM(gap) // 2 AS BIGINT) AS tvd_ppm
        FROM scored GROUP BY source, t_s, t_r
    ),
    top AS (
        SELECT source, tok AS top_token, CAST(gap AS BIGINT) AS top_gap_ppm
        FROM (
            SELECT source, tok, gap, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY gap DESC, tok
            ) AS rnk FROM scored
        ) r WHERE rnk = 1
    )
    SELECT a.source,
           a.t_s AS src_tokens, a.t_r AS rest_tokens,
           a.tvd_ppm, t.top_token, t.top_gap_ppm
    FROM agg a JOIN top t USING (source)
    """,
)
def docs_token_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift vs the rest of the corpus:
    (source, src_tokens, rest_tokens, tvd_ppm, top_token,
    top_gap_ppm), where tvd_ppm is the ppm-quantized total-variation
    distance between the source's unigram share distribution and the
    complement's over the FULL corpus vocabulary, and top_token is
    the largest single share gap (ties break on the lexicographically
    smallest token in both engines).

    Exactness: both shares quantize to ppm via 64-bit integer
    division before the comparison — no floats anywhere, so the hash
    gate applies exactly (the sample_weighted_priority precedent; KL
    was rejected because ln() is not cross-engine bit-stable). The
    degenerate single-source corpus clamps the empty complement's
    denominator to 1 (GREATEST), identically on both sides.
    Overflow envelope: {TVD_SCALE} * count stays under 2^63 up to
    ~9.2e12 tokens; past that the shares quantize from a sampled or
    sharded count first (docstring contract, not a silent wrap).

    Scale: the corpus is scanned ONCE and the only corpus-sized
    exchange is the (source, tok) count; the vocabulary totals,
    per-source totals, and grand total all re-aggregate that frame's
    output (map-side combined, vocabulary-sized). The full
    sources x vocab comparison grid is built by broadcasting the
    vocabulary totals across the per-source totals — sources are
    few-hundreds in a real mixture and the grid never touches the
    corpus. At a 100 TB corpus the vocabulary itself is pruned first
    (the corpus_token_coverage curve picks V: tokens below ~1 ppm
    global share contribute zero quantized gap and can be dropped
    exactly), which keeps the grid bounded while changing nothing in
    this plan's shape.

    Measured (BENCH_SCALE, r13): x20 0.54x, x100 0.59x vs DuckDB
    (Spark 1.8 s vs 3.0 s at 500k docs) — under the bar at every
    measured point, Spark ahead once the corpus outgrows the job
    floor."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = docs.select(
        "source",
        F.explode(F.split(textops.norm_text(F.col("text")), " ")).alias("tok"),
    )
    counts = _swap_persisted(
        _TVD_COUNTS_PERSISTED,
        toks.groupBy("source", "tok").agg(F.count("*").alias("c_st")),
    )
    tok_tot = counts.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    src_tot = counts.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    grand = counts.agg(F.sum("c_st").alias("n"))
    grid = src_tot.crossJoin(F.broadcast(tok_tot)).crossJoin(F.broadcast(grand))
    scored = grid.join(counts, ["source", "tok"], "left").select(
        "source",
        "t_s",
        (F.col("n") - F.col("t_s")).alias("t_r"),
        "tok",
        F.abs(
            F.expr(f"({TVD_SCALE} * coalesce(c_st, 0)) div t_s")
            - F.expr(
                f"({TVD_SCALE} * (c_t - coalesce(c_st, 0))) div greatest(n - t_s, 1)"
            )
        ).alias("gap"),
    )
    # min over (-gap, tok) = deterministic argmax: largest gap, then
    # lexicographically smallest token — the oracle's window ordering
    return (
        scored.groupBy("source", "t_s", "t_r")
        .agg(
            F.expr("CAST(sum(gap) div 2 AS BIGINT)").alias("tvd_ppm"),
            F.min(F.struct((-F.col("gap")).alias("ngap"), F.col("tok"))).alias("top"),
        )
        .select(
            "source",
            F.col("t_s").alias("src_tokens"),
            F.col("t_r").alias("rest_tokens"),
            "tvd_ppm",
            F.col("top.tok").alias("top_token"),
            (-F.col("top.ngap")).cast("long").alias("top_gap_ppm"),
        )
    )


# --- emb_pca_top2_deflation -----------------------------------------------

# Import the r13-promoted PCA machinery (cross-module by design: the
# covariance/iteration plan and its oracle CTE builders belong to
# plans/staging_r12.py and are shared with the registered pair; an
# edit there flags the pair in the plan ledger and the full local
# gate backstops this module, the documented cross-module boundary).
from .staging_r12 import (  # noqa: E402
    PCA_ITERS,
    _PCA_S,
    _pca_ctes,
    _pca_matvec_sql,
    _pca_state,
)
from .similarity import DIM  # noqa: E402


def _pca_defl_iter_ctes(dim: int, iters: int) -> str:
    """The same unrolled normalize-multiply chain as _pca_ctes'
    it1..itN, over the DEFLATED matrix (CTEs d0..dN) — one shared
    template so the two recurrences cannot drift."""
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
    dw{k} AS MATERIALIZED (
        SELECT rows, {_pca_matvec_sql('v', dim)} AS w, v FROM d{k - 1}
    ),
    d{k} AS MATERIALIZED (
        SELECT rows,
               CASE WHEN nrm = 0.0 THEN v
                    ELSE list_transform(w, x -> x / nrm) END AS v
        FROM (SELECT rows, w, v,
                     sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                          list_transform(w, x -> x * x)), (a, b) -> a + b)) AS nrm
              FROM dw{k}) t
    )""")
    return ",".join(its)


def _pca2_oracle_sql(dim: int = DIM, iters: int = PCA_ITERS) -> str:
    return f"""
    {_pca_ctes(dim, iters)},
    d0 AS MATERIALIZED (
        SELECT list_transform(range(0, {dim}), i ->
                 list_transform(range(0, {dim}), j ->
                   f.rows[i + 1][j + 1] - s.lam * s.v[i + 1] * s.v[j + 1])) AS rows,
               list_transform(range(0, {dim}), i -> CAST(0.125 AS DOUBLE)) AS v
        FROM fin f, sc s
    ),{_pca_defl_iter_ctes(dim, iters)},
    dfin AS (
        SELECT rows, v, {_pca_matvec_sql('v', dim)} AS wf FROM d{iters}
    ),
    dsc AS (
        SELECT v,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(0, {dim}), i -> v[i + 1] * wf[i + 1])), (a, b) -> a + b) AS lam
        FROM dfin
    )
    SELECT CAST(1 AS BIGINT) AS comp,
           CAST(generate_subscripts(s.v, 1) - 1 AS BIGINT) AS dim,
           CAST(FLOOR(unnest(s.v) * {_PCA_S}) AS BIGINT) AS loading_q,
           CAST(FLOOR(s.lam * {_PCA_S}) AS BIGINT) AS eigenvalue_q,
           CASE WHEN s.trc > 0 THEN CAST(FLOOR(s.lam / s.trc * 1000000.0) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS evr_ppm
    FROM sc s
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           CAST(generate_subscripts(d.v, 1) - 1 AS BIGINT),
           CAST(FLOOR(unnest(d.v) * {_PCA_S}) AS BIGINT),
           CAST(FLOOR(d.lam * {_PCA_S}) AS BIGINT),
           CASE WHEN s.trc > 0 THEN CAST(FLOOR(d.lam / s.trc * 1000000.0) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END
    FROM dsc d, sc s
    """


@stage("emb_pca_top2_deflation", oracle=_pca2_oracle_sql())
def emb_pca_top2_deflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TWO principal components via Hotelling deflation: run the
    registered power iteration to (v1, lambda1), deflate the
    covariance (C2 = C - lambda1 v1 v1^T), and iterate again for
    (v2, lambda2). Output: (comp, dim, loading_q, eigenvalue_q,
    evr_ppm), comp in {{1, 2}} — comp 1 rows are definitionally the
    registered emb_pca_power_iteration's output with the comp column
    prepended (same state frame, same quantization). The eigenBASIS
    extension the eigen family needs next: OPQ rotations, whitening,
    and 2-d embedding maps all consume multiple components, and
    deflation is the in-plan-expressible route to them (one more
    unrolled recurrence per component, no driver state).

    Cross-engine exactness inherits the power-iteration argument
    wholesale: the deflated matrix entries are two multiplies and a
    subtract per cell applied in the same order on both engines
    (lam * v[i] * v[j], left-associated), and the second recurrence
    is the SAME normalize-multiply chain over those bit-identical
    entries. Convergence is the deflation story: the second
    iteration converges at rate (lambda3/lambda2)^k, and residual v1
    components are suppressed by the deflation itself (exactly zero
    eigenvalue along v1 up to the quantized covariance's rounding).

    Scale: identical contract to the parents — the corpus pass is
    the one d^2-key covariance exchange (shared subtree with the
    registered pair, same scaled-long exactness), and BOTH
    recurrences are 1-row work behind the same per-step barriers;
    apply cost for a consumer is a broadcast of (2 x dim + 2)
    doubles. An extra 1-row barrier sits BETWEEN computing
    (lam, trace) and the deflation that consumes them — without it,
    projection collapse inlines lam's O(d^2) aggregate fold into
    each of the d^2 deflated cells (measured: a wall that never
    finished at sf0.001; with the barrier, 13 s cold).

    Measured (BENCH_SCALE, r13): x20 0.26x, x100 0.12x vs DuckDB
    (Spark 4.6 s near-flat vs DuckDB 37.4 s at 200k vectors — the
    doubled unrolled chain costs the single-node engine ~2x its
    single-component wall while Spark's barriers stay 1-row)."""
    vN = f"v{PCA_ITERS}"
    cur = _pca_state(spark, sf_dir)
    # 1-row barrier BETWEEN computing lam/trace and the deflation that
    # consumes them: without it, projection collapse inlines lam's
    # O(d^2) aggregate fold into each of the d^2 deflated cells (the
    # parent entries' documented inlined-expression-recompute hazard —
    # measured here as a wall that never finished at sf0.001)
    state1 = cur.select(
        "rows", F.col(vN).alias("v1"), F.col("lam").alias("lam1"), "trace"
    ).repartition(1)
    # deflate: rows2 = rows - lam * v1 v1^T (left-assoc, oracle order)
    base2 = state1.select(
        F.expr(
            f"transform(sequence(0, {DIM - 1}), i -> transform(sequence(0, {DIM - 1}), j -> "
            "element_at(element_at(rows, i + 1), j + 1) "
            "- lam1 * element_at(v1, i + 1) * element_at(v1, j + 1)))"
        ).alias("rows"),
        "v1",
        "lam1",
        "trace",
    ).repartition(1)
    matvec = (
        f"transform(sequence(0, {DIM - 1}), i -> aggregate(sequence(0, {DIM - 1}), "
        "CAST(0.0 AS DOUBLE), "
        "(acc, j) -> acc + element_at(element_at(rows, i + 1), j + 1) * element_at({v}, j + 1)))"
    )
    cur2 = base2.withColumn(
        "d0", F.expr(f"transform(sequence(0, {DIM - 1}), i -> CAST(0.125 AS DOUBLE))")
    )
    for k in range(1, PCA_ITERS + 1):
        cur2 = (
            cur2.withColumn(f"w{k}", F.expr(matvec.format(v=f"d{k - 1}")))
            .withColumn(
                f"n{k}",
                F.expr(
                    f"sqrt(aggregate(w{k}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
                ),
            )
            .withColumn(
                f"d{k}",
                F.expr(
                    f"CASE WHEN n{k} = 0.0 THEN d{k - 1} ELSE transform(w{k}, x -> x / n{k}) END"
                ),
            )
            .select("rows", "v1", "lam1", "trace", f"d{k}")
            .repartition(1)  # per-step 1-row barrier (parent docstring)
        )
    dN = f"d{PCA_ITERS}"
    state = (
        cur2.withColumn("wf", F.expr(matvec.format(v=dN)))
        .withColumn(
            "lam2",
            F.expr(
                f"aggregate(sequence(0, {DIM - 1}), CAST(0.0 AS DOUBLE), "
                f"(acc, i) -> acc + element_at({dN}, i + 1) * element_at(wf, i + 1))"
            ),
        )
        .select("v1", "lam1", F.col(dN).alias("v2"), "lam2", "trace")
    )
    dims = spark.range(DIM).select(F.col("id").cast("long").alias("dim"))
    grid = dims.crossJoin(F.broadcast(state))

    def comp_rows(comp: int, v: str, lam: str):
        return grid.select(
            F.lit(comp).cast("long").alias("comp"),
            "dim",
            F.floor(
                F.expr(f"element_at({v}, CAST(dim AS INT) + 1)") * F.lit(1e9)
            )
            .cast("long")
            .alias("loading_q"),
            F.floor(F.col(lam) * F.lit(1e9)).cast("long").alias("eigenvalue_q"),
            F.when(
                F.col("trace") > 0,
                F.floor(F.col(lam) / F.col("trace") * F.lit(1e6)),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("evr_ppm"),
        )

    return comp_rows(1, "v1", "lam1").unionByName(comp_rows(2, "v2", "lam2"))


# --- sim_ivf_pq_adc_prebuilt (index-as-data experiment, r14) --------------

# The r13 _reuse_or_swap lifecycle amortizes the PQ index build
# (codeword training + corpus code assignment — ~27 s of the adc
# entry's 27.3 s x500 wall) across invocations WITHIN a session. This
# experiment takes the design to its production conclusion (the r13
# VERDICT task-6 suggestion): materialize the index AS LAKE TABLES —
# centroids, codewords, and the corpus codes written as parquet by an
# explicit build step — so even a COLD session pays only the search.
# faiss writes its index to disk for exactly this reason; in Spark the
# natural encoding is "the index is data":
#
# - codes are written PARTITIONED BY label (the IVF cell): the
#   inverted-list file layout. The probed-cell restriction then
#   becomes storage-level partition pruning — a query that probes 2 of
#   k cells never reads the other cells' files at all, which at 100 TB
#   is the difference between scanning the corpus-codes table and
#   scanning nprobe/k of it. (In-session the same restriction is a
#   broadcast semi-filter AFTER the scan.)
# - codewords / centroids are kilobyte tables; they broadcast.
#
# Build cost is paid once per ingest batch (the faiss add() contract),
# publish is atomic (staging dir + rename, the bucketed-layout
# protocol), and the tag fingerprints the embeddings file AND the
# construction source so neither a regenerated lake nor drifted build
# code can ever serve a stale index.
#
# Root (r14 ADVICE, r14 VERDICT task 5): per-user and env-overridable,
# NOT a fixed world-writable /tmp path — a shared predictable root let
# any local user pre-create a tag dir and poison the manifest, and
# made makedirs fail when another uid owned it. The default lives
# under tempdir with a uid suffix and 0o700; deployments point
# SPARK_GRAFT_PQ_INDEX_ROOT at a lake-adjacent durable path (the
# bucketed warehouse precedent).
_PQ_ROOT_ENV = "SPARK_GRAFT_PQ_INDEX_ROOT"
# bumped whenever the published layout gains/changes tables (v2 added
# the residual codebook + residual codes); part of the tag, so stale
# layouts are simply orphaned, never half-read
_PQ_INDEX_VERSION = 2


def _pq_index_root() -> str:
    """Resolve (and create, 0o700) the index root. Refuses a root
    owned by another uid: a poisoned pre-created root must fail loudly
    rather than serve someone else's manifests."""
    import os as _os
    import tempfile as _tempfile

    root = _os.environ.get(_PQ_ROOT_ENV)
    if not root:
        uid = _os.getuid() if hasattr(_os, "getuid") else "win"
        root = _os.path.join(
            _tempfile.gettempdir(), f"noaa_spark_pq_index_{uid}"
        )
    _os.makedirs(root, mode=0o700, exist_ok=True)
    if hasattr(_os, "getuid"):
        st = _os.stat(root)
        if st.st_uid != _os.getuid():
            raise RuntimeError(
                f"PQ index root {root!r} is owned by uid {st.st_uid}, "
                f"not {_os.getuid()} — refusing to trust its manifests "
                f"(set {_PQ_ROOT_ENV} to a directory you own)"
            )
    return root


# Computed once per process: the construction-source fingerprint that
# rides the tag (r14 ADVICE). The published dir outlives the session
# AND the commit that built it, so the tag must change whenever the
# build ALGORITHM changes — not only when _PQ_INDEX_VERSION is
# remembered to be bumped. plan_source_digest already walks the
# transitive same-module closure (helpers + referenced constants), so
# hashing it for build_pq_index plus the cross-module similarity
# helpers it composes (and staging_r11.RESID_CODES, reached via a
# function-local import the closure walk cannot see) covers every
# constant that shapes the stored bytes: PQ_M/PQ_SUBDIM/_DEC inside
# the similarity closures, RESID_CODES explicitly.
_PQ_CODE_DIGEST: list[str] = []


def _pq_index_code_digest() -> str:
    import hashlib as _hashlib

    if _PQ_CODE_DIGEST:
        return _PQ_CODE_DIGEST[0]
    try:
        from tools.plan_ledger import plan_source_digest
    except ImportError:  # deployed without the repo's tools/ package
        import inspect as _inspect

        def plan_source_digest(fn):  # entry-fn source only: weaker but safe
            return _hashlib.sha256(
                _inspect.getsource(fn).encode()
            ).hexdigest()[:16]

    from . import staging_r11 as _s11
    from . import similarity as _sim

    parts = [f"RESID_CODES={_s11.RESID_CODES}"]
    for fn in (
        build_pq_index,
        _sim._pq_subvectors,
        _sim._pq_codewords,
        _sim._pq_best_codes,
        _sim._centroid_vectors,
        _sim._sqdist,
        _sim._embeddings,
    ):
        parts.append(plan_source_digest(fn))
    h = _hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
    _PQ_CODE_DIGEST.append(h)
    return h


def _pq_lake_base(sf_dir: str) -> str:
    import re as _re

    return _re.sub(r"[^a-z0-9]+", "_", sf_dir.strip("/").split("/")[-1].lower())


def _pq_index_tag(sf_dir: str) -> str:
    """Cache key: lake basename + hash of (full path, file count,
    total bytes, max mtime) of the embeddings parquet — the
    _bucket_tag recipe (plans/scale.py) — folded with the layout
    version AND the construction-source digest, so lake regeneration
    and build-code drift each orphan the published dir automatically."""
    import glob as _glob
    import hashlib as _hashlib
    import os as _os

    base = _pq_lake_base(sf_dir)
    n_files, total, mtime = 0, 0, 0.0
    for p in _glob.glob(_os.path.join(sf_dir, "embeddings*")):
        paths = (
            [
                q
                for q in _glob.glob(_os.path.join(p, "**", "*"), recursive=True)
                if _os.path.isfile(q)
            ]
            if _os.path.isdir(p)
            else [p]
        )
        for q in paths:
            st = _os.stat(q)
            n_files += 1
            total += st.st_size
            mtime = max(mtime, st.st_mtime)
    fp = _hashlib.sha256(
        f"{_os.path.abspath(sf_dir)}|{n_files}|{total}|{mtime}"
        f"|v{_PQ_INDEX_VERSION}|code{_pq_index_code_digest()}".encode()
    ).hexdigest()[:12]
    return f"{base}_{fp}"


def _read_pq_manifest(tag: str) -> dict | None:
    """Manifest of a published index dir, or None when absent or
    unreadable/mismatched (a half-deleted or foreign dir reads as
    no index — the bucketed half-deleted-layout rule)."""
    import json as _json
    import os as _os

    path = _os.path.join(_pq_index_root(), tag, "manifest.json")
    try:
        with open(path) as fh:
            m = _json.load(fh)
    except (OSError, ValueError):
        return None
    if m.get("tag") != tag or m.get("version") != _PQ_INDEX_VERSION:
        return None
    return m


def build_pq_index(
    spark: SparkSession, sf_dir: str, declare: bool | None = None
) -> str:
    """Explicit PQ index BUILD step: train codewords, assign corpus
    codes, and publish {centroids, codewords, codes} as parquet under
    a content-fingerprinted directory. Idempotent attach: if the tag
    is already published, returns immediately without a job. The
    build persists the subvector explode (three consumers) for the
    duration of the write and unpersists after — the one-time ingest
    cost the prebuilt search amortizes across sessions.

    ``declare`` marks the manifest as a DECLARED serving index (the
    bucketed warehouse:true precedent, plans/scale.py): only declared
    indexes flip env-unset routing in :func:`pq_index_available`, so
    an INCIDENTAL build (a fuzz test, a one-off staged run) never
    changes which physical plan a later cold session executes.
    Default: declared iff SPARK_GRAFT_PQ_INDEX=1 (the warehouse
    profile). A successful publish also garbage-collects orphans —
    same-lake dirs with a different fingerprint, wrong-version or
    wrong-code-digest layouts, abandoned staging dirs — bounding the
    root's growth (r14 VERDICT task 5)."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from pyspark.sql import Window as _Window

    from .similarity import (
        _DEC,
        _centroid_vectors,
        _embeddings,
        _pq_best_codes,
        _pq_codewords,
        _pq_subvectors,
        _sqdist,
    )
    from .staging_r11 import RESID_CODES

    if declare is None:
        declare = _os.environ.get("SPARK_GRAFT_PQ_INDEX") == "1"
    root = _pq_index_root()
    tag = _pq_index_tag(sf_dir)
    final = _os.path.join(root, tag)
    existing = _read_pq_manifest(tag)
    if existing is not None:
        if declare and not existing.get("declared"):
            # durable declaration upgrade without a rebuild: atomic
            # manifest swap (write-new + rename) inside the published
            # dir, so concurrent readers see old-or-new, never half
            existing["declared"] = True
            tmp = _os.path.join(final, ".manifest.json.tmp")
            with open(tmp, "w") as fh:
                _json.dump(existing, fh)
            _os.replace(tmp, _os.path.join(final, "manifest.json"))
        return final
    staging = _os.path.join(root, f".build_{tag}_{_os.getpid()}")
    _shutil.rmtree(staging, ignore_errors=True)
    _os.makedirs(staging, exist_ok=True)
    emb = _embeddings(spark, sf_dir)
    sub = _pq_subvectors(emb).persist()
    codewords = _pq_codewords(sub).persist()
    cvecs = _centroid_vectors(emb).persist()
    # residual half (v2): the same expression construction as the
    # registered sim_ivf_pq_residual_search index frames, so the
    # parquet round-trip stays bit-identical to the in-session entry
    resid = emb.join(F.broadcast(cvecs), "label").select(
        "vec_id",
        "label",
        (F.col("vec_id") % RESID_CODES).alias("ckey"),
        F.zip_with("emb", "cvec", lambda x, c: x - c).alias("emb"),
    )
    rsub = (
        _pq_subvectors(resid)
        .withColumn("ckey", F.col("vec_id") % RESID_CODES)
        .persist()
    )
    rcomps = rsub.select("s", "ckey", F.posexplode("svec").alias("dim", "val"))
    rcodebook = rcomps.groupBy("s", F.col("ckey").alias("code"), "dim").agg(
        (
            F.sum(F.col("val").cast(_DEC)).cast("string").cast("double")
            / F.count("*")
        ).alias("cval")
    )
    rcodewords = rcodebook.groupBy("s", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))),
            lambda st: st["cval"],
        ).alias("cw")
    ).persist()
    rdists = rsub.join(F.broadcast(rcodewords), "s").select(
        "vec_id",
        "label",
        "s",
        "code",
        _sqdist(F.col("svec"), F.col("cw")).alias("d"),
    )
    rw = _Window.partitionBy("vec_id", "s").orderBy("d", "code")
    rcodes = (
        rdists.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code", "label")
    )
    try:
        cvecs.write.parquet(_os.path.join(staging, "centroids"))
        codewords.write.parquet(_os.path.join(staging, "codewords"))
        rcodewords.write.parquet(_os.path.join(staging, "resid_codewords"))
        # inverted-list layout: one partition dir per IVF cell, so the
        # probed-cell join prunes at the file level (see module note)
        (
            _pq_best_codes(sub)
            .select("vec_id", "s", "code", "label")
            .write.partitionBy("label")
            .parquet(_os.path.join(staging, "codes"))
        )
        rcodes.write.partitionBy("label").parquet(
            _os.path.join(staging, "resid_codes")
        )
        with open(_os.path.join(staging, "manifest.json"), "w") as fh:
            _json.dump(
                {
                    "sf_dir": _os.path.abspath(sf_dir),
                    "tag": tag,
                    "version": _PQ_INDEX_VERSION,
                    "code_digest": _pq_index_code_digest(),
                    "declared": bool(declare),
                },
                fh,
            )
        try:
            _os.rename(staging, final)
        except OSError:
            # lost the publish race to a concurrent builder: keep the
            # winner's complete index (rename onto an existing
            # non-empty dir fails on POSIX — unlike file renames, so
            # link(2) is not needed here)
            _shutil.rmtree(staging, ignore_errors=True)
    finally:
        for frame in (sub, codewords, cvecs, rsub, rcodewords):
            frame.unpersist()
    _gc_pq_index_root(keep_tag=tag, lake_base=_pq_lake_base(sf_dir))
    return final


def declare_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (if absent) and durably DECLARE the lake's serving index:
    after this, a cold env-unset session routes the registered IVFPQ
    searches through the materialized layout — the declare_warehouse
    twin (plans/scale.py) for the vector index."""
    return build_pq_index(spark, sf_dir, declare=True)


def pq_index_available(spark: SparkSession, sf_dir: str) -> bool:
    """Index-layout router predicate (the bucketed_lake_available
    ladder, plans/scale.py):

    1. ``SPARK_GRAFT_PQ_INDEX=1`` — warehouse profile: route through
       the materialized index; the first consumer builds/publishes it
       via :func:`build_pq_index`.
    2. ``SPARK_GRAFT_PQ_INDEX=0`` — pin the in-session build (the
       correctness gates set this leg explicitly so oracle evidence
       deterministically covers the un-routed plans).
    3. env unset — route iff a DECLARED manifest for this exact lake
       fingerprint + construction-source digest exists on disk. An
       incidental (undeclared) publish never flips routing; a
       declared one serves cold sessions with search-only cost.
    """
    import os as _os

    env = _os.environ.get("SPARK_GRAFT_PQ_INDEX")
    if env == "1":
        return True
    if env == "0":
        return False
    m = _read_pq_manifest(_pq_index_tag(sf_dir))
    return bool(m and m.get("declared"))


# staging dirs older than this are abandoned (a crashed builder's pid
# may have been recycled, so age — not liveness — is the tombstone)
_PQ_GC_STAGING_AGE_S = 3600.0


def _gc_pq_index_root(keep_tag: str, lake_base: str) -> None:
    """Prune orphans under the index root after a successful publish:

    - same-lake dirs (``{lake_base}_*``) whose tag differs from the
      one just published — superseded by lake regeneration or build-
      code drift (the content tag makes them unreachable anyway);
    - any published dir whose manifest is missing, unreadable, or
      carries a stale version / construction digest — unreachable by
      every current reader (:func:`_read_pq_manifest` rejects them);
    - abandoned ``.build_*`` staging dirs older than an hour.

    Never touches the just-published ``keep_tag`` or other lakes'
    current-version dirs (sf0.001/sf0.01/sf0.1 coexist)."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import time as _time

    root = _pq_index_root()
    now = _time.time()
    for name in _os.listdir(root):
        path = _os.path.join(root, name)
        if name == keep_tag or not _os.path.isdir(path):
            continue
        if name.startswith(".build_"):
            try:
                age = now - _os.stat(path).st_mtime
            except OSError:
                continue
            if age > _PQ_GC_STAGING_AGE_S:
                _shutil.rmtree(path, ignore_errors=True)
            continue
        try:
            with open(_os.path.join(path, "manifest.json")) as fh:
                m = _json.load(fh)
        except (OSError, ValueError):
            m = None
        stale = (
            m is None
            or m.get("tag") != name
            or m.get("version") != _PQ_INDEX_VERSION
            or m.get("code_digest") != _pq_index_code_digest()
            # source lake gone (fuzz tmp dirs): the content tag can
            # never be recomputed to reach this dir again
            or not _os.path.isdir(m.get("sf_dir", ""))
        )
        if stale or name.startswith(f"{lake_base}_"):
            _shutil.rmtree(path, ignore_errors=True)


# Attached index frames, keyed by (applicationId, published dir):
# re-attaching the same static index on every construction would
# re-read the parquet footers (three driver jobs per call — the
# laziness test catches it); the published dir is immutable once the
# manifest exists, so the DataFrames are safely reusable for the
# session's lifetime. Bounded: one published dir per lake fingerprint.
_PQ_ATTACH_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def _attach_pq_index(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    import os as _os

    idx = build_pq_index(spark, sf_dir)
    key = (spark.sparkContext.applicationId, idx)
    cached = _PQ_ATTACH_CACHE.get(key)
    if cached is None:
        cached = {
            name: spark.read.parquet(_os.path.join(idx, name))
            for name in (
                "codes",
                "codewords",
                "centroids",
                "resid_codewords",
                "resid_codes",
            )
        }
        _PQ_ATTACH_CACHE[key] = cached
    return cached


@stage(
    "sim_ivf_pq_adc_prebuilt",
    oracle=None,  # set below: byte-for-byte the registered adc oracle
)
def sim_ivf_pq_adc_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_ivf_pq_adc_search semantics over the MATERIALIZED index:
    reads centroids/codewords/codes from the published parquet index
    (building it first if absent) and runs only the search — probe
    ranking, query ADC tables, the probed-cell candidate scan, top-k.
    Output is bit-identical to the in-session entry (doubles
    round-trip parquet exactly; the code/cell integers trivially so),
    so it shares that entry's DuckDB oracle verbatim.

    Scale story vs the in-session entry: identical search plan, but
    the candidate scan reads the inverted-list layout, so the
    probed-cell restriction prunes unread cells at the FILE level and
    a cold session pays index-scan-not-index-build. Numbers in
    GATE_LOG (r14 index-as-data comparison)."""
    from .similarity import (
        NPROBE,
        N_QUERIES,
        TOP_K,
        _embeddings,
        _pq_subvectors,
        _sqdist,
        _sqdist_dbl,
    )
    from pyspark.sql import Window

    tables = _attach_pq_index(spark, sf_dir)
    codes, codewords, cvecs = (
        tables["codes"],
        tables["codewords"],
        tables["centroids"],
    )
    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
    )
    cellrank = q.crossJoin(F.broadcast(cvecs)).select(
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
        _pq_subvectors(emb.filter(F.col("vec_id") < N_QUERIES))
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


@stage(
    "sim_ivf_pq_residual_prebuilt",
    oracle=None,  # set below: byte-for-byte the registered residual oracle
)
def sim_ivf_pq_residual_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_ivf_pq_residual_search semantics over the MATERIALIZED
    index (the v2 layout adds resid_codewords + resid_codes, the
    latter as inverted lists): probe ranking against the stored
    centroids, per-(query, cell) residual ADC tables against the
    stored residual codebook, candidate scan over the resid_codes
    partitions with the probed-cell restriction pruning at the file
    level. Bit-identical to the in-session entry (same construction,
    doubles round-trip parquet exactly) — shares its DuckDB oracle
    verbatim. The residual completion of sim_ivf_pq_adc_prebuilt."""
    from .similarity import (
        NPROBE,
        N_QUERIES,
        TOP_K,
        _embeddings,
        _pq_subvectors,
        _sqdist,
        _sqdist_dbl,
    )
    from pyspark.sql import Window

    tables = _attach_pq_index(spark, sf_dir)
    cvecs, rcodewords, rcodes = (
        tables["centroids"],
        tables["resid_codewords"],
        tables["resid_codes"],
    )
    emb = _embeddings(spark, sf_dir)
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
        rcodes.join(
            F.broadcast(qdist),
            (rcodes.label == qdist.cell)
            & (rcodes.s == qdist.s)
            & (rcodes.code == qdist.code),
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


def _adopt_parent_oracles() -> None:
    """The prebuilt searches answer their registered in-session
    parents' oracles byte-for-byte (same semantics, same ranking
    hops); adopting them lazily avoids an import cycle with the
    registry."""
    from . import REGISTRY
    from . import staging_r11 as _s11  # noqa: F401 - ensures registration

    for staged_name, parent in (
        ("sim_ivf_pq_adc_prebuilt", "sim_ivf_pq_adc_search"),
        ("sim_ivf_pq_residual_prebuilt", "sim_ivf_pq_residual_search"),
    ):
        q = STAGED[staged_name]
        STAGED[staged_name] = Query(
            name=q.name,
            fn=q.fn,
            oracle=REGISTRY[parent].oracle,
            doc=q.doc,
        )


_adopt_parent_oracles()
