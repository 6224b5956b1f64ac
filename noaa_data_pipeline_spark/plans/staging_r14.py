"""Round-14 candidate: staged, not registered.

One new curation operator following the r9-r13 staging protocol
(DuckDB oracle + driver-gate-equivalent pytest compare + independent
third implementation + differential fuzz + laziness + plan-shape)
before any registry promotion:

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

Reference anchors (spec, not code): extends SURVEY.md's curation /
mixtures family (docs_domain_mixture_resample,
source_curation_report precedents), like the round-5-13 additions it
follows.
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
    this plan's shape."""
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
