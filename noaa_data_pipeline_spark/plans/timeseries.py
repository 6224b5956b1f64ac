"""Time-series operator coverage (SURVEY §2.4-§2.5) on the ``events``
stream table.

These re-express the reference's weather rollup/flattening/scoring
machinery as declarative Spark plans over the driver's generic
``events`` table (user_id ≈ station_id, ts ≈ begin_time, value ≈
reading). The weather-schema versions of the same operators live in
the ``weather/`` package (flatten.py, queries.py, etl.py); here the
shapes are wired to the oracle gate.

Determinism notes: rounding uses FLOOR(x + 0.5) — identical in both
engines, unlike ROUND whose half-way tie rule differs; every window
order includes the unique event_id as a final tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register
from .common import SCALE


@register(
    "events_daily_rollup_two_level",
    oracle="""
    SELECT user_id, date,
           MIN(start_time) AS start_time, MAX(end_time) AS end_time,
           MIN(v_lo) AS v_lo, MAX(v_hi) AS v_hi,
           CAST(SUM(n_obs) AS BIGINT) AS n_obs
    FROM (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS date,
               MIN(CAST(ts AS TIMESTAMP)) AS start_time,
               MAX(CAST(ts AS TIMESTAMP)) AS end_time,
               MIN(value) AS v_lo, MAX(value) AS v_hi,
               COUNT(*) AS n_obs
        FROM events
        GROUP BY user_id, ts
    ) hourly
    GROUP BY user_id, date
    """,
)
def events_daily_rollup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level daily rollup — the reference's flagship forecast
    query A1 (oracle/src/db/weather_data.rs:92-146): inner GROUP BY
    (key, ts) dedupes across hourly snapshot files, outer GROUP BY
    (key, day) computes the daily min/max. Scale: both aggregations
    run from ONE raw exchange: the scan repartitions by user_id, and
    hash partitioning on a PREFIX of each level's group keys
    satisfies both aggregates' clustering requirements, so the
    (user_id, ts) dedup, the date projection, and the (user_id, date)
    rollup chain in a single post-shuffle codegen span with no second
    exchange (same prefix-partitioning argument as q21). Trade-off,
    measured both ways at sf0.1: this shape moves each raw row once
    (0.20 s) where the groupBy-then-groupBy twin moves combined rows
    twice (0.38 s) — the right choice while the (key, ts) dedup
    factor is near 1, as here and in any append-once lake. On a lake
    of hourly re-reported snapshots (dedup factor >> 1) flip back to
    the two-shuffle twin: its map-side combine shrinks the first
    exchange by the re-report factor, which then dominates."""
    ev = load_table(spark, sf_dir, "events").repartition("user_id")
    hourly = (
        ev.groupBy("user_id", "ts")
        .agg(
            F.min("ts").alias("start_time"),
            F.max("ts").alias("end_time"),
            F.min("value").alias("v_lo"),
            F.max("value").alias("v_hi"),
            F.count("*").alias("n_obs"),
        )
        .withColumn("date", F.date_trunc("day", F.col("ts")))
    )
    return (
        hourly.groupBy("user_id", "date")
        .agg(
            F.min("start_time").alias("start_time"),
            F.max("end_time").alias("end_time"),
            F.min("v_lo").alias("v_lo"),
            F.max("v_hi").alias("v_hi"),
            F.sum("n_obs").alias("n_obs"),
        )
    )


@register(
    "events_user_window_agg",
    oracle="""
    SELECT user_id,
           MIN(CAST(ts AS TIMESTAMP)) AS start_time,
           MAX(CAST(ts AS TIMESTAMP)) AS end_time,
           MIN(value) AS v_min, MAX(value) AS v_max,
           COUNT(*) AS n_obs
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    GROUP BY user_id
    """,
)
def events_user_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key aggregate over a time-range filter — the reference's
    observation daily aggregate A2 (weather_data.rs:172-211),
    including its half-open generated_at range P3. Scale: the time
    predicate prunes row groups via parquet min/max stats before any
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
        )
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("start_time"),
            F.max("ts").alias("end_time"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.count("*").alias("n_obs"),
        )
    )


@register(
    "events_forward_fill",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           last_value(pv IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM events
    ) sparse
    """,
)
def events_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill of a sparse reading — the reference's
    ``prev_weather_data`` carry-forward W1
    (daemon/src/domains/forecasts/download_forecast.rs:333-334,431-571)
    expressed as last(ignorenulls) over an unbounded-preceding row
    window. Scale: one shuffle on the partition key; no Python, no
    state — whole-stage codegen'd window."""
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.withColumn(
        "pv", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return sparse.select(
        "event_id",
        "user_id",
        "ts",
        F.last("pv", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "events_time_grid_3h",
    oracle="""
    SELECT user_id,
           unnest(generate_series(d0, d1 + INTERVAL 1 DAY, INTERVAL 3 HOUR)) AS grid_ts
    FROM (
        SELECT user_id,
               date_trunc('day', MIN(CAST(ts AS TIMESTAMP))) AS d0,
               date_trunc('day', MAX(CAST(ts AS TIMESTAMP))) AS d1
        FROM events GROUP BY user_id
    ) bounds
    """,
)
def events_time_grid_3h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular 3-hour grid generation per key — the reference's
    forecast grid W3 (download_forecast.rs:792-829) via
    sequence()+explode instead of a procedural loop. Scale: the grid
    is generated from one aggregated row per key, so the explode
    fan-out is bounded and shuffle-free."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    return bounds.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d0"),
                F.col("d1") + F.expr("interval 1 day"),
                F.expr("interval 3 hours"),
            )
        ).alias("grid_ts"),
    )


@register(
    "events_asof_view_before_purchase",
    oracle="""
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
           CAST(v.ts AS TIMESTAMP) AS matched_ts,
           v.value AS matched_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def events_asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase aligned to the latest view at-or-
    before it — the reference's interval/as-of lookup W2
    (download_forecast.rs:573-589). Spark lacks ASOF JOIN, so this is
    the scalable union+window formulation: tag both sides, sort by
    (ts, side-priority), forward-fill the build side, keep the probe
    side. One shuffle, no per-group pandas, survives arbitrarily
    large sides (vs. a range join's quadratic blow-up)."""
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "view", F.lit(0)).otherwise(F.lit(1)).alias("prio"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("v_ts"),
        F.when(F.col("event_type") == "view", F.col("value")).alias("v_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "prio", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = both.select(
        "event_id",
        "user_id",
        "ts",
        "prio",
        F.last("v_ts", ignorenulls=True).over(w).alias("matched_ts"),
        F.last("v_value", ignorenulls=True).over(w).alias("matched_value"),
    )
    return filled.filter(F.col("prio") == 1).select(
        "event_id", "user_id", "ts", "matched_ts", "matched_value"
    )


# --- scoring (A6) + winners (W4): shared plan builder -----------------

_SCORING_ORACLE_CTE = f"""
    WITH daily AS (
        SELECT user_id,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS date,
               CAST(FLOOR(CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(FLOOR(value * {SCALE}) AS BIGINT) END) AS DOUBLE) / {SCALE}.0
                    / COUNT(CASE WHEN event_type = 'view' THEN 1 END) + 0.5) AS BIGINT) AS forecast_v,
               CAST(FLOOR(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(FLOOR(value * {SCALE}) AS BIGINT) END) AS DOUBLE) / {SCALE}.0
                    / COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) + 0.5) AS BIGINT) AS observed_v
        FROM events
        GROUP BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
    ),
    points AS (
        SELECT user_id,
               CASE
                 WHEN user_id % 3 = 0 AND forecast_v = observed_v THEN 20
                 WHEN user_id % 3 = 1 AND forecast_v < observed_v THEN 10
                 WHEN user_id % 3 = 2 AND forecast_v > observed_v THEN 10
                 ELSE 0
               END AS pts
        FROM daily
        WHERE forecast_v IS NOT NULL AND observed_v IS NOT NULL
    ),
    scored AS (
        SELECT user_id,
               CAST(SUM(pts) AS BIGINT) AS score,
               CAST(SUM(pts) * 10000 + (9999 - user_id % 10000) AS BIGINT) AS total
        FROM points GROUP BY user_id
    )
"""


def _scoring_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outcome scoring — the reference's entry-scoring aggregate A6
    (oracle/src/oracle.rs:445-588): compare a 'forecast' series
    against an 'observed' series per (key, day), award 20 points for
    an exact (par) hit and 10 for a correct over/under call, then a
    creation-time tiebreak term (base*10000 + (9999 - t % 10000)).
    The pick here is derived deterministically from user_id % 3;
    rounding is FLOOR(x+0.5), matching the reference's f64→i64 round
    (F5). Scale: one raw exchange on user_id serves BOTH aggregation
    levels (prefix partitioning satisfies (user_id, date) and then
    (user_id) — same argument as the daily rollup); the conditional
    aggregates avoid any pivot shuffle. The map-combine twin
    (groupBy straight off the scan) pays a second exchange and only
    wins when many rows collapse per (user, day) — at this lake's
    ~linear cardinality the single-exchange form measured 2x faster."""
    ev = load_table(spark, sf_dir, "events").repartition("user_id")

    def cond_avg_rounded(event_type: str, alias: str):
        cond = F.when(F.col("event_type") == event_type, F.col("value"))
        # scaled-long exact sum (see plans/common.py) — associative,
        # so the partitioned aggregate matches the oracle bit-for-bit
        avg = (F.sum(F.floor(cond * SCALE).cast("long")).cast("double") / SCALE) / F.count(cond)
        return F.floor(avg + F.lit(0.5)).cast("long").alias(alias)

    daily = (
        ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("date"))
        .agg(
            cond_avg_rounded("view", "forecast_v"),
            cond_avg_rounded("purchase", "observed_v"),
        )
        .filter(F.col("forecast_v").isNotNull() & F.col("observed_v").isNotNull())
    )
    pick = F.col("user_id") % 3
    pts = (
        F.when((pick == 0) & (F.col("forecast_v") == F.col("observed_v")), 20)
        .when((pick == 1) & (F.col("forecast_v") < F.col("observed_v")), 10)
        .when((pick == 2) & (F.col("forecast_v") > F.col("observed_v")), 10)
        .otherwise(0)
    )
    return (
        daily.select("user_id", pts.alias("pts"))
        .groupBy("user_id")
        .agg(F.sum("pts").alias("score"))
        .select(
            "user_id",
            F.col("score").cast("long").alias("score"),
            (F.col("score") * 10000 + (F.lit(9999) - F.col("user_id") % 10000))
            .cast("long")
            .alias("total"),
        )
    )


@register(
    "events_outcome_scoring",
    oracle=_SCORING_ORACLE_CTE + "SELECT user_id, score, total FROM scored",
)
def events_outcome_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scoring_plan(spark, sf_dir)


@register(
    "events_top3_winners",
    oracle=_SCORING_ORACLE_CTE
    + """
    , ranked AS (
        SELECT user_id, total,
               ROW_NUMBER() OVER (ORDER BY total DESC, user_id) AS rank,
               ROW_NUMBER() OVER (ORDER BY user_id) AS canonical_idx
        FROM scored
    )
    SELECT user_id, total, rank, canonical_idx FROM ranked
    WHERE rank <= 3
    """,
)
def events_top3_winners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 winner selection with canonical-order indices — the
    reference's attestation ranking W4 (oracle/src/oracle.rs:598-617):
    rank by score desc, report each winner's index in the id-sorted
    canonical list. Scale: ranking runs over the already-aggregated
    per-key frame (tiny), not the fact table; single-partition window
    is fine at that cardinality."""
    scored = _scoring_plan(spark, sf_dir)
    w_rank = Window.orderBy(F.desc("total"), F.asc("user_id"))
    w_canon = Window.orderBy("user_id")
    return (
        scored.select(
            "user_id",
            "total",
            F.row_number().over(w_rank).alias("rank"),
            F.row_number().over(w_canon).alias("canonical_idx"),
        )
        .filter(F.col("rank") <= 3)
    )


@register(
    "events_linear_interpolate",
    oracle="""
    WITH marked AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM events
    ),
    bounds AS (
        SELECT event_id, user_id, ts, pv,
               last_value(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               last_value(CASE WHEN pv IS NOT NULL THEN ts END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
               first_value(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               first_value(CASE WHEN pv IS NOT NULL THEN ts END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
        FROM marked
    )
    SELECT event_id, user_id, ts,
           CASE
             WHEN pv IS NOT NULL THEN pv
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             WHEN next_t = prev_t THEN prev_v
             ELSE prev_v + (next_v - prev_v)
                  * (epoch(ts) - epoch(prev_t)) / (epoch(next_t) - epoch(prev_t))
           END AS interp_value
    FROM bounds
    """,
)
def events_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of a sparse series: each row takes the
    straight line between its surrounding non-null readings (ends
    clamp to the nearest reading). The forward/backward bounds are
    two mirrored last/first(ignorenulls) windows; the interpolation
    arithmetic is per-row (order-free, engine-identical). Scale: one
    shuffle on the key, two window passes."""
    ev = load_table(spark, sf_dir, "events")
    marked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    pv_t = F.when(F.col("pv").isNotNull(), F.col("ts"))
    bounds = marked.select(
        "event_id",
        "user_id",
        "ts",
        "pv",
        F.last("pv", ignorenulls=True).over(fwd).alias("prev_v"),
        F.last(pv_t, ignorenulls=True).over(fwd).alias("prev_t"),
        F.first("pv", ignorenulls=True).over(bwd).alias("next_v"),
        F.first(pv_t, ignorenulls=True).over(bwd).alias("next_t"),
    )
    # timestamp->double keeps fractional seconds (unix_timestamp
    # truncates to whole seconds and would diverge from epoch())
    frac = (F.col("ts").cast("double") - F.col("prev_t").cast("double")) / (
        F.col("next_t").cast("double") - F.col("prev_t").cast("double")
    )
    interp = (
        F.when(F.col("pv").isNotNull(), F.col("pv"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_t") == F.col("prev_t"), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return bounds.select("event_id", "user_id", "ts", interp.alias("interp_value"))


@register(
    "events_value_histogram",
    oracle="""
    WITH stats AS (
        SELECT MIN(value) AS v_min, MAX(value) AS v_max FROM events
    )
    SELECT CAST(CASE WHEN v_max = v_min THEN 0
                ELSE LEAST(FLOOR((value - v_min) / ((v_max - v_min) / 20)), 19)
                END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS bucket_min, MAX(value) AS bucket_max
    FROM events, stats
    GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram with data-driven bounds: the
    min/max come from a broadcast scalar aggregate, bucketing is a
    per-row floor (engine-identical arithmetic). Scale: two passes —
    a tiny stats aggregate then one map-side bucket assignment +
    combine; no sort."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(F.min("value").alias("v_min"), F.max("value").alias("v_max"))
    width = (F.col("v_max") - F.col("v_min")) / 20
    # degenerate-range guard: all-equal values would divide by zero
    # (NULL in Spark, inf/NaN in DuckDB — the engines disagree);
    # collapse that case to bucket 0 on both sides
    bucket = (
        F.when(F.col("v_max") == F.col("v_min"), F.lit(0))
        .otherwise(F.least(F.floor((F.col("value") - F.col("v_min")) / width), F.lit(19)))
        .cast("long")
    )
    return (
        ev.crossJoin(F.broadcast(stats))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("bucket_min"),
            F.max("value").alias("bucket_max"),
        )
    )


@register(
    "events_funnel_ordered",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        WHERE e.event_type = 'click'
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after_click
    """,
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, each
    stage strictly after the previous one's first occurrence) — the
    canonical product-analytics query. Scale: the three stage
    thresholds are chained window minimums over ONE user_id
    partitioning — a single shuffle of the events scan, then a
    map-side-combined global aggregate (the naive per-stage
    join-and-reaggregate formulation evaluates the event scan up to
    six times)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.select("user_id", "ts", "event_type")
        .withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return staged.agg(
        F.count_distinct(F.when(F.col("t_view").isNotNull(), F.col("user_id")))
        .cast("long")
        .alias("n_view"),
        F.count_distinct(F.when(F.col("t_click").isNotNull(), F.col("user_id")))
        .cast("long")
        .alias("n_click_after_view"),
        F.count_distinct(F.when(F.col("t_purchase").isNotNull(), F.col("user_id")))
        .cast("long")
        .alias("n_purchase_after_click"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week,
                CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS TIMESTAMP)) // 7 AS BIGINT)
               AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    distinct-active counts per (cohort, week offset) — the standard
    retention triangle. Scale: the firsts aggregate and the final
    groupBy both key on user_id-derived columns; the join's build
    side is one row per user (shrinks with distinct users, not
    events); COUNT(DISTINCT) expands to a two-phase exact aggregate.
    Week truncation is Monday-based in both engines."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )


@register(
    "events_sliding_24h_range_window",
    oracle=f"""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
           CAST(SUM(CAST(FLOOR(value * {SCALE}) AS BIGINT)) OVER w AS DOUBLE) / {SCALE}.0
               AS sum_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_sliding_24h_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-key count/sum over the
    trailing 24 hours BY EVENT TIME, not row count — the frame the
    ROWS-based moving average can't express when events are unevenly
    spaced. Ordered on epoch microseconds so the interval arithmetic
    is integral and tie rows (equal timestamps) are frame peers in
    both engines; the sum aggregates scaled longs (order-free).
    Scale: one shuffle on user_id; the range frame streams with two
    pointers, no per-row rescan."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-86400000000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("long").alias("n_24h"),
        (F.sum(F.floor(F.col("value") * SCALE).cast("long")).over(w).cast("double") / SCALE)
        .alias("sum_24h"),
    )


OVERLAP_WIN_S = 6 * 3600  # 6-hour maintenance windows

_SESSIONS_CTE = """
    ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    tagged AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_seq
        FROM tagged_src
    ),
    sessions AS (
        SELECT user_id, session_seq,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM tagged GROUP BY user_id, session_seq
    )
""".replace("tagged_src", "ordered")


@register(
    "events_interval_overlap_join",
    oracle=f"""
    WITH {_SESSIONS_CTE},
    bounds AS (
        SELECT CAST(FLOOR(epoch(MIN(session_start)) / {OVERLAP_WIN_S}) AS BIGINT) AS b0,
               CAST(FLOOR(epoch(MAX(session_end)) / {OVERLAP_WIN_S}) AS BIGINT) AS b1
        FROM sessions
    ),
    windows AS (
        -- naive timestamp via epoch arithmetic: to_timestamp() is
        -- TIMESTAMPTZ and would shift with the session timezone
        SELECT TIMESTAMP '1970-01-01'
                   + unnest(range(b0, b1 + 1)) * {OVERLAP_WIN_S} * INTERVAL 1 SECOND
                   AS win_start
        FROM bounds
    )
    SELECT w.win_start, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM windows w
    JOIN sessions s
      ON s.session_start < w.win_start + INTERVAL 6 HOUR
     AND s.session_end >= w.win_start
    GROUP BY w.win_start
    """,
)
def events_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: count the user sessions overlapping
    each 6-hour window. The oracle states it as the literal range
    join (start < win_end AND end >= win_start); the Spark plan uses
    the scalable bucketization: each session explodes to exactly the
    aligned buckets it spans, turning the non-equi interval join into
    an equi-join on bucket id — the standard trick that avoids the
    per-key quadratic probe (a raw range join degenerates to
    nested-loop at scale; the explode fan-out is bounded by
    session_span/window). One shuffle on the bucket key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    # microsecond-exact gap (see events_sessionize_batch)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    tagged = ev.select(
        "user_id",
        "ts",
        F.sum(F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0)).over(wrun).alias(
            "session_seq"
        ),
    )
    sessions = tagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"), F.max("ts").alias("session_end")
    )
    b_start = F.floor(F.unix_timestamp("session_start") / OVERLAP_WIN_S)
    b_end = F.floor(F.unix_timestamp("session_end") / OVERLAP_WIN_S)
    exploded = sessions.select(
        F.explode(F.sequence(b_start, b_end)).alias("bucket")
    )
    return (
        exploded.groupBy("bucket")
        .agg(F.count("*").alias("n_sessions"))
        .select(
            F.timestamp_seconds(F.col("bucket") * OVERLAP_WIN_S).alias("win_start"),
            "n_sessions",
        )
    )


@register(
    "events_session_window_native",
    oracle=f"""
    WITH {_SESSIONS_CTE}
    SELECT user_id, session_start, session_end,
           CAST(n_events AS BIGINT) AS n_events
    FROM (
        SELECT user_id, session_seq,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM tagged GROUP BY user_id, session_seq
    ) s
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (the built-in
    gap-based session operator) checked against the lag/cumsum
    formulation the oracle states — proving the two sessionization
    semantics coincide (a session's window closes after a 30-minute
    event gap; window bounds reported as first/last event times).
    Boundary note: session_window's gap is half-open (an event at
    exactly start+30min opens a NEW session) while the lag/cumsum
    oracle uses gap > 30min (it would merge); the two differ only on
    exact-30:00.000000 gaps, which microsecond event timestamps make
    measure-zero — and the hash gate would catch it if the data ever
    contained one. Scale: session_window is a first-class aggregation
    — one shuffle on user_id, sessions assembled by the merging
    session-window exec, no self-join and no running-sum window
    pass."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@register(
    "orders_status_transitions",
    oracle="""
    SELECT prev_status, o_orderstatus AS next_status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT o_orderstatus,
               lag(o_orderstatus) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev_status
        FROM orders
    ) t
    WHERE prev_status IS NOT NULL
    GROUP BY prev_status, next_status
    """,
)
def orders_status_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence analytics: the status-transition matrix of each
    customer's order history (lag over the per-customer date order,
    then pair counts) — the Markov-chain counting shape behind
    conversion and lifecycle modeling. Scale: one shuffle on
    o_custkey shared by the window and implicitly combined into the
    tiny (status x status) aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            F.col("o_orderstatus").alias("next_status"),
            F.lag("o_orderstatus").over(w).alias("prev_status"),
        )
        .filter(F.col("prev_status").isNotNull())
        .groupBy("prev_status", "next_status")
        .agg(F.count("*").alias("n"))
    )


ZSCORE_THRESHOLD = 3.0


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH stats AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE} AS s1,
               CAST(SUM(CAST(FLOOR(value * value * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE} AS s2
        FROM events GROUP BY user_id
    )
    SELECT e.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_anomalies
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE s.n >= 2
      AND abs(e.value - s.s1 / s.n)
          > {ZSCORE_THRESHOLD} * sqrt(greatest(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0))
    GROUP BY e.user_id
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key z-score anomaly counts: values more than
    {ZSCORE_THRESHOLD} sigma from their key's mean. Mean and variance
    derive from scaled-long exact sums (sum, sum-of-squares), then a
    FIXED double expression sequence — identical in both engines, so
    the threshold comparison can't flip (a native STDDEV would hang
    engine-specific accumulation order into the gate). Scale: stats
    are one map-side-combined groupBy; the stats join shuffles on the
    key both sides already share."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.sum(F.floor(F.col("value") * SCALE).cast("long")).cast("double") / SCALE)
        .alias("s1"),
        (
            F.sum(F.floor(F.col("value") * F.col("value") * SCALE).cast("long"))
            .cast("double")
            / SCALE
        ).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    return (
        ev.join(stats, "user_id")
        .filter(
            (F.col("n") >= 2)
            & (F.abs(F.col("value") - mean) > ZSCORE_THRESHOLD * F.sqrt(var))
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_anomalies"))
    )


@register(
    "orders_scd2_status_intervals",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
             - ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                  ORDER BY o_orderdate, o_orderkey) AS island
        FROM orders
    ),
    runs AS (
        SELECT o_custkey, o_orderstatus,
               MIN(o_orderdate) AS valid_from,
               MAX(o_orderdate) AS last_seen,
               MIN(o_orderkey) AS first_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM seq GROUP BY o_custkey, o_orderstatus, island
    )
    SELECT o_custkey, o_orderstatus, valid_from, last_seen,
           lead(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY valid_from, first_orderkey) AS valid_to,
           n_orders
    FROM runs
    """,
)
def orders_scd2_status_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval construction via gaps-and-islands: collapse each
    customer's consecutive same-status orders into validity runs
    (valid_from = first order of the run, valid_to = start of the
    next run, NULL while current) — the slowly-changing-dimension
    type-2 build every warehouse needs, as the difference of two
    row_numbers. o_orderkey tie-breaks same-day runs so the interval
    chain is deterministic. Scale: one shuffle on o_custkey that all
    three windows and the run aggregate reuse (the per-status window
    keys are a refinement of the customer partitioning)."""
    orders = load_table(spark, sf_dir, "orders")
    w_all = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_st = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey"
    )
    runs = (
        orders.select(
            "o_custkey",
            "o_orderstatus",
            "o_orderdate",
            "o_orderkey",
            (F.row_number().over(w_all) - F.row_number().over(w_st)).alias("island"),
        )
        .groupBy("o_custkey", "o_orderstatus", "island")
        .agg(
            F.min("o_orderdate").alias("valid_from"),
            F.max("o_orderdate").alias("last_seen"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.count("*").alias("n_orders"),
        )
    )
    w_runs = Window.partitionBy("o_custkey").orderBy("valid_from", "first_orderkey")
    return runs.select(
        "o_custkey",
        "o_orderstatus",
        "valid_from",
        "last_seen",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
        "n_orders",
    )


# --- per-user behavior sequences -------------------------------------

SEQ_MAX = 50  # events kept per user sequence


@register(
    "events_user_sequences",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           array_to_string(
               list_slice(list(event_type ORDER BY ts, event_id), 1, {SEQ_MAX}),
               ','
           ) AS seq
    FROM events
    GROUP BY user_id
    """,
)
def events_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user chronological event-type sequences, capped at the
    first SEQ_MAX events — the behavior-sequence dataset prep step
    for recommendation / next-action model training. The total event
    count rides along so consumers can weight or filter truncated
    users.

    Scale: a naive collect_list-then-slice holds EVERY event of a
    user in aggregation state (a power user with millions of events
    OOMs the executor); instead a row_number window keeps only the
    first SEQ_MAX rows per user before the collect, so per-group
    state is bounded at SEQ_MAX regardless of user size. The
    ordered-rank window, the total-count window, and the final
    rollup all share hash(user_id) partitioning — ONE exchange
    total. Ordering ties break on event_id, making the sequence a
    deterministic total order in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w_rank = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n_total"),
    ).filter(F.col("rn") <= SEQ_MAX)
    return ranked.groupBy("user_id").agg(
        F.max("n_total").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ",",
        ).alias("seq"),
    )


INCR_BASE_PCT = 80  # hash split: base partition vs late-arriving delta


@register(
    "events_incremental_rollup_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
               AS sum_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
)
def events_incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: the lake is split
    into an already-rolled-up BASE and a late-arriving DELTA batch
    (deterministic hash split stands in for arrival time), each
    aggregated independently, and the stored partials are MERGED —
    count/sum add, min/max fold — without touching base rows again.
    The oracle recomputes the rollup from scratch over everything:
    merged partials must equal the full recompute, which is exactly
    the algebraic-aggregate property (commutative monoid state) that
    makes incremental view maintenance and streaming upkeep correct.
    Scale: at 100 TB the base partials are a few rows per group —
    the delta batch is the only data aggregated per refresh; the
    scaled-long sum keeps the merge bit-exact in any order."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("sum_scaled"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    base = partials(ev.filter(bucket < INCR_BASE_PCT))
    delta = partials(ev.filter(bucket >= INCR_BASE_PCT))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            (F.sum("sum_scaled").cast("double") / 1000000.0).alias("sum_value"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
    )
