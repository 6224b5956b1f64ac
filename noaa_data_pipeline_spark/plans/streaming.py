"""Structured Streaming operators over the ``events`` stream.

The reference's "streaming" is an hourly micro-batch pull loop
(daemon/src/main.rs:33-50) plus filename-time pruning; the Spark
shape for that is a file-source stream with an ``availableNow``
trigger (SURVEY §2.8). Four operators:

- ``stream_windowed_counts`` — watermark + tumbling event-time window
  aggregate (oracle-checked: one availableNow pass over a static
  dataset must equal the batch aggregate).
- ``stream_dedup_keys`` — streaming dropDuplicates (state-backed
  exact dedup; oracle-checked against DISTINCT).
- ``stream_dedup_within_watermark`` — the bounded-state variant:
  per-key state evicted when the watermark passes (Spark 3.5 API).
- ``stream_sessionize_state`` — custom stateful operator via
  ``applyInPandasWithState`` (30-min-gap sessionization; no SQL
  oracle — rows-only check + pytest golden values).

Scale notes: file-source streams list only new files per trigger;
watermarks bound the window state store; dropDuplicates state is
per-key and pruned by the watermark when keyed on event time. On a
real cluster the same code runs continuously with
``trigger(processingTime=...)`` — availableNow here makes runs
hermetic and deterministic.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..tables import table_path
from . import register

WINDOW_HOURS = 6
SESSION_GAP_MIN = 30


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet with the same
    timestamp normalization as the batch loader (``tables.load_table``):
    the driver has shipped ``ts`` as int64 nanos, TIMESTAMP_NTZ, and
    TIMESTAMP across rounds, so take the stream schema from a batch
    probe of the same file instead of hardcoding one encoding."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = (
        spark.read.option("mergeSchema", "true")
        .parquet(table_path(sf_dir, "events"))
        .schema
    )
    raw = (
        spark.readStream.schema(raw_schema)
        .option("mergeSchema", "true")
        # the file stream source wants a directory: stream the lake
        # dir and glob-filter to the events table file(s)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def _run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming frame to completion (availableNow) into a
    uniquely-named memory sink and return the materialized table.

    Stateful operators create one state-store instance per shuffle
    partition, each paying checkpoint/commit IO every micro-batch;
    at this data size 32 stores are pure overhead (~8s -> ~1s for
    sessionize with 8). The partition count is read at query start,
    so it's narrowed here and restored after termination; a real
    deployment sizes it to the executor count instead."""
    spark = df.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(min(int(prev_parts), 8))
    )
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


@register(
    "stream_windowed_counts",
    oracle=f"""
    -- naive-timestamp construction from epoch arithmetic:
    -- to_timestamp() returns TIMESTAMPTZ and would shift by the
    -- DuckDB session timezone on a non-UTC box
    SELECT TIMESTAMP '1970-01-01'
               + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / {WINDOW_HOURS * 3600})
                      * {WINDOW_HOURS * 3600} AS BIGINT) * INTERVAL 1 SECOND
               AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregate as a Structured Stream,
    run with trigger(availableNow) over the static lake — the Spark
    formulation of the reference's hourly rollup loop. Scale: the
    10-minute watermark bounds state; partial aggregation still
    happens map-side per micro-batch."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", f"{WINDOW_HOURS} hours"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.floor(F.col("value") * 1000000).cast("long")).cast("double") / 1000000.0)
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "complete")


@register(
    "stream_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via state-backed dropDuplicates — the
    streaming twin of dedup_exact. Scale: state is one entry per
    distinct key; keying on (event-time, key) + watermark would bound
    it for unbounded streams."""
    ev = _events_stream(spark, sf_dir)
    deduped = ev.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
    return _run_to_memory(deduped, "append")


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("n_sessions", T.LongType())])


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """30-min-gap sessionization per user. State carries the session
    count across micro-batches (a single availableNow batch sees all
    rows, so output is deterministic; the state round-trip is still
    exercised)."""
    rows = pd.concat(list(pdfs)).sort_values("ts")
    gaps = rows["ts"].diff().dt.total_seconds().fillna(0)
    session_ids = (gaps > SESSION_GAP_MIN * 60).cumsum()
    out = rows.groupby(session_ids).agg(
        session_start=("ts", "min"), session_end=("ts", "max"), n_events=("ts", "size")
    )
    (n_prev,) = state.get if state.exists else (0,)
    state.update((n_prev + len(out),))
    out["user_id"] = key[0]
    yield out[["user_id", "session_start", "session_end", "n_events"]]


@register(
    "stream_sessionize_state",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL {SESSION_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM ordered
    ) t
    GROUP BY user_id, session_id
    """,
)
def stream_sessionize_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user 30-min-gap
    sessionization via applyInPandasWithState (the Spark form of a
    hand-rolled stateful stream operator). Oracle-checked: one
    availableNow pass over the static lake must produce exactly the
    batch sessionization (the lag/cumsum SQL twin) — the same
    equality tests/test_streaming.py asserts value-for-value. Scale:
    state is per-user and Arrow-batched; a processing-time timeout
    would evict idle users on an unbounded stream."""
    ev = _events_stream(spark, sf_dir)
    sessions = (
        ev.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_memory(sessions, "update")


@register(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: like the state-backed exact
    dedup (stream_dedup_keys) but state for a key is DROPPED once the
    watermark passes its first-seen event time — the bounded-state
    form for unbounded streams where plain dropDuplicates state grows
    forever. Over one availableNow pass every duplicate falls within
    the watermark horizon, so the result equals DISTINCT and the
    oracle hash applies; on a live stream the horizon becomes the
    dedup guarantee window. Requires an event-time watermark on the
    deduped columns' frame (Spark 3.5+ API surface)."""
    ev = _events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "10 minutes")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(deduped, "append")


@register(
    "stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(e.value * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a static
    dimension (customer segment) and rolls up per (segment, type) —
    the standard streaming-ETL shape where a dimension table enriches
    an unbounded fact stream. The stream-static inner join is
    STATELESS (each micro-batch hash-joins against the static side;
    no state store, no watermark needed for the join itself), which
    is exactly why it scales: the broadcast dim is the only data that
    moves. The value sum goes through the same fixed-point micro-unit
    accumulator as stream_windowed_counts so the float total is
    order- and engine-independent. Oracle: availableNow over a static
    lake ≡ the batch join+rollup."""
    from ..tables import load_table

    ev = _events_stream(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    agg = (
        ev.join(dim, "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 1000000).cast("long")).cast("double")
                / 1000000.0
            ).alias("sum_value"),
        )
    )
    return _run_to_memory(agg, "complete")


JOIN_HORIZON_MIN = 60  # purchases attribute to views within this window


@register(
    "stream_stream_interval_join",
    oracle=f"""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id AS user_id,
           CAST(date_diff('second', CAST(v.ts AS TIMESTAMP), CAST(p.ts AS TIMESTAMP)) AS BIGINT)
               AS lag_seconds
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL {JOIN_HORIZON_MIN} MINUTE
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join with an event-time interval condition:
    each purchase joins the same user's views from the preceding
    {JOIN_HORIZON_MIN} minutes — the attribution join, and the one
    streaming operator class the registry lacked (stream-static is
    stateless; this one is doubly stateful). Both sides carry a
    watermark and the join predicate bounds purchase time against
    view time, which is exactly what lets Spark EVICT state: a view
    older than watermark + horizon can never match a future purchase
    and is dropped, so state is bounded by rate x horizon instead of
    growing forever — the property that makes the operator viable on
    an unbounded 100 TB/day stream. One availableNow pass over the
    static lake must equal the batch interval self-join the oracle
    runs. Scale: the join shuffles both sides on user_id; the
    interval condition is evaluated inside the state store probe,
    not as a post-filter on a cartesian per user."""
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "10 minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    # Single-micro-batch assumption (r6 ADVICE): the availableNow run
    # processes the whole static events table in ONE batch, so no row
    # is ever older than the watermark when it arrives and the result
    # equals the batch self-join oracle exactly. If the lake ever
    # splits into multiple files processed across micro-batches, rows
    # older than (watermark delay + horizon) would be evicted from
    # join state before their partner arrives — for a gated multi-
    # batch run, widen both delays to cover the data's full time span.
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {JOIN_HORIZON_MIN} MINUTES")
        ),
    ).select(
        "view_id",
        "purchase_id",
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
        ).cast("long").alias("lag_seconds"),
    )
    return _run_to_memory(joined, "append")
