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

from . import register

WINDOW_HOURS = 6
SESSION_GAP_MIN = 30


def _normalize_ts(raw: DataFrame) -> DataFrame:
    """The driver has shipped ``ts`` as int64 nanos, TIMESTAMP_NTZ,
    and TIMESTAMP across rounds — normalize all three to TIMESTAMP."""
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def _needs_nanos_conf(sf_dir: str) -> bool:
    """True iff any events file carries a nanosecond-typed ``ts`` —
    the one encoding Spark's vectorized reader rejects without
    ``spark.sql.legacy.parquet.nanosAsLong``. Probed from the parquet
    footers directly (pyarrow, no Spark conf involved) so the
    session-wide conf flip only happens when the lake actually
    requires it (r8 ADVICE: plan construction mutated session conf
    unconditionally). The conf cannot be restored after construction:
    the scan consults it at execution time too. Footer reads are
    per-file cheap; result cached by lake fingerprint."""
    import glob

    import pyarrow.parquet as pq

    key = _lake_key(None, sf_dir)
    cacheable = key[2] is not None  # fingerprint None = don't cache
    if cacheable:
        hit = _NANOS_CACHE.get(key)
        if hit is not None:
            return hit
    needs = False
    for p in sorted(glob.glob(os.path.join(sf_dir, "events*.parquet"))):
        try:
            schema = pq.read_schema(p)
        except Exception:
            needs = True  # unreadable footer: set the conf, do no harm
            break
        if "ts" in schema.names and "[ns" in str(schema.field("ts").type):
            needs = True
            break
    if cacheable:
        _NANOS_CACHE[key] = needs
    return needs


def _lake_key(app_id: str | None, sf_dir: str) -> tuple:
    """Cache key scoping a probed lake fact to its content (stat
    fingerprint, same invalidation contract as tables._TABLE_CACHE)
    and, when session-dependent, the live application."""
    from ..tables import _stat_fingerprint

    src = os.path.abspath(sf_dir)
    return (app_id, src, _stat_fingerprint(src))


_NANOS_CACHE: dict[tuple, bool] = {}
_SPAN_CACHE: dict[tuple, tuple] = {}


def _events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read of the same file set the stream source sees (lake
    dir + ``events*.parquet`` glob, so split-file lakes read
    identically in both paths), ts-normalized like
    ``tables.load_table``."""
    if _needs_nanos_conf(sf_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _normalize_ts(
        spark.read.option("mergeSchema", "true")
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet; the stream schema
    comes from a batch probe of the same files instead of hardcoding
    one ``ts`` encoding (see :func:`_events_batch`).

    ``SPARK_GRAFT_STREAM_MAX_FILES`` caps files per micro-batch
    (``maxFilesPerTrigger``) — availableNow honors read limits, so
    setting it makes a replay run as MANY micro-batches, the shape
    the multi-batch correctness tests drive."""
    if _needs_nanos_conf(sf_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = (
        spark.read.option("mergeSchema", "true")
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
        .schema
    )
    reader = (
        spark.readStream.schema(raw_schema)
        .option("mergeSchema", "true")
        # the file stream source wants a directory: stream the lake
        # dir and glob-filter to the events table file(s)
        .option("pathGlobFilter", "events*.parquet")
    )
    # positive-int parse: '0' and non-numeric spellings mean
    # "disabled" (mirroring SPARK_GRAFT_BUCKETED=0), never an invalid
    # maxFilesPerTrigger=0 or a ValueError at plan construction
    try:
        max_files = int(os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES", "0"))
    except ValueError:
        max_files = 0
    if max_files > 0:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return _normalize_ts(reader.parquet(sf_dir))


def _replay_disorder_delay(spark: SparkSession, sf_dir: str) -> str:
    """Watermark delay for replaying a STATIC lake through a stateful
    stream-stream join. The delay models the max event-time disorder
    of the ARRIVAL sequence; a live feed bounds it by its delivery
    SLA (minutes), but a historical replay picks files in an order
    unrelated to event time, so its disorder is the lake's full
    event-time span — any smaller delay lets the join evict state
    whose partner is still in an unread file. Derived from a
    column-pruned min/max probe of ``ts`` (footer-stats cheap on a
    real lake) plus the join horizon as slack; empty lake falls back
    to the live default. The probe is one eager job — cached per
    (applicationId, lake fingerprint) like the other lakeside caches
    (r8 ADVICE), so repeated plan constructions over the same lake
    pay it once."""
    key = _lake_key(spark.sparkContext.applicationId, sf_dir)
    cacheable = key[2] is not None  # fingerprint None = don't cache
    if cacheable and key in _SPAN_CACHE:
        lo, hi = _SPAN_CACHE[key]
    else:
        lo, hi = _events_batch(spark, sf_dir).agg(
            F.min("ts"), F.max("ts")
        ).first()
        if cacheable:
            for k in [k for k in _SPAN_CACHE if k[0] != key[0]]:
                del _SPAN_CACHE[k]
            _SPAN_CACHE[key] = (lo, hi)
    if lo is None or hi is None:
        return "10 minutes"
    span_s = int((hi - lo).total_seconds()) + JOIN_HORIZON_MIN * 60 + 3600
    return f"{span_s} seconds"


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

# State = the user's OPEN session (start/end as epoch micros + event
# count): bounded at one row per user regardless of history length,
# and exactly what the next micro-batch needs to continue or close it.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """30-min-gap sessionization per user, multi-micro-batch capable:
    state carries the user's open session; each batch's rows either
    extend it (first gap <= the session gap) or close it and open new
    sessions. Every session version touched this batch is emitted
    (update mode); the plan collapses re-emissions of a growing
    session by its stable (user_id, session_start) key. Assumes each
    user's rows arrive event-time-ordered ACROSS micro-batches
    (intra-batch disorder is sorted away) — the daily-ingest lake
    shape the multi-batch test drives; a single availableNow batch
    trivially satisfies it."""
    rows = pd.concat(list(pdfs)).sort_values("ts")
    gaps = rows["ts"].diff().dt.total_seconds().fillna(0)
    session_ids = (gaps > SESSION_GAP_MIN * 60).cumsum()
    out = rows.groupby(session_ids).agg(
        session_start=("ts", "min"), session_end=("ts", "max"), n_events=("ts", "size")
    )
    out = out.reset_index(drop=True)
    out["n_events"] = out["n_events"].astype("int64")
    if state.exists:
        start_us, end_us, n_prev = state.get
        open_start = pd.Timestamp(start_us, unit="us")
        open_end = pd.Timestamp(end_us, unit="us")
        first_start = pd.Timestamp(out.loc[0, "session_start"])
        if first_start < open_start:
            # An event older than the stored open session's START
            # arrived: under ordered pickup it would have begun or
            # predated that session, so the state (and any already-
            # emitted session) is wrong. Previously only the docstring
            # guarded this (r8 ADVICE) — now the violation raises
            # instead of silently emitting bad sessions.
            raise ValueError(
                "stream_sessionize_state: out-of-order replay detected "
                f"(batch min ts {first_start} predates the open session "
                f"start {open_start}); this operator requires per-user "
                "event-time-ordered file pickup across micro-batches — "
                "replay in one availableNow batch or use the "
                "watermarked native session_window "
                "(events_session_window_native) for disordered lakes"
            )
        if (first_start - open_end).total_seconds() <= SESSION_GAP_MIN * 60:
            # batch continues the open session: same start key, so the
            # collapse replaces last batch's version with this one
            out.loc[0, "session_start"] = open_start
            out.loc[0, "n_events"] = int(out.loc[0, "n_events"]) + int(n_prev)
            if pd.Timestamp(out.loc[0, "session_end"]) < open_end:
                out.loc[0, "session_end"] = open_end
        else:
            # the open session closed in the gap between batches; its
            # final version was already emitted last batch
            pass
    last = out.iloc[-1]
    state.update(
        (
            int(pd.Timestamp(last["session_start"]).value // 1000),
            int(pd.Timestamp(last["session_end"]).value // 1000),
            int(last["n_events"]),
        )
    )
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
    hand-rolled stateful stream operator). Oracle-checked: an
    availableNow replay of the static lake must produce exactly the
    batch sessionization (the lag/cumsum SQL twin) — the same
    equality tests/test_streaming.py asserts value-for-value, in one
    micro-batch AND split across many (state carries the open
    session; an update-mode sink accumulates every emitted version of
    a growing session, so the plan collapses them by the stable
    (user_id, session_start) key, taking the latest = max end/count).
    Requires per-user event-time-ordered arrival across micro-batches
    — the shape a time-partitioned ingest lake delivers; a violating
    replay RAISES inside the stateful operator (batch min ts earlier
    than the stored open-session start) instead of silently emitting
    wrong sessions — for arbitrarily disordered replays use the
    watermarked native session_window. Scale: state is one open
    session per
    user, Arrow-batched; a processing-time timeout would evict idle
    users on an unbounded stream."""
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
    sink = _run_to_memory(sessions, "update")
    return sink.groupBy("user_id", "session_start").agg(
        F.max("session_end").alias("session_end"),
        F.max("n_events").alias("n_events"),
    )


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
    forever. The watermark horizon IS the dedup guarantee window, so
    a replay of a static lake must size it to the replay's
    event-time disorder (:func:`_replay_disorder_delay`): under the
    old fixed 10-minute delay a 4-file unordered split re-emitted a
    duplicate whose first-seen state expired between micro-batches
    (measured 751 rows vs DISTINCT's 750). With the span-derived
    delay any replay — single- or multi-micro-batch — equals
    DISTINCT; a live stream pins the horizon to its delivery SLA and
    accepts re-emits beyond it. Requires an event-time watermark on
    the deduped columns' frame (Spark 3.5+ API surface)."""
    ev = _events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", _replay_disorder_delay(spark, sf_dir))
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
    not as a post-filter on a cartesian per user.

    The watermark delay is the REPLAY-DISORDER bound, not a literal:
    this entry replays a static historical lake, where micro-batch
    file pickup is unordered in event time, so the delay derives from
    the lake's event-time span (:func:`_replay_disorder_delay`) — a
    10-minute delay would be correct only if the whole lake landed in
    one micro-batch (the r6 ADVICE caveat, now closed: the multi-file
    multi-micro-batch run is gate-compared in
    tests/test_streaming.py). A LIVE deployment replaces the probe
    with its delivery-SLA disorder bound, restoring rate x (delay +
    horizon) state eviction."""
    delay = _replay_disorder_delay(spark, sf_dir)
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", delay)
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", delay)
    )
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
