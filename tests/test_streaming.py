"""Value-level checks for the stateful streaming sessionizer (the
driver's gate only row-counts it)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_sessionize_matches_sql_sessionization(spark, duck, sf_dir):
    sdf = entrymod.queries()["stream_sessionize_state"](spark, sf_dir)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in sdf.collect()
    )
    expected = sorted(
        duck.execute(
            """
            WITH ordered AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ),
            tagged AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS session_id
                FROM ordered
            )
            SELECT user_id, MIN(ts), MAX(ts), COUNT(*)
            FROM tagged GROUP BY user_id, session_id
            """
        ).fetchall()
    )
    assert got == expected


def test_watermark_drops_late_data_across_runs(spark, tmp_path_factory):
    """Append-mode windowed aggregate with a 30-minute watermark over
    two availableNow runs sharing one checkpoint: a row arriving in
    run 2 that is older than the watermark persisted by run 1 must be
    EXCLUDED from its window — the late-data semantics (and
    checkpoint-restored watermark) that keep the streaming rollup
    bounded-state at 100 TB; the reference's hourly batch loop never
    had to define them."""
    import datetime as dt

    from pyspark.sql import functions as F

    src = str(tmp_path_factory.mktemp("stream_src"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    t = lambda h, m: dt.datetime(2024, 8, 11, h, m)  # noqa: E731

    def run_once() -> dict:
        # parquet sink: supports checkpoint recovery (a memory sink
        # does not), so run 2 restores run 1's watermark
        stream = spark.readStream.schema("id long, ts timestamp").parquet(src)
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("window_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.window_start: r.n for r in spark.read.parquet(out).collect()}

    # run 1: two on-time rows in the 10:00 window + a 12:00 row that
    # advances the watermark to 11:30 and finalizes the 10:00 window
    spark.createDataFrame(
        [(1, t(10, 0)), (2, t(10, 20)), (3, t(12, 0))], "id long, ts timestamp"
    ).write.mode("append").parquet(src)
    rows1 = run_once()
    assert rows1 == {t(10, 0): 2}  # finalized on-time; 12:00 not emitted

    # run 2 (restored watermark 11:30): a 10:15 straggler — late — and
    # a 13:30 row that advances the watermark past the 12:00 window
    spark.createDataFrame(
        [(4, t(10, 15)), (5, t(13, 30))], "id long, ts timestamp"
    ).write.mode("append").parquet(src)
    rows2 = run_once()
    # late 10:15 did NOT amend or re-emit the 10:00 window; the 12:00
    # window finalized with exactly its one row
    assert rows2 == {t(10, 0): 2, t(12, 0): 1}


def test_stream_stream_interval_join_multi_micro_batch(
    spark, tmp_path_factory, monkeypatch
):
    """The r6 ADVICE caveat, closed: the interval join must equal the
    batch oracle even when the lake is MANY files processed across
    MANY micro-batches. The split is round-robin by row, so every
    file spans the full event-time range and no pickup order is
    time-sorted — under the old fixed 10-minute watermark, batch 1
    advances the watermark to (max_ts - 10min) and every later file's
    rows arrive 'late', evicting join state before partners show up;
    the replay-disorder delay derived from the lake's span keeps all
    state live for the whole replay. Gate-grade compare (columns +
    row count + value hash) against the DuckDB oracle on the SAME
    split files."""
    import duckdb
    import pyarrow.parquet as pq

    from noaa_data_pipeline_spark import plans
    from tools.check_correctness import frame_digest

    src_sf = "/root/testdata/sf0.01"  # 40 joined pairs; sf0.001 has 3
    lake = str(tmp_path_factory.mktemp("split_lake"))
    table = pq.read_table(f"{src_sf}/events.parquet")
    n_files = 4
    for i in range(n_files):
        pq.write_table(
            table.take(list(range(i, table.num_rows, n_files))),
            f"{lake}/events_{i:02d}.parquet",
        )
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MAX_FILES", "1")

    q = plans.load_all()["stream_stream_interval_join"]
    sdf = q.fn(spark, lake)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{lake}/events_*.parquet')"
        )
        res = con.execute(q.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()

    assert len(srows) == len(orows) > 0
    assert sorted(sdf.columns) == sorted(ocols)
    sh, _ = frame_digest(sdf.columns, srows)
    oh, _ = frame_digest(ocols, orows)
    assert sh == oh


def _split_events_lake(tmpdir: str, src_sf: str, ordered: bool, n_files: int = 4):
    """Split the events table into n files. ordered=False: round-robin
    rows, every file spans the full time range (worst-case replay
    disorder). ordered=True: contiguous event-time quartiles with
    increasing mod times (the time-partitioned ingest shape — the file
    stream source picks oldest-mtime first)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = pq.read_table(f"{src_sf}/events.parquet")
    if ordered:
        order = pc.sort_indices(table, sort_keys=[("ts", "ascending")])
        table = table.take(order)
        bounds = [round(i * table.num_rows / n_files) for i in range(n_files + 1)]
        shards = [table.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_files)]
    else:
        shards = [
            table.take(list(range(i, table.num_rows, n_files))) for i in range(n_files)
        ]
    base = 1700000000.0
    for i, shard in enumerate(shards):
        path = f"{tmpdir}/events_{i:02d}.parquet"
        pq.write_table(shard, path)
        os.utime(path, (base + 60 * i, base + 60 * i))
    return tmpdir


def test_stream_dedup_within_watermark_multi_micro_batch(
    spark, tmp_path_factory, monkeypatch
):
    """Unordered 4-file replay, one file per micro-batch: with the
    replay-disorder watermark the bounded-state dedup still equals
    DISTINCT (under the old fixed 10-minute horizon a duplicate whose
    first occurrence expired between batches was re-emitted: 751 rows
    vs 750)."""
    import duckdb

    from noaa_data_pipeline_spark import plans

    lake = _split_events_lake(
        str(tmp_path_factory.mktemp("dedup_split")), "/root/testdata/sf0.01", ordered=False
    )
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MAX_FILES", "1")
    q = plans.load_all()["stream_dedup_within_watermark"]
    got = sorted((r.user_id, r.event_type) for r in q.fn(spark, lake).collect())
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{lake}/events_*.parquet')"
        )
        expected = sorted(con.execute(q.oracle).fetchall())
    finally:
        con.close()
    assert got == expected


def test_stream_sessionize_disordered_replay_raises(
    spark, tmp_path_factory, monkeypatch
):
    """An unordered multi-file replay (every file spans the full time
    range) violates the sessionizer's ordered-pickup contract; r8
    ADVICE: it used to emit wrong sessions guarded only by a
    docstring — now the stateful operator detects the violation
    (batch min ts predates the stored open-session start) and the
    query fails instead."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from noaa_data_pipeline_spark import plans

    lake = _split_events_lake(
        str(tmp_path_factory.mktemp("sess_disord")),
        "/root/testdata/sf0.01",
        ordered=False,
    )
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MAX_FILES", "1")
    q = plans.load_all()["stream_sessionize_state"]
    with pytest.raises((StreamingQueryException, Py4JJavaError)) as exc:
        q.fn(spark, lake)
    assert "out-of-order replay detected" in str(exc.value)


def test_stream_sessionize_multi_micro_batch_ordered(
    spark, tmp_path_factory, monkeypatch
):
    """Time-ordered 4-file replay, one file per micro-batch: open
    sessions carried in state across batches (a session spanning a
    file boundary must come out as ONE session, not two), re-emitted
    versions collapsed by (user_id, session_start). Value-exact vs
    the batch lag/cumsum sessionization on the same files."""
    import duckdb

    from noaa_data_pipeline_spark import plans

    lake = _split_events_lake(
        str(tmp_path_factory.mktemp("sess_split")), "/root/testdata/sf0.01", ordered=True
    )
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MAX_FILES", "1")
    q = plans.load_all()["stream_sessionize_state"]
    sdf = q.fn(spark, lake)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in sdf.collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{lake}/events_*.parquet')"
        )
        expected = sorted(con.execute(q.oracle).fetchall())
    finally:
        con.close()
    assert len(got) == len(expected)
    assert got == expected
