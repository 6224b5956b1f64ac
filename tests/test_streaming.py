"""Value-level checks for the stateful streaming sessionizer (the
driver's gate only row-counts it)."""

from __future__ import annotations

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
