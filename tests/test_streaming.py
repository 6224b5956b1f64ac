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
