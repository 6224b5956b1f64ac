"""Value checks for the scale-technique operators whose outputs the
driver gate can't hash-compare (sketches)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_hll_estimate_within_rsd(spark, duck, sf_dir):
    """The registry entry now reports (exact_users, hll_within_tol)
    for the oracle gate; verify both the exact column and the
    asserted bounded-error flag against an independent DuckDB count."""
    df = entrymod.queries()["events_distinct_users_hll"](spark, sf_dir)
    rows = {r.event_type: r for r in df.collect()}
    exact = dict(
        duck.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(rows) == set(exact)
    for et, row in rows.items():
        assert row.exact_users == exact[et], (et, row.exact_users, exact[et])
        assert row.hll_within_tol, et


def test_percentiles_approx_within_sketch_error(spark, duck, sf_dir):
    """The GK sketch returns an ACTUAL data value whose rank is
    within 1/accuracy of the target percentile — verify the rank
    guarantee directly against the sorted per-group values (a
    value-band check against interpolating quantile_cont would be
    wrong: the sketch never interpolates)."""
    import bisect

    import __spark_entry__ as entrymod

    # the registry entry now emits the rank-guarantee booleans the
    # oracle asserts; all must hold
    for row in entrymod.queries()["events_percentiles_approx_sketch"](
        spark, sf_dir
    ).collect():
        assert row.p50_rank_ok and row.p95_rank_ok and row.p99_rank_ok, row

    # and the raw sketch values themselves still satisfy the rank
    # guarantee, checked directly against sorted per-group values
    from noaa_data_pipeline_spark.tables import register_views

    register_views(spark, sf_dir)
    got = {
        r.event_type: r
        for r in spark.sql(
            "SELECT event_type, "
            " percentile_approx(value, 0.5, 10000) AS p50,"
            " percentile_approx(value, 0.95, 10000) AS p95,"
            " percentile_approx(value, 0.99, 10000) AS p99 "
            "FROM events GROUP BY event_type"
        ).collect()
    }
    groups: dict[str, list[float]] = {}
    for event_type, value in duck.execute(
        "SELECT event_type, value FROM events ORDER BY event_type, value"
    ).fetchall():
        groups.setdefault(event_type, []).append(value)
    eps = 1.0 / 10000
    for p, col in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
        for event_type, values in groups.items():
            v = getattr(got[event_type], col)
            n = len(values)
            # rank range of v among the sorted values (ties included)
            lo_rank = bisect.bisect_left(values, v) / n
            hi_rank = bisect.bisect_right(values, v) / n
            slack = eps + 1.0 / n  # sketch error + discreteness
            assert lo_rank - slack <= p <= hi_rank + slack, (
                event_type, col, v, p, lo_rank, hi_rank,
            )
