"""Value checks for the scale-technique operators whose outputs the
driver gate can't hash-compare (sketches)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_hll_estimate_within_rsd(spark, duck, sf_dir):
    df = entrymod.queries()["events_distinct_users_hll"](spark, sf_dir)
    got = {r.event_type: r.approx_users for r in df.collect()}
    exact = dict(
        duck.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for et, est in got.items():
        # rsd=0.02 → generous 3-sigma-ish bound
        assert abs(est - exact[et]) <= max(3, 0.06 * exact[et]), (et, est, exact[et])
