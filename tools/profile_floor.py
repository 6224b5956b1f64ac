"""Split each headline query's steady-state wall into executed stage
time vs driver-side gap (planning, job submission, py4j, broadcast
collect, inter-job idle).

Methodology: same session profile and prepared-frame protocol as
bench.py, plus an event log. For each timed noop run the tool takes
the union of [submission, completion] intervals of every stage whose
events fall inside the run's wall window; wall - covered = time when
NO stage was running. That split decides whether a query's remaining
cost is engine compute (optimize the plan) or driver floor (optimize
plan size / job count).

Usage: python tools/profile_floor.py [query ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench as benchmod  # noqa: E402

_EVT_DIR = "/tmp/profile_floor_events"


def _session():
    """The ENGINE session (session.get_spark) plus event logging.

    r15 fix: this tool used to assemble its own builder, which
    silently missed configs the engine factory sets (codegen cache
    sizing, the fast spark.local.dir) — its walls then disagreed with
    bench.py by ~2x and the stage/gap split described a session the
    engine never runs. Event-log configs ride the same builder via
    getOrCreate on a fresh JVM (this tool owns its process)."""
    os.environ.setdefault("SPARK_GRAFT_BUCKETED", "1")
    os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", "1")
    os.makedirs(_EVT_DIR, exist_ok=True)
    from noaa_data_pipeline_spark.session import get_spark

    return get_spark(
        "profile_floor",
        extra_configs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": _EVT_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )


def _stage_intervals(log_path: str):
    """[(submission_ms, completion_ms)] for completed stages."""
    out = []
    with open(log_path) as fh:
        for line in fh:
            try:
                evt = json.loads(line)
            except json.JSONDecodeError:
                continue
            if evt.get("Event") == "SparkListenerStageCompleted":
                si = evt["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub and com and com >= sub:
                    out.append((sub, com))
    return out


def _covered(intervals) -> float:
    intervals = sorted(intervals)
    covered = 0.0
    cur_s = cur_e = None
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    return covered / 1000.0


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _session()
    sc = spark.sparkContext

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    run_names = names or [n for n in benchmod.HEADLINE if n in queries]
    frames = {n: queries[n](spark, sf_dir) for n in run_names}

    def run(name: str) -> None:
        frames[name].write.format("noop").mode("overwrite").save()

    for n in run_names:  # warm pass
        run(n)

    logs = glob.glob(
        os.path.join(_EVT_DIR, "*" + sc.applicationId + "*", "events*")
    ) or glob.glob(os.path.join(_EVT_DIR, sc.applicationId + "*"))
    log_path = logs[0]

    # epoch-millis clock aligned with event timestamps
    print(f"{'query':38s} {'wall':>7s} {'staged':>7s} {'gap':>7s} {'stages':>6s}")
    total_wall = total_gap = total_staged = 0.0
    for name in run_names:
        best = None
        for _ in range(3):
            t0 = time.time() * 1000.0
            w0 = time.perf_counter()
            run(name)
            wall = time.perf_counter() - w0
            t1 = time.time() * 1000.0
            time.sleep(0.05)  # let listener flush
            ivals = [
                (max(s, t0), min(e, t1))
                for s, e in _stage_intervals(log_path)
                if e >= t0 and s <= t1
            ]
            rec = (wall, _covered(ivals), len(ivals))
            if best is None or rec[0] < best[0]:
                best = rec
        wall, covered, nstages = best
        gap = wall - covered
        total_wall += wall
        total_staged += covered
        total_gap += gap
        print(f"{name:38s} {wall:7.3f} {covered:7.3f} {gap:7.3f} {nstages:6d}")
    print(
        f"{'TOTAL':38s} {total_wall:7.3f} {total_staged:7.3f} {total_gap:7.3f}"
    )


if __name__ == "__main__":
    main()
