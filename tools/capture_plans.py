"""Capture .explain('formatted') output for registry entries.

Usage: python tools/capture_plans.py <out_dir> [query ...]

Writes <out_dir>/<query>.txt with the formatted physical plan, under
the same session profile bench.py uses (warehouse + bucketed lake),
so the captured plan is the one the bench actually times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import bench as benchmod  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_BUCKETED", "1")
    os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from noaa_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("capture_plans")
    queries = entrymod.queries()
    run_names = names or [n for n in benchmod.HEADLINE if n in queries]
    for name in run_names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
