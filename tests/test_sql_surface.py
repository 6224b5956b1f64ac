"""Guarded ad-hoc SQL surface (SURVEY §3.3): SELECT-only enforcement
+ the reference UI's example query + schema introspection."""

from __future__ import annotations

import pytest

from noaa_data_pipeline_spark import sql_surface
from noaa_data_pipeline_spark.tables import register_views


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


def test_ui_example_query_shape(spark):
    # ui/main.js:52 example, retargeted at the events view
    df = sql_surface.run_user_sql(
        spark, "SELECT * FROM events ORDER BY user_id, ts DESC LIMIT 200"
    )
    assert df.count() == 200


def test_with_cte_allowed(spark):
    df = sql_surface.run_user_sql(
        spark, "WITH c AS (SELECT COUNT(*) n FROM customer) SELECT n FROM c"
    )
    assert df.collect()[0].n > 0


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE customer",
        "INSERT INTO customer VALUES (1)",
        "SELECT 1; SELECT 2",
        "update customer set c_name = 'x'",
        "CREATE TABLE t AS SELECT 1",
        "  -- sneaky\nDELETE FROM orders",
        "",
    ],
)
def test_guard_rejects(spark, bad):
    with pytest.raises(sql_surface.SqlGuardError):
        sql_surface.run_user_sql(spark, bad)


def test_schema_introspection(spark):
    schemas = sql_surface.table_schemas(spark, ["region", "events"])
    assert {c["column_name"] for c in schemas["region"]} >= {"r_regionkey", "r_name"}
    types = {c["column_name"]: c["column_type"] for c in schemas["events"]}
    assert types["ts"] == "timestamp"
