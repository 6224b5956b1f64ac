"""Relational operator coverage (SURVEY §2.1-§2.7) on the testdata
star schema.

Each query re-expresses an operator shape the reference uses —
multi-file scans, IN/time-range filters, equi joins (inner / left
outer vs aggregated subquery / semi / anti), one- and two-level hash
aggregations, DISTINCT, window top-k, ORDER BY + LIMIT, union-by-name
— as an idiomatic Catalyst plan. Scale notes per query explain why
the plan survives 100 TB (broadcastable dims, partial aggregation,
pushed-down predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register
from .common import DEC, davg, dsum, sql_davg, sql_dsum


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide grouped aggregation (reference's A1-style rollup shape,
    oracle/src/db/weather_data.rs:92-146). Scale: 2-key groupBy over
    the fact table -> partial hash agg map-side, tiny shuffle; the
    shipdate filter pushes down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi join + agg + deterministic top-k (join shapes J1-J3
    of SURVEY §2.3). Scale: no forced broadcasts — the filtered
    orders x customer side grows with the scale factor, so the
    planner picks broadcast vs shuffle from size stats (locally the
    sub-64MB side broadcasts; on a cluster AQE decides at runtime)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join pipeline. Scale: region/nation are fixed-size ->
    explicit broadcast; customer/supplier grow with the scale factor,
    so their join strategy is left to the optimizer's size stats
    (broadcast locally, shuffle at TB scale); lineitem<->orders is
    the one unavoidable fact-fact shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "customer_order_counts",
    oracle="""
    SELECT c_custkey, c_name, COALESCE(cnt.total_orders, 0) AS total_orders
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, COUNT(o_orderkey) AS total_orders
        FROM orders GROUP BY o_custkey
    ) cnt ON c_custkey = cnt.o_custkey
    """,
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join against an aggregated subquery with
    COALESCE(n,0) — exactly the reference's event-listing join J4
    (oracle/src/db/event_data.rs:603-625). Scale: aggregate first
    (shrinks the fact side to one row per key), then join; the count
    side then broadcasts."""
    cust = load_table(spark, sf_dir, "customer")
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("total_orders"))
    )
    return (
        cust.join(counts, cust.c_custkey == counts.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("total_orders"), F.lit(0)).alias("total_orders"),
        )
    )


@register(
    "customers_without_recent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    """,
)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS). Scale: the filtered key set broadcasts
    when small; otherwise Spark's shuffled left-anti."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "urgent_order_lines_semi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def urgent_order_lines_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS) — the reference's METAR station-index
    filter S5 is this shape. Scale: semi join never duplicates the
    fact side; the filtered key set broadcasts when size stats allow
    (it scales with SF, so the hint is left to the optimizer)."""
    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return li.join(
        urgent, li.l_orderkey == urgent.o_orderkey, "left_semi"
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rank_in_customer
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rank_in_customer
        FROM orders
    ) ranked
    WHERE rank_in_customer <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number (reference W4 top-3
    signing, oracle/src/oracle.rs:598-617). Scale: single shuffle on
    the partition key; rank predicate lets Spark apply a per-group
    top-k sort (WindowGroupLimit) instead of a full sort."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank_in_customer", F.row_number().over(w))
        .filter(F.col("rank_in_customer") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_customer")
    )


@register(
    "distinct_segment_nation",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def distinct_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (reference A3 station dedup,
    oracle/src/db/weather_data.rs:224-246). Scale: partial distinct
    map-side before the shuffle."""
    return load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "latest_events_limit",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM events
    ORDER BY user_id, ts DESC, event_id
    LIMIT 200
    """,
)
def latest_events_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (the reference UI's example query W6,
    ui/main.js:52, with a unique tiebreak for determinism). Scale:
    Spark plans TakeOrderedAndProject — per-partition top-200 then a
    single merge, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy("user_id", F.desc("ts"), "event_id")
        .limit(200)
        .select("event_id", "user_id", "ts", "event_type", "value")
    )


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a field out of a JSON props
    column and aggregate it (F9-style string handling done
    declaratively). Scale: get_json_object is codegen'd JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        )
        .orderBy("event_type")
    )


@register(
    "union_by_name_schema_drift",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM (
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderpriority, NULL AS o_totalprice
        FROM orders WHERE o_orderstatus = 'O'
    ) u
    """,
)
def union_by_name_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-by-name across drifted schemas — the reference's
    ``union_by_name=true`` multi-file scan S9/A5
    (oracle/src/db/weather_data.rs:101-104) as an explicit operator.
    Scale: narrow union, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_orderpriority")
    return a.unionByName(b, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


_ADHOC_SQL = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
"""


@register("sql_adhoc_guarded", oracle=_ADHOC_SQL)
def sql_adhoc_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ad-hoc SQL surface (§3.3) exercised inside the gate: the
    ONE query text runs through sql_surface.run_user_sql (SELECT-only
    guard + registered temp views) on Spark AND verbatim as the
    DuckDB oracle — dialect-shared SQL, guard included in the proven
    path. Scale: plain pushed-filter aggregate; the point is the
    surface, not the shape."""
    from ..sql_surface import run_user_sql
    from ..tables import register_views

    register_views(spark, sf_dir)
    return run_user_sql(spark, _ADHOC_SQL)


DQ_MAX_NULL_VALUES = 0  # events.value null budget
TS_LO, TS_HI = "2024-01-01", "2031-01-01"


@register(
    "events_dq_report",
    oracle=f"""
    SELECT 'event_id_unique' AS check_name,
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS violations,
           COUNT(*) = COUNT(DISTINCT event_id) AS passed
    FROM events
    UNION ALL
    SELECT 'value_not_null',
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) <= {DQ_MAX_NULL_VALUES}
    FROM events
    UNION ALL
    SELECT 'ts_in_range',
           CAST(SUM(CASE WHEN ts < TIMESTAMP '{TS_LO}'
                           OR ts >= TIMESTAMP '{TS_HI}' THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN ts < TIMESTAMP '{TS_LO}'
                      OR ts >= TIMESTAMP '{TS_HI}' THEN 1 ELSE 0 END) = 0
    FROM events
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) = 0
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey IS NULL
    """,
)
def events_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report (the Deequ/dbt-test shape):
    uniqueness, completeness, range, and referential-integrity checks
    evaluated in aggregate and emitted as (check, violations, passed)
    rows — the validation gate a 100 TB ingest runs before
    publishing a partition. Scale: the three single-table checks
    fold into per-table aggregates (count-distinct is the only
    shuffle; the rest are map-side conditional sums); the FK check
    is a broadcast anti probe of the dim, not a row-expansion join.
    Constraint-violating ROWS are deliberately not emitted (at scale
    you sample them separately); the report is fixed-size output
    regardless of input size."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    uniq = ev.agg(
        (F.count("*") - F.countDistinct("event_id")).alias("violations")
    ).select(
        F.lit("event_id_unique").alias("check_name"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )
    nulls = ev.agg(
        F.sum(F.col("value").isNull().cast("long")).alias("violations")
    ).select(
        F.lit("value_not_null").alias("check_name"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") <= DQ_MAX_NULL_VALUES).alias("passed"),
    )
    out_of_range = (
        (F.col("ts") < F.lit(TS_LO).cast("timestamp"))
        | (F.col("ts") >= F.lit(TS_HI).cast("timestamp"))
    ).cast("long")
    ts_range = ev.agg(F.sum(out_of_range).alias("violations")).select(
        F.lit("ts_in_range").alias("check_name"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )
    orphans = (
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
        .select(
            F.lit("orders_custkey_fk").alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
            (F.col("violations") == 0).alias("passed"),
        )
    )
    return uniq.unionByName(nulls).unionByName(ts_range).unionByName(orphans)


@register(
    "orders_customer_full_outer_recon",
    oracle="""
    SELECT
        COALESCE(agg.o_custkey, c.c_custkey) AS custkey,
        CASE WHEN c.c_custkey IS NULL THEN 'order_without_customer'
             WHEN agg.o_custkey IS NULL THEN 'customer_without_orders'
             ELSE 'matched' END AS recon_status,
        CAST(COALESCE(agg.n_orders, 0) AS BIGINT) AS n_orders,
        c.c_mktsegment AS segment
    FROM (
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ) agg
    FULL OUTER JOIN customer c ON agg.o_custkey = c.c_custkey
    """,
)
def orders_customer_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the one outer-join flavor the
    registry lacked: every order-side key AND every customer appears
    exactly once, labeled matched / orphan-order / orderless-customer
    (the two-way integrity audit a warehouse runs between a fact and
    its dimension; the one-way version is events_dq_report's FK
    check). Scale: orders pre-aggregates to one row per customer key
    BEFORE the join, so the full outer joins two customer-cardinality
    sides — never the raw fact; a full outer cannot broadcast
    (both sides must stream), so it shuffles both on the key, which
    is the minimum for this semantics."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    agg = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        agg.join(cust, F.col("o_custkey") == F.col("c_custkey"), "full_outer")
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            F.when(F.col("c_custkey").isNull(), "order_without_customer")
            .when(F.col("o_custkey").isNull(), "customer_without_orders")
            .otherwise("matched")
            .alias("recon_status"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.col("c_mktsegment").alias("segment"),
        )
    )


@register(
    "orders_unpivot_measures",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    """,
)
def orders_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measure columns to long (key, measure,
    value) rows — the inverse of orders_pivot_status_by_priority and
    the standard reshape feeding per-measure monitoring/metric
    stores. Spark's native unpivot carries ids through and unions
    the value columns in ONE operator (one scan, map-side Expand —
    not N self-unions); the oracle spells the same semantics as
    UNION ALL. Scale: pure map-side row expansion, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="measure",
        valueColumnName="value",
    )
