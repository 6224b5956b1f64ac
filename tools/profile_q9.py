#!/usr/bin/env python
"""One-off q9 profile at the x20 scaled lake: A/B plan variants to
isolate where the 21.7x-vs-DuckDB ratio comes from. Not part of the
shipped surface; see VERDICT r5 task 2."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from noaa_data_pipeline_spark.plans.common import dsum
from noaa_data_pipeline_spark.session import get_spark
from noaa_data_pipeline_spark.tables import load_table

SF = os.path.join(REPO, ".bench_scale", "x20")
COST_FRACTION = 0.6


def best_of(fn, n=3, warm=3):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("profile_q9")
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    sup = load_table(spark, SF, "supplier")
    orders = load_table(spark, SF, "orders")
    nation = load_table(spark, SF, "nation")

    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        COST_FRACTION
    ) * F.col("p_retailprice") * F.col("l_quantity")
    order_years = orders.select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    red = part.filter(F.col("p_name").like("%red%"))

    def current():
        return (
            li.join(red, F.col("p_partkey") == F.col("l_partkey"))
            .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(order_years, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"), "o_year")
            .agg(dsum(profit, "sum_profit"))
        )

    def plain_sum():
        return (
            li.join(red, F.col("p_partkey") == F.col("l_partkey"))
            .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(order_years, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"), "o_year")
            .agg(F.sum(profit).alias("sum_profit"))
        )

    def bcast_orders():
        return (
            li.join(red, F.col("p_partkey") == F.col("l_partkey"))
            .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(order_years), F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"), "o_year")
            .agg(dsum(profit, "sum_profit"))
        )

    # pieces
    def scan_only():
        return li.select("l_partkey", "l_suppkey", "l_orderkey",
                         "l_extendedprice", "l_discount", "l_quantity")

    def li_part_only():
        return li.join(red, F.col("p_partkey") == F.col("l_partkey")).select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_quantity", "p_retailprice")

    def li_part_sup():
        return (
            li.join(red, F.col("p_partkey") == F.col("l_partkey"))
            .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
            .select("l_orderkey", "l_extendedprice", "l_discount",
                    "l_quantity", "p_retailprice", "s_nationkey")
        )

    print("rows lineitem:", li.count(), "orders:", orders.count(),
          "red parts:", red.count(), "supplier:", sup.count())
    for name, f in [
        ("scan_only", scan_only),
        ("li_part_only", li_part_only),
        ("li_part_sup", li_part_sup),
        ("current", current),
        ("plain_sum", plain_sum),
        ("bcast_orders", bcast_orders),
    ]:
        t = best_of(lambda f=f: noop(f()))
        print(f"{name:14s} {t:.3f}s")
    current().explain("formatted")


if __name__ == "__main__":
    main()
