"""Invalidation contracts for the round-7 caching layers: the
load_table DataFrame cache, the warehouse re-layout, and the bucketed
fact-table tag must all serve FRESH data after a lake file is
rewritten in place (the r6 ADVICE stale-copy hazard, now fixed by
stat-fingerprint keying — these tests lock the fix)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from noaa_data_pipeline_spark import tables


def _write_lake(spark, root: str, n_orders: int, tag: int) -> None:
    """Minimal orders/lineitem pair; `tag` changes row content so a
    stale cache is detectable by value, not just by count."""
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
        F.lit(f"P-{tag}").alias("o_orderpriority"),
        F.lit("F").alias("o_orderstatus"),
    )
    li = spark.range(n_orders * 2).select(
        (F.col("id") % n_orders).alias("l_orderkey"),
        (F.col("id") % 5).alias("l_suppkey"),
        (F.col("id") + tag).cast("double").alias("l_extendedprice"),
        F.lit(0.1).alias("l_discount"),
    )
    for name, df in [("orders", orders), ("lineitem", li)]:
        tmp = os.path.join(root, f"__tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob as _glob
        import shutil

        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(root, f"{name}.parquet")
        if os.path.exists(dst):
            os.remove(dst)
        shutil.copy(part, dst)
        shutil.rmtree(tmp)
        # parquet bytes can coincide in size; nudge mtime so the stat
        # fingerprint always moves (the cache keys on size AND mtime)
        st = os.stat(dst)
        os.utime(dst, (st.st_atime, st.st_mtime + 1 + tag))


def test_load_table_cache_invalidates_on_rewrite(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake_cache"))
    _write_lake(spark, root, 50, tag=1)
    first = tables.load_table(spark, root, "orders")
    assert first.select("o_orderpriority").first()[0] == "P-1"
    # same fingerprint -> same cached DataFrame object
    assert tables.load_table(spark, root, "orders") is first

    _write_lake(spark, root, 60, tag=2)
    fresh = tables.load_table(spark, root, "orders")
    assert fresh is not first
    assert fresh.count() == 60
    assert fresh.select("o_orderpriority").first()[0] == "P-2"


def test_warehouse_copy_invalidates_on_rewrite(spark, tmp_path_factory, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", "1")
    # force the re-layout path for these small files
    monkeypatch.setattr(tables, "_WAREHOUSE_MIN_BYTES", 1)
    root = str(tmp_path_factory.mktemp("lake_wh"))
    _write_lake(spark, root, 40, tag=1)
    first = tables.load_table(spark, root, "orders")
    assert first.select("o_orderpriority").first()[0] == "P-1"

    _write_lake(spark, root, 40, tag=2)
    fresh = tables.load_table(spark, root, "orders")
    assert fresh.select("o_orderpriority").first()[0] == "P-2"


def test_bucketed_tag_invalidates_on_rewrite(spark, tmp_path_factory):
    from noaa_data_pipeline_spark.plans import scale

    root = str(tmp_path_factory.mktemp("lake_bkt"))
    _write_lake(spark, root, 30, tag=1)
    tag1 = scale._bucket_tag(root)
    orders1, _ = scale.bucketed_fact_tables(spark, root)
    assert orders1.select("o_orderpriority").first()[0] == "P-1"

    _write_lake(spark, root, 30, tag=2)
    tag2 = scale._bucket_tag(root)
    assert tag1 != tag2  # content fingerprint moved -> new catalog tables
    orders2, _ = scale.bucketed_fact_tables(spark, root)
    assert orders2.select("o_orderpriority").first()[0] == "P-2"


def test_two_lakes_sharing_basename_do_not_collide(spark, tmp_path_factory):
    from noaa_data_pipeline_spark.plans import scale

    a = tmp_path_factory.mktemp("collide_a") / "sf"
    b = tmp_path_factory.mktemp("collide_b") / "sf"
    os.makedirs(a), os.makedirs(b)
    _write_lake(spark, str(a), 20, tag=1)
    _write_lake(spark, str(b), 20, tag=2)
    assert scale._bucket_tag(str(a)) != scale._bucket_tag(str(b))
    oa, _ = scale.bucketed_fact_tables(spark, str(a))
    ob, _ = scale.bucketed_fact_tables(spark, str(b))
    assert oa.select("o_orderpriority").first()[0] == "P-1"
    assert ob.select("o_orderpriority").first()[0] == "P-2"


def test_load_table_cache_invalidates_on_in_place_file_rewrite_in_dir(
    spark, tmp_path_factory
):
    """Directory-backed table source: rewriting a DATA FILE in place
    (same filename, same byte count, no rename) changes neither the
    directory's size nor its mtime, so the old top-level-stat
    fingerprint served a stale DataFrame (ADVICE r8). The fingerprint
    now folds per-file stats in."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("lake_dir_cache"))
    tdir = os.path.join(root, "orders.parquet")  # directory source
    os.makedirs(tdir)

    def write(tag: str, mtime: float) -> None:
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": [1, 2],
                    "o_custkey": [1, 1],
                    "o_orderpriority": [tag, tag],
                    "o_orderstatus": ["F", "F"],
                }
            ),
            os.path.join(tdir, "part-00000.parquet"),
        )
        # pin BOTH the file's and the directory's mtime so only the
        # file CONTENT distinguishes the two generations
        os.utime(os.path.join(tdir, "part-00000.parquet"), (mtime, mtime))
        os.utime(tdir, (mtime, mtime))

    write("A-1", 1700000000.0)
    first = tables.load_table(spark, root, "orders")
    assert first.select("o_orderpriority").first()[0] == "A-1"
    assert tables.load_table(spark, root, "orders") is first

    write("B-2", 1700000000.0)  # same size, same mtimes, new content?
    # same-size same-mtime content swap is undetectable by ANY stat
    # scheme; real rewrites move at least one file stat — emulate by
    # touching only the inner file (the directory stat stays fixed)
    os.utime(os.path.join(tdir, "part-00000.parquet"), (1700000001.0, 1700000001.0))
    os.utime(tdir, (1700000000.0, 1700000000.0))
    fresh = tables.load_table(spark, root, "orders")
    assert fresh is not first
    assert fresh.select("o_orderpriority").first()[0] == "B-2"


def test_load_table_cache_invalidates_on_rename_in_dir(
    spark, tmp_path_factory
):
    """A compactor that renames part files while preserving size and
    mtime must invalidate the cache (review r8): the cached
    DataFrame's file index points at the OLD path, so serving it
    yields FileNotFound / stale listings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("lake_rename"))
    tdir = os.path.join(root, "orders.parquet")
    os.makedirs(tdir)
    pq.write_table(
        pa.table({"o_orderkey": [1, 2], "o_orderpriority": ["X", "X"]}),
        os.path.join(tdir, "part-00000.parquet"),
    )
    mtime = 1700000000.0
    os.utime(os.path.join(tdir, "part-00000.parquet"), (mtime, mtime))
    first = tables.load_table(spark, root, "orders")
    assert tables.load_table(spark, root, "orders") is first

    os.rename(
        os.path.join(tdir, "part-00000.parquet"),
        os.path.join(tdir, "part-00001.parquet"),
    )
    os.utime(os.path.join(tdir, "part-00001.parquet"), (mtime, mtime))
    fresh = tables.load_table(spark, root, "orders")
    assert fresh is not first
    assert fresh.count() == 2  # reads through the NEW file index


def test_fingerprint_skips_walk_past_cap(tmp_path):
    """Directories beyond _DIR_WALK_CAP files are not fingerprinted
    (no caching) — a many-thousand-file lake must not pay a full stat
    walk on every plan construction."""
    d = tmp_path / "big"
    d.mkdir()
    for i in range(tables._DIR_WALK_CAP + 1):
        (d / f"f{i:05d}").write_text("x")
    assert tables._stat_fingerprint(str(d)) is None
    small = tmp_path / "small"
    small.mkdir()
    (small / "f0").write_text("x")
    assert tables._stat_fingerprint(str(small)) is not None
