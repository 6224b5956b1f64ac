"""Testdata lake access.

The driver provides a deterministic TPC-H-ish star schema plus
``events`` (a timestamped activity stream), ``documents`` (text
corpus) and ``embeddings`` (vector table) as one parquet file per
table (TESTDATA.md). Mirrors the reference's "logical table = union
of parquet files" model (SURVEY §1.1, oracle/src/db/weather_data.rs:101-104):
``spark.read.parquet`` on a path/glob with mergeSchema gives the
same union-by-name semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# --- warehouse lake re-layout ----------------------------------------
#
# The driver's testdata ships each table as ONE parquet file with ONE
# row group. Spark's unit of scan parallelism is the row group (a
# split that contains no row-group start reads zero rows), so every
# scan of those files runs as a single task no matter how many cores
# the session has — an artifact of the generator, not a property any
# real lake has (a 100 TB table is thousands of files / row groups,
# and Spark's own writers target 128 MB row groups). The warehouse
# profile (SPARK_GRAFT_WAREHOUSE=1, set by bench.py) therefore pays a
# one-time ingest per session: each sizeable table is rewritten once
# into defaultParallelism files under /tmp, and subsequent loads read
# the re-layout — same rows, scan now as wide as the machine. This is
# the same storage-level argument as plans/scale.bucketed_fact_tables
# (pay layout cost once at ingest, serve every query from it); the
# correctness gate runs without the profile and reads the originals.
#
# One file = one scan partition is enforced by setting the file-open
# cost at/above maxPartitionBytes, so the splitter never packs two
# re-layout files into one task (at real scale you want that packing;
# on a 32-core local box with 30 KB-300 KB files you want width).

_WAREHOUSE_ROOT = f"/tmp/noaa_spark_warehouse_{os.getpid()}"
# Only tables whose single-task scan is material get re-laid: the A/B
# at sf0.1 measured the 10.8 MB lineitem aggregate at 0.26 s as one
# task vs ~0.10 s at 8-16 files, while sub-MB tables LOST time to the
# extra per-task overhead (one 5 k-row scan does not want 16 tasks).
# At larger lakes more tables cross the bar automatically.
_WAREHOUSE_MIN_BYTES = 512 * 1024
_WAREHOUSE_FILE_BYTES = 768 * 1024  # ~0.75 MB per re-layout file


def _warehouse_active() -> bool:
    return os.environ.get("SPARK_GRAFT_WAREHOUSE") == "1"


def _warehouse_copy(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> DataFrame:
    """Return the multi-file re-layout of one table, building it on
    first use. Keyed on the source's full path + size + mtime so a
    regenerated lake can never be served stale (same contract as
    plans/scale._bucket_tag)."""
    import hashlib

    src = table_path(sf_dir, name)
    try:
        st = os.stat(src)
    except OSError:
        return df  # non-local source: serve the original
    if st.st_size < _WAREHOUSE_MIN_BYTES:
        return df
    fp = hashlib.sha1(
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime}".encode()
    ).hexdigest()[:10]
    dst = os.path.join(_WAREHOUSE_ROOT, f"{name}_{fp}")
    if not os.path.isdir(dst):
        n = max(
            4,
            min(
                st.st_size // _WAREHOUSE_FILE_BYTES,
                spark.sparkContext.defaultParallelism,
            ),
        )
        # build to a sibling tmp dir and rename into place: directory
        # existence is the "layout complete" marker for every later
        # consumer (including bench_duckdb's cross-process glob), so
        # an interrupted write must never leave a partial dst
        import uuid as _uuidlib

        tmp = f"{dst}__build_{_uuidlib.uuid4().hex[:8]}"
        df.repartition(int(n)).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dst)
        except OSError:
            # lost a concurrent-build race: the other copy is complete
            import shutil as _shutil

            _shutil.rmtree(tmp, ignore_errors=True)
    # one re-layout file per scan partition (see module comment) —
    # set on every serve, not just the build: a later session in the
    # same process finds dst on disk and would otherwise pack the
    # small files back into few splits under the default open cost
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(16 * 1024 * 1024))
    return spark.read.parquet(dst)


# Logical-plan cache: (applicationId, source path, stat fingerprint,
# warehouse flag) -> DataFrame. A DataFrame is an immutable logical
# plan, so handing the same one to every consumer is safe — and each
# ``spark.read.parquet`` costs 50-150 ms of driver-side listing +
# schema inference per call, which dominated sub-second bench queries
# (a query touching 3 tables paid ~0.2-0.3 s before running anything).
# The stat fingerprint invalidates on any rewrite of the source file;
# the applicationId scopes entries to the live session.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


# Above this many files, the per-call stat walk costs more than the
# cache saves (a many-thousand-file lake would pay seconds of stat()
# per plan construction): skip caching instead of walking.
_DIR_WALK_CAP = 256


def _stat_fingerprint(src: str) -> tuple | None:
    """Invalidation key for one table source. For a directory source
    the top-level stat is NOT enough: rewriting a data file in place
    (same name, no rename) changes neither the directory's size nor
    its mtime (ADVICE r8), so fold per-file stats in — the same
    recursive contract scale._bucket_tag and the lifecycle
    fingerprints use. File NAMES fold in too (review r8): a rename
    that preserves content/size/mtime — a compactor re-numbering part
    files — must invalidate, or the cached DataFrame's file index
    points at dead paths. Directories past _DIR_WALK_CAP files return
    None (no caching) rather than stat-storm on every call."""
    import zlib

    try:
        st = os.stat(src)
        if not os.path.isdir(src):
            return (st.st_size, st.st_mtime_ns)
        n, total, mtime, names = 0, 0, 0, 0
        for root, dirs, files in os.walk(src):
            dirs.sort()
            for f in sorted(files):
                p = os.path.join(root, f)
                fst = os.stat(p)
                n += 1
                if n > _DIR_WALK_CAP:
                    return None
                total += fst.st_size
                mtime = max(mtime, fst.st_mtime_ns)
                names = zlib.crc32(os.path.relpath(p, src).encode(), names)
        return (n, total, mtime, names)
    except OSError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Schema-drift-tolerant union read (reference's
    ``union_by_name=true``, SURVEY §2 S9) is a mergeSchema read.

    ``events.ts`` has shipped in three parquet encodings across driver
    rounds — nanosecond timestamps (Spark's vectorized reader rejects
    them), microsecond no-timezone timestamps (read as TIMESTAMP_NTZ),
    and plain TIMESTAMP. Normalize all three to session-TZ TIMESTAMP:
    the session TZ is pinned to UTC (session.py), so the NTZ→TZ cast is
    value-preserving and every downstream epoch/watermark expression
    (unix_micros, window, cast-to-double) resolves identically to the
    DuckDB oracle's naive-UTC reading.
    """
    src = os.path.abspath(table_path(sf_dir, name))
    fingerprint = _stat_fingerprint(src)
    app_id = spark.sparkContext.applicationId
    key = (app_id, src, fingerprint, _warehouse_active())
    if fingerprint is not None:
        cached = _TABLE_CACHE.get(key)
        if cached is not None:
            return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.option("mergeSchema", "true").parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # int64 nanos: truncate to micros, same as DuckDB's
            # TIMESTAMP_NS -> TIMESTAMP cast.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if _warehouse_active():
        df = _warehouse_copy(spark, sf_dir, name, df)
    if fingerprint is not None:
        # drop entries from stopped sessions so the dict stays small
        for k in [k for k in _TABLE_CACHE if k[0] != app_id]:
            del _TABLE_CACHE[k]
        _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """CREATE-TABLE-AS-SELECT equivalent (reference ui/main.js:112-123,
    SURVEY §2 S11): expose every table as a temp view for spark.sql."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
