"""Timestamp-encoding robustness: the driver has shipped
``events.ts`` as parquet nanosecond timestamps (round 1-3), and as
microsecond TIMESTAMP_NTZ (round 4, which silently broke every
epoch/watermark expression until the loader normalized it). Pin the
contract: the engine must produce IDENTICAL values for the ts-heavy
query family no matter which of the three encodings the lake uses —
TIMESTAMP (us, UTC), TIMESTAMP_NTZ (us, no zone), or nanos.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import frame_digest

# ts-consuming registry entries with deterministic output; one per
# distinct ts-expression class (epoch arithmetic, cast-to-double,
# RANGE window micros, interval bucketing, date_trunc, watermark)
TS_FAMILY = [
    "events_sessionize_batch",
    "events_linear_interpolate",
    "events_sliding_24h_range_window",
    "events_interval_overlap_join",
    "events_daily_rollup_two_level",
    "stream_windowed_counts",
]

ENCODINGS = ["ts_utc", "ts_ntz", "ts_nanos"]


@pytest.fixture(scope="module")
def encoded_dirs(spark, sf_dir, tmp_path_factory):
    """Three sibling lakes differing only in the events.ts physical
    encoding; every other table is the sf0.001 original (symlinked)."""
    table = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts = table.column("ts")
    # normalize whatever the driver currently ships to naive us first
    base = ts.cast(pa.timestamp("us"))
    variants = {
        "ts_utc": base.cast(pa.timestamp("us", tz="UTC")),
        "ts_ntz": base,
        "ts_nanos": base.cast(pa.timestamp("ns")),
    }
    dirs = {}
    idx = table.schema.get_field_index("ts")
    for name, col in variants.items():
        d = tmp_path_factory.mktemp(name)
        pq.write_table(table.set_column(idx, "ts", col), str(d / "events.parquet"))
        for other in os.listdir(sf_dir):
            if other != "events.parquet" and other.endswith(".parquet"):
                os.symlink(os.path.join(sf_dir, other), str(d / other))
        dirs[name] = str(d)
    return dirs


@pytest.mark.parametrize("name", TS_FAMILY)
def test_ts_family_hash_stable_across_encodings(spark, encoded_dirs, name):
    fn = entrymod.queries()[name]
    digests = {}
    for enc, d in encoded_dirs.items():
        sdf = fn(spark, d)
        rows = [tuple(r) for r in sdf.collect()]
        digests[enc], _ = frame_digest(sdf.columns, rows)
        assert rows, f"{name} produced no rows under {enc}"
    assert len(set(digests.values())) == 1, f"{name} diverges: {digests}"


def test_loader_normalizes_every_encoding_to_timestamp(spark, encoded_dirs):
    from noaa_data_pipeline_spark.tables import load_table

    for enc, d in encoded_dirs.items():
        dtype = dict(load_table(spark, d, "events").dtypes)["ts"]
        assert dtype == "timestamp", (enc, dtype)
