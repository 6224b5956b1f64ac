"""Manifest-based bucketed-lake routing (r11, r10 VERDICT task 3).

The router (plans/scale.bucketed_lake_available) has four rungs:
env=1 forces bucketed, env=0 pins un-bucketed (the gate profile),
and with env UNSET a lake routes bucketed iff a DECLARED warehouse
manifest exists on disk for its exact content fingerprint + bucket
count. These tests pin the two hazards the design must exclude:

- r7 ADVICE regression: an INCIDENTAL layout build (the
  lake_bucketed_copartition_join gate entry running with env unset)
  must NOT flip later default-session routing — it records
  ``warehouse: false``.
- gate determinism: the explicit env=0 pin must beat a declared
  manifest, so tools/check_correctness.py always verifies the
  un-bucketed q9/q21 plans.

Plus the self-serve path itself: declare once, then a cold session
(fresh catalog, no env var) attaches to the published files without
rewriting them and runs the exchange-free plan.
"""

from __future__ import annotations

import glob
import os

import __spark_entry__ as entrymod
from noaa_data_pipeline_spark.plans import scale


def isolate_layout_root(spark, monkeypatch, root: str) -> None:
    """Point the layout store at a private root and clear every
    session-level remnant of previous builds (frame cache + catalog
    tables), so each test starts as a layout-less cold session."""
    monkeypatch.setattr(scale, "_BUCKET_ROOT", root)
    scale._BUCKETED_CACHE.clear()
    for t in spark.catalog.listTables():
        if t.name.startswith("bkt_"):
            spark.sql(f"DROP TABLE {t.name}")


def _q9_plan(spark, sf_dir) -> str:
    df = entrymod.queries()["q9_product_type_profit"](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_incidental_build_does_not_flip_routing(spark, sf_dir, monkeypatch, tmp_path):
    """r7 ADVICE regression: running the lake_bucketed_copartition_join
    gate entry (which builds the layout) with env UNSET must leave
    default routing on the un-bucketed plans — the manifest it writes
    says warehouse: false."""
    isolate_layout_root(spark, monkeypatch, str(tmp_path / "bkt"))
    monkeypatch.delenv("SPARK_GRAFT_BUCKETED", raising=False)
    assert not scale.bucketed_lake_available(spark, sf_dir)
    entrymod.queries()["lake_bucketed_copartition_join"](spark, sf_dir).collect()
    # the layout now exists on disk...
    manifests = glob.glob(os.path.join(scale._BUCKET_ROOT, "*", "manifest.json"))
    assert len(manifests) == 1
    # ...but is not a declared warehouse, so nothing routes
    assert not scale.bucketed_lake_available(spark, sf_dir)
    assert "bkt_lineitem" not in _q9_plan(spark, sf_dir)


def test_declare_then_cold_session_routes_without_rewrite(
    spark, sf_dir, monkeypatch, tmp_path
):
    """Self-serve at-scale default: declare_warehouse once (the
    ingest-time step), then a cold session — fresh catalog, no env
    var — routes q9 to the bucketed plan, attaching to the published
    files rather than rewriting them."""
    isolate_layout_root(spark, monkeypatch, str(tmp_path / "bkt"))
    monkeypatch.delenv("SPARK_GRAFT_BUCKETED", raising=False)
    layout = scale.declare_warehouse(spark, sf_dir)
    data_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(layout, "*", "*.parquet"))
    }
    assert data_files
    # simulate the cold session: drop all catalog state + frame cache
    # (the manifest and data files on disk are all that remains)
    scale._BUCKETED_CACHE.clear()
    for t in spark.catalog.listTables():
        if t.name.startswith("bkt_"):
            spark.sql(f"DROP TABLE {t.name}")
    assert scale.bucketed_lake_available(spark, sf_dir)
    plan = _q9_plan(spark, sf_dir)
    assert "bkt_lineitem" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # attach, not rewrite: every published data file untouched
    assert data_files == {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(layout, "*", "*.parquet"))
    }


def test_gate_pin_beats_declared_manifest(spark, sf_dir, monkeypatch, tmp_path):
    """Gate determinism: SPARK_GRAFT_BUCKETED=0 (the profile
    tools/check_correctness.py sets) serves the un-bucketed plan even
    on a box whose manifest declares the warehouse."""
    isolate_layout_root(spark, monkeypatch, str(tmp_path / "bkt"))
    scale.declare_warehouse(spark, sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED", "0")
    assert not scale.bucketed_lake_available(spark, sf_dir)
    assert "bkt_lineitem" not in _q9_plan(spark, sf_dir)


def test_half_deleted_layout_reads_as_absent(spark, sf_dir, monkeypatch, tmp_path):
    """A /tmp cache with a missing data file must not route (the
    manifest validates file presence) — and the next
    bucketed_fact_tables call rebuilds and republishes it."""
    isolate_layout_root(spark, monkeypatch, str(tmp_path / "bkt"))
    monkeypatch.delenv("SPARK_GRAFT_BUCKETED", raising=False)
    layout = scale.declare_warehouse(spark, sf_dir)
    assert scale.bucketed_lake_available(spark, sf_dir)
    victim = glob.glob(os.path.join(layout, "orders", "*.parquet"))[0]
    os.unlink(victim)
    assert not scale.bucketed_lake_available(spark, sf_dir)
    # rebuild path: a fresh (cold) call publishes a complete layout
    scale._BUCKETED_CACHE.clear()
    for t in spark.catalog.listTables():
        if t.name.startswith("bkt_"):
            spark.sql(f"DROP TABLE {t.name}")
    o, _ = scale.bucketed_fact_tables(spark, sf_dir)
    assert o.count() > 0
    # rebuilt incidentally (env unset): back to warehouse: false
    assert not scale.bucketed_lake_available(spark, sf_dir)
