"""Every registered query runs on Spark and (when an oracle exists)
hash-matches DuckDB on the same parquet — mirrors the driver's gate
at sf0.001 for speed."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import canon, frame_digest


def _all_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    assert srows is not None
    if oracle is None:
        return  # rows-only check: it ran and produced a frame
    res = duck.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    sh, slines = frame_digest(sdf.columns, srows)
    oh, olines = frame_digest(ocols, orows)
    if sh != oh:
        only_s = [x for x in slines if x not in set(olines)][:3]
        only_o = [x for x in olines if x not in set(slines)][:3]
        pytest.fail(f"value hash mismatch; spark-only={only_s} oracle-only={only_o}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_canon_stability():
    assert canon(None) == "NULL"
    assert canon(1.5) == "1.5"
    assert canon([1, None]) == "[1,NULL]"


def _clean_rows(path):
    """Driver rows that prove the entry ran AND matched (or is an
    acknowledged rows-only entry). A row that ran but rows/schema/
    hash-MISMATCHED is NOT clean."""
    import json

    with open(path) as fh:
        rows = json.load(fh)
    return {
        name
        for name, row in rows.items()
        if row.get("err") in (None, "no_oracle")
        and row.get("rows_match") is not False
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    }


def test_plan_edits_require_driver_reproof():
    """r12 VERDICT task 2: the age-based freshness window cannot see
    an entry whose plan was EDITED after its last clean driver row
    (r12 produced two such gaps silently: the adc persist slots, the
    CC width change — both in same-module helpers). The checked-in
    ledger (tools/plan_ledger.json) records each entry's
    transitive-source digest beside the driver round that proved it;
    any digest drift demands the entry be queued in GATE_PRIORITY for
    re-proof. The rotation/snapshot commits refresh the ledger via
    tools/update_plan_ledger.py."""
    from noaa_data_pipeline_spark.plans import GATE_PRIORITY, load_all
    from tools.plan_ledger import load_ledger, plan_source_digest

    ledger = load_ledger()
    stale, unledgered = [], []
    for name, q in load_all().items():
        rec = ledger.get(name)
        if rec is None:
            if name not in GATE_PRIORITY:
                unledgered.append(name)
            continue
        if rec["digest"] != plan_source_digest(q.fn) and name not in GATE_PRIORITY:
            stale.append(name)
    assert not unledgered, (
        f"entries missing from the plan ledger and not queued for proof: "
        f"{sorted(unledgered)} — run tools/update_plan_ledger.py"
    )
    assert not stale, (
        f"plan source changed after the last driver proof: {sorted(stale)} "
        "— add to GATE_PRIORITY (re-proof) and refresh the ledger in the "
        "same commit"
    )


def test_plan_digest_sees_helper_and_constant_edits(tmp_path):
    """The digest must catch the r12 gap class: edits to same-module
    HELPERS and CONSTANTS the entry references, not just the entry
    function's own body — and must be stable across processes for
    unchanged source."""
    import importlib.util
    import sys

    from tools.plan_ledger import plan_source_digest

    base = '''
WIDTH = 8

def _helper(x):
    return x + WIDTH

def entry(spark, sf_dir):
    return _helper(1)
'''

    def load(tag, text):
        p = tmp_path / f"ledgermod_{tag}.py"
        p.write_text(text)
        spec = importlib.util.spec_from_file_location(f"ledgermod_{tag}", p)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        return mod

    d0 = plan_source_digest(load("a", base).entry)
    # identical source under a different module name -> same digest
    assert plan_source_digest(load("b", base).entry) == d0
    # helper body edit (entry fn source unchanged) -> digest changes
    d_helper = plan_source_digest(
        load("c", base.replace("x + WIDTH", "x * WIDTH")).entry
    )
    assert d_helper != d0
    # referenced module-level constant edit -> digest changes
    d_const = plan_source_digest(load("d", base.replace("WIDTH = 8", "WIDTH = 16")).entry)
    assert d_const != d0
    # entry body edit -> digest changes
    d_entry = plan_source_digest(load("e", base.replace("_helper(1)", "_helper(2)")).entry)
    assert d_entry != d0


def test_gate_priority_covers_all_unchecked_entries():
    """The driver gate records exactly the first 50 registry entries.
    Invariant: every entry must either (a) have a clean driver row
    within the freshness window — the most recent rounds whose
    combined 50-entry samples can cover the whole registry (currently
    3: 107 entries > 2x50, so a 2-round bar became structurally
    unsatisfiable when the registry passed 100) — or (b) sit inside
    GATE_PRIORITY so the next round produces evidence. New entries
    therefore can't silently land beyond the window. MANUAL STEP this
    cannot catch: an entry clean in a prior round whose plan is
    EDITED afterwards must be re-added to GATE_PRIORITY by hand (the
    full-registry local gate in tools/check_correctness.py is the
    backstop — see GATE_LOG.md)."""
    import math
    from pathlib import Path

    from noaa_data_pipeline_spark.plans import GATE_PRIORITY, load_all

    registry = set(load_all())
    window_rounds = max(2, math.ceil(len(registry) / 50))
    # the bar must stay satisfiable: the driver can only ever re-prove
    # 50 entries per round, so the registry may not outgrow the
    # freshness budget we are willing to tolerate (3 rounds)
    assert len(registry) <= 3 * 50, "registry outgrew the rotation budget"
    repo = Path(__file__).resolve().parent.parent
    rounds = sorted(repo.glob("CORRECTNESS_r*.json"))
    assert rounds, "no driver correctness artifacts found"
    clean = set()
    for path in rounds[-window_rounds:]:
        clean |= _clean_rows(path)
    unchecked = registry - clean
    missing = unchecked - set(GATE_PRIORITY)
    assert not missing, f"add to GATE_PRIORITY: {sorted(missing)}"
    # and the priority list itself stays within the observed window
    assert len(GATE_PRIORITY) <= 50


def test_shared_helper_edits_require_dated_full_gate():
    """r13 VERDICT task 5: plans/common.py / operators/textops.py /
    tables.py sit OUTSIDE every entry's per-plan digest closure by
    design (an edit there touches ~every entry — no 50-slot driver
    window can re-prove it; the full-registry local gate is the
    backstop). This makes the backstop mechanical: the ledger holds a
    repo-level content hash of those files plus a DATED note naming
    the full-gate run that covered the last drift. Any edit to a
    shared helper fails here until
    `update_plan_ledger.py --shared-gate "<date> <gate run>"` lands
    in the same commit — which the tool only accepts alongside a
    recomputed digest, so the note and the drift travel together."""
    import re

    from tools.plan_ledger import (
        SHARED_KEY,
        load_ledger,
        shared_modules_digest,
    )

    rec = load_ledger().get(SHARED_KEY)
    assert rec, (
        "shared-modules ledger record missing — run "
        "tools/update_plan_ledger.py --shared-gate '<dated note>'"
    )
    assert rec["digest"] == shared_modules_digest(), (
        "shared helper modules changed since the recorded full-gate "
        "run — rerun tools/check_correctness.py over the FULL registry "
        "and record it: update_plan_ledger.py --shared-gate "
        "'<ISO date> <gate result>' in the same commit"
    )
    assert re.match(r"^\d{4}-\d{2}-\d{2}\s+\S", rec.get("full_gate", "")), (
        "shared-gate note must lead with an ISO date and describe the "
        f"full-gate run; got: {rec.get('full_gate')!r}"
    )


def test_shared_modules_digest_sees_content_edits(tmp_path, monkeypatch):
    """The repo-level hash is content- and file-identity-sensitive:
    editing any byte of any shared module, or re-pointing the module
    list, changes it (the synthetic-edit proof the per-plan digest has
    in test_plan_digest_sees_helper_and_constant_edits)."""
    import tools.plan_ledger as pl

    a = tmp_path / "noaa_data_pipeline_spark"
    a.mkdir()
    (a / "x.py").write_text("WIDTH = 8\n")
    (a / "y.py").write_text("def f():\n    return 1\n")
    monkeypatch.setattr(pl, "SHARED_MODULES", ("noaa_data_pipeline_spark/x.py",))
    d0 = pl.shared_modules_digest(repo=tmp_path)
    assert pl.shared_modules_digest(repo=tmp_path) == d0  # stable
    (a / "x.py").write_text("WIDTH = 16\n")
    assert pl.shared_modules_digest(repo=tmp_path) != d0, (
        "content edit invisible to the hash"
    )
    monkeypatch.setattr(
        pl,
        "SHARED_MODULES",
        ("noaa_data_pipeline_spark/x.py", "noaa_data_pipeline_spark/y.py"),
    )
    assert pl.shared_modules_digest(repo=tmp_path) != d0, (
        "module-list change invisible"
    )
