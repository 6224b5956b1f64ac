"""Refresh tools/plan_ledger.json (see tools/plan_ledger.py).

Usage:
  python tools/update_plan_ledger.py --round N [name ...]

Updates the digest of the named entries — default: every entry
currently in GATE_PRIORITY, which is exactly the set the round-N
driver window will (re-)prove — and prunes records of entries no
longer in the registry (retired/folded). Run it in the rotation
commit and again at the end-of-round snapshot if late plan edits
landed (the meta-test in tests/test_registry_oracle.py goes red
otherwise, which is the point).

Round attribution (r13 ADVICE): each record carries TWO fields —
``round`` is the last round whose CORRECTNESS_r*.json holds a CLEAN
driver row for the entry (evidence that exists), ``queued_round`` is
the window the rotation queued it into (evidence that is scheduled).
The rotation-time refresh can therefore never overstate proof: an
entry queued at r14 shows round=<last proven> / queued_round=14 until
CORRECTNESS_r14 actually lands, at which point the next refresh (or
the judge reading the history directly) sees round=14. Entries with
no history at all (first-evidence promotions) get round=null.

  python tools/update_plan_ledger.py --round N --baseline

rebuilds the whole ledger from the current source tree (used once at
r13 to seed it).

  python tools/update_plan_ledger.py --round N --shared-gate "NOTE"

refreshes the repo-level shared-modules record (plans/common.py,
operators/textops.py, tables.py — see plan_ledger.SHARED_MODULES).
NOTE must lead with an ISO date and name the full-registry gate run
that covered the drift (e.g. "2026-08-16 full local gate 146/146
sf0.01 post common.py edit"); the meta-test rejects undated notes,
so a shared-helper edit cannot merge without a dated full-gate record
in the same commit.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from noaa_data_pipeline_spark.plans import GATE_PRIORITY, load_all  # noqa: E402
from tools.plan_ledger import (  # noqa: E402
    LEDGER_PATH,
    SHARED_KEY,
    plan_source_digest,
    save_ledger,
    shared_modules_digest,
)


def _last_clean_rounds() -> dict[str, int]:
    repo = Path(__file__).resolve().parent.parent
    last: dict[str, int] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        rnd = int(path.stem.split("_r")[1])
        rows = json.load(open(path))
        for name, row in rows.items():
            if (
                row.get("err") in (None, "no_oracle")
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            ):
                last[name] = rnd
    return last


def main() -> int:
    args = sys.argv[1:]
    if "--round" not in args:
        raise SystemExit(
            "usage: update_plan_ledger.py --round N [--baseline] "
            '[--shared-gate "DATED NOTE"] [name ...]'
        )
    rnd = int(args[args.index("--round") + 1])
    baseline = "--baseline" in args
    shared_note = None
    if "--shared-gate" in args:
        shared_note = args[args.index("--shared-gate") + 1]
    names = [
        a
        for i, a in enumerate(args)
        if not a.startswith("--")
        and args[i - 1] not in ("--round", "--shared-gate")
    ]

    registry = load_all()
    ledger = {}
    if LEDGER_PATH.exists():
        ledger = json.load(open(LEDGER_PATH))
    # prune retired/folded entries (the repo-level shared record stays)
    ledger = {k: v for k, v in ledger.items() if k in registry or k == SHARED_KEY}

    history = _last_clean_rounds()
    if baseline:
        for name, q in registry.items():
            ledger[name] = {
                "digest": plan_source_digest(q.fn),
                "round": history.get(name),
                "queued_round": rnd if name in GATE_PRIORITY else None,
            }
    else:
        targets = names or list(GATE_PRIORITY)
        unknown = [n for n in targets if n not in registry]
        if unknown:
            raise SystemExit(f"unknown entries: {unknown}")
        for name in targets:
            ledger[name] = {
                "digest": plan_source_digest(registry[name].fn),
                "round": history.get(name),
                "queued_round": rnd,
            }

    if shared_note is not None:
        ledger[SHARED_KEY] = {
            "digest": shared_modules_digest(),
            "full_gate": shared_note,
        }

    save_ledger(ledger)
    print(f"ledger: {len(ledger)} entries -> {LEDGER_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
