"""Refresh tools/plan_ledger.json (see tools/plan_ledger.py).

Usage:
  python tools/update_plan_ledger.py --round N [name ...]

Updates the digest (and driver-round attribution) of the named
entries — default: every entry currently in GATE_PRIORITY, which is
exactly the set the round-N driver window will (re-)prove — and
prunes records of entries no longer in the registry (retired/folded).
Run it in the rotation commit and again at the end-of-round snapshot
if late plan edits landed (the meta-test in
tests/test_registry_oracle.py goes red otherwise, which is the
point).

  python tools/update_plan_ledger.py --round N --baseline

rebuilds the whole ledger from the current source tree (used once at
r13 to seed it; entries outside the current GATE_PRIORITY inherit
their last clean driver round from the CORRECTNESS_r*.json history).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from noaa_data_pipeline_spark.plans import GATE_PRIORITY, load_all  # noqa: E402
from tools.plan_ledger import (  # noqa: E402
    LEDGER_PATH,
    plan_source_digest,
    save_ledger,
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
        raise SystemExit("usage: update_plan_ledger.py --round N [--baseline] [name ...]")
    rnd = int(args[args.index("--round") + 1])
    baseline = "--baseline" in args
    names = [
        a
        for i, a in enumerate(args)
        if not a.startswith("--") and args[i - 1] != "--round"
    ]

    registry = load_all()
    ledger = {}
    if LEDGER_PATH.exists():
        ledger = json.load(open(LEDGER_PATH))
    # prune retired/folded entries
    ledger = {k: v for k, v in ledger.items() if k in registry}

    if baseline:
        history = _last_clean_rounds()
        for name, q in registry.items():
            ledger[name] = {
                "digest": plan_source_digest(q.fn),
                "round": rnd if name in GATE_PRIORITY else history.get(name, rnd),
            }
    else:
        targets = names or list(GATE_PRIORITY)
        unknown = [n for n in targets if n not in registry]
        if unknown:
            raise SystemExit(f"unknown entries: {unknown}")
        for name in targets:
            ledger[name] = {
                "digest": plan_source_digest(registry[name].fn),
                "round": rnd,
            }

    save_ledger(ledger)
    print(f"ledger: {len(ledger)} entries -> {LEDGER_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
