"""Plan-source ledger: digests that make silent plan edits visible.

The r12 round produced two evidence gaps the age-based freshness
meta-test could not see: ``sim_ivf_pq_adc_search`` and
``dedup_clusters_cc`` were edited AFTER their last clean driver rows
(persist slots in plans/staging_r11.py; the CC shuffle-width change
in plans/iterative.py), so their driver evidence proved the OLD
plans. The r12 VERDICT (task 2) ordered the tripwire extended to
catch the class, not the instance: hash each registry entry's plan
source, record the digest beside its last clean driver round in a
checked-in ledger, and fail the suite when source changed after the
last driver row unless the entry is queued for re-proof
(GATE_PRIORITY).

Digest scope — why not ``inspect.getsource(fn)`` alone: BOTH r12
gaps lived in same-module helpers, not the entry functions, so a
fn-level hash would have missed exactly the class it exists to
catch. The digest therefore covers the transitive same-module
closure: the entry function's source, plus the source of every
same-module function it references (walking co_names through nested
code objects, including decorated/closure functions), plus the repr
of every referenced same-module hashable CONSTANT (ints/strings/
tuples like SALT_BUCKETS or CMS_W change the plan without touching
any function body). Cross-module shared helpers (plans/common.py
dsum etc.) are deliberately outside the closure: an edit there
touches ~every entry at once, which no 50-slot driver window could
re-prove — the full-registry local gate (tools/check_correctness.py)
remains the backstop for that class, as GATE_LOG documents.

Ledger protocol (tests/test_registry_oracle.py enforces it):
- every registry entry has a ledger record {digest, round};
- digest != current  =>  the entry MUST sit in GATE_PRIORITY (the
  next driver window re-proves the edited plan);
- the rotation commit refreshes the records of the entries it queues
  (tools/update_plan_ledger.py), and the end-of-round snapshot
  refreshes them again if late edits landed.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import sys
import types
from pathlib import Path

LEDGER_PATH = Path(__file__).resolve().parent / "plan_ledger.json"


def _module_assignments(mod) -> dict[str, str]:
    """name -> SOURCE TEXT of every top-level assignment in ``mod``.
    The digest hashes the assignment text, not the runtime value:
    values like ``_COMPACT_ROOT = f"/tmp/..._{os.getpid()}"`` vary
    per process while their source is stable, and the source is what
    an edit actually changes."""
    import ast

    cache = getattr(mod, "__plan_ledger_assigns__", None)
    if cache is not None:
        return cache
    out: dict[str, str] = {}
    try:
        src = inspect.getsource(mod)
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        mod.__plan_ledger_assigns__ = out
        return out
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign):
            targets = [node.target]
        else:
            continue
        seg = ast.get_source_segment(src, node) or ""
        for t in targets:
            if isinstance(t, ast.Name):
                out[t.id] = seg
    mod.__plan_ledger_assigns__ = out
    return out


def _referenced_names(fn) -> set[str]:
    """Every global name the function's code (and nested lambdas /
    inner defs / comprehensions) references, plus its free variables
    (r13 ADVICE: a same-module helper reached through a closure cell
    appears in co_freevars, not co_names — without this walk it would
    escape the digest closure)."""
    names: set[str] = set()
    codes = [fn.__code__]
    while codes:
        c = codes.pop()
        names.update(c.co_names)
        names.update(c.co_freevars)
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                codes.append(const)
    return names


def _closure_functions(fn):
    """Functions captured in ``fn``'s closure cells (same-module
    helpers bound as freevars rather than globals)."""
    out = []
    for cell in fn.__closure__ or ():
        try:
            val = cell.cell_contents
        except ValueError:  # empty cell
            continue
        if isinstance(val, types.FunctionType):
            out.append(val)
    return out


def plan_source_digest(fn) -> str:
    """sha256 (16 hex chars) over the transitive same-module source
    closure of ``fn`` — see module docstring for scope rationale."""
    mod = sys.modules.get(fn.__module__)
    assigns = _module_assignments(mod) if mod is not None else {}
    seen: set[tuple[str, str]] = set()
    stack = [fn]
    parts: list[str] = []
    consts: dict[str, str] = {}
    while stack:
        f = stack.pop()
        # key includes firstlineno (r13 ADVICE: two module-level
        # assigned lambdas are both qualnamed '<lambda>' — a
        # name-only key would silently drop the second one's source)
        key = (f.__module__, f.__qualname__, f.__code__.co_firstlineno)
        if key in seen:
            continue
        seen.add(key)
        try:
            parts.append(inspect.getsource(f))
        except (OSError, TypeError):
            # dynamically-built function without retrievable source:
            # contribute its qualname so at least identity changes show
            parts.append(f"<nosource:{f.__module__}.{f.__qualname__}>")
            continue
        for g in _closure_functions(f):
            if g.__module__ == fn.__module__:
                stack.append(g)
        if mod is None:
            continue
        for name in sorted(_referenced_names(f)):
            g = getattr(mod, name, None)
            if isinstance(g, types.FunctionType) and g.__module__ == fn.__module__:
                stack.append(g)
            elif name in assigns:
                consts[name] = assigns[name]
    parts.sort()
    parts.extend(f"{k}::{v}" for k, v in sorted(consts.items()))
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


# Cross-module helpers shared by ~every entry (plans/common.py dsum /
# exact_agg / prefer_broadcast, the text operators, the table loader).
# They are DELIBERATELY outside every entry's per-plan digest closure:
# an edit touches ~all 146 entries at once, which no 50-slot driver
# window could re-prove — the full-registry local gate is the backstop.
# r13 VERDICT task 5 makes that backstop mechanical: the ledger holds a
# repo-level record of these files' content hash, and the meta-test
# fails on drift until a DATED full-gate record lands in the same
# commit (tools/update_plan_ledger.py --shared-gate "...").
SHARED_KEY = "__shared_modules__"
SHARED_MODULES = (
    "noaa_data_pipeline_spark/plans/common.py",
    "noaa_data_pipeline_spark/operators/textops.py",
    "noaa_data_pipeline_spark/tables.py",
)


def shared_modules_digest(repo: Path | None = None) -> str:
    """sha256 (16 hex chars) over the raw bytes of the shared helper
    modules, order-pinned by SHARED_MODULES. ``repo`` overrides the
    root for synthetic-edit tests."""
    if repo is None:
        repo = Path(__file__).resolve().parent.parent
    h = hashlib.sha256()
    for rel in SHARED_MODULES:
        h.update(rel.encode())
        h.update(b"\x00")
        h.update((repo / rel).read_bytes())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def load_ledger() -> dict:
    with open(LEDGER_PATH) as fh:
        return json.load(fh)


def save_ledger(ledger: dict) -> None:
    tmp = LEDGER_PATH.with_suffix(".json.tmp")
    with open(tmp, "w") as fh:
        json.dump(dict(sorted(ledger.items())), fh, indent=1)
        fh.write("\n")
    tmp.replace(LEDGER_PATH)
