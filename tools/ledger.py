"""Cross-round verification ledger: which round's driver CORRECTNESS
row last proved each registered query, and whether that proof is still
current.

"Green" is mechanical, not discipline-based: every snapshot records a
SOURCE FINGERPRINT (sha256 of the query callable's source, the sources
of engine functions it references — recursively — and its oracle SQL).
The report compares each query's current fingerprint against the one
recorded with its last green proof and flags STALE on mismatch, so a
query edited after its last green driver row can't silently keep its
green status (the round-4 failure mode: q61/q67 changed via a shared
helper but stayed "green" from r2/r3 rows).

Records are TWO-SLOT since round 12 (VERDICT r11 blemish #1): the
top-level hash/sem is the fingerprint of the last DRIVER-PROVEN source;
``pending`` (when present) is the fingerprint a closing snapshot saw
that no driver row has proven yet. ``snapshot`` never promotes a
changed fingerprint to proven — it records it as pending, so an
edited-this-round query reads "pending driver proof" and leads the
next driver window MECHANICALLY (no more hand-maintained
``explicit_lead`` list in __spark_entry__). ``confirm --round N``
promotes pending -> proven for every query with a green row in
CORRECTNESS_r{N} (run it when a round's CORRECTNESS lands).

Usage:
  python tools/ledger.py                   # markdown table to stdout
  python tools/ledger.py snapshot          # record fingerprints of the
                                           # current worktree (changed ->
                                           # pending, never auto-proven)
  python tools/ledger.py snapshot --ref X  # fingerprints of git commit X
                                           # (the tree the driver actually
                                           # verifies at end of a round)
  python tools/ledger.py confirm --round N # promote pending fingerprints
                                           # proven green in round N
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import subprocess
import sys
import tempfile
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HASHES_PATH = os.path.join(REPO, "tools", "ledger_hashes.json")
PKG = "canvas_data_loader_spark"


def load_rounds(repo: str = REPO) -> dict[int, dict]:
    out = {}
    for path in sorted(glob.glob(f"{repo}/CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as f:
            out[rnd] = json.load(f)
    return out


# --- source fingerprinting -------------------------------------------------


def _engine_modules() -> list:
    """ALL engine-package modules, deterministic order. Imports the
    whole package tree first — resolving function-local imports from
    whatever happened to be in sys.modules would make fingerprints
    depend on import order."""
    import importlib
    import pkgutil

    pkg = importlib.import_module(PKG)
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PKG + "."):
        try:
            importlib.import_module(info.name)
        except ImportError:
            pass
    return [
        m
        for n, m in sorted(sys.modules.items())
        if n.startswith(PKG) and m is not None
    ]


def _engine_deps(fn, seen: set) -> list:
    """Engine-package functions reachable from ``fn``: globals named in
    its code object, attributes of engine modules it references
    (catches ``D.minhash_pairs``-style calls and shared helpers like
    the q67/q116 ``_exact_rescore``), and — for names its globals can't
    resolve — any engine-module attribute with that name (catches
    FUNCTION-LOCAL ``from .streaming.events import x`` imports, which
    never appear in ``__globals__``; this over-links same-named
    functions across modules, which errs stale-not-green — the safe
    direction). Recursive with cycle guard."""
    out = []
    g = getattr(fn, "__globals__", {})
    names = set(getattr(getattr(fn, "__code__", None), "co_names", ()))

    def take(obj):
        if (
            isinstance(obj, types.FunctionType)
            and obj.__module__
            and obj.__module__.startswith(PKG)
            and obj not in seen
        ):
            seen.add(obj)
            out.append(obj)
            out.extend(_engine_deps(obj, seen))

    for name in sorted(names):
        obj = g.get(name)
        if isinstance(obj, types.FunctionType):
            take(obj)
        elif isinstance(obj, types.ModuleType) and obj.__name__.startswith(PKG):
            for attr in sorted(names):
                take(getattr(obj, attr, None))
        elif obj is None:
            for mod in _engine_modules():
                take(getattr(mod, name, None))
    return out


# The shared source-loader trio: a change here touches EVERY query's
# full fingerprint at once (e.g. the round-5 DataFrame memoization
# staled all 120). The SEMANTIC fingerprint excludes exactly these, so
# the priority order can distinguish "this query's logic changed" (top
# of the driver window) from "only the shared loader changed" (re-queued
# too, but after the semantic changes). Loader changes stay visible —
# they make the FULL hash differ, which still reports as stale.
_LOADER_FNS = frozenset({"load", "load_events", "_pin_utc"})


def source_fingerprint(
    fn, oracle_sql: str | None, exclude: frozenset[str] = frozenset()
) -> str:
    """sha256 over the callable's source, its reachable engine-function
    sources (minus ``exclude`` by function name), and its oracle SQL.
    Whitespace-insensitive per line so reformatting alone doesn't
    invalidate a proof."""
    parts = []
    for f in [fn] + _engine_deps(fn, {fn}):
        if f is not fn and f.__name__ in exclude:
            continue
        try:
            src = inspect.getsource(f)
        except (OSError, TypeError):
            src = repr(getattr(f, "__code__", f))
        parts.append(f.__qualname__ + "\n" + "\n".join(
            ln.strip() for ln in src.splitlines() if ln.strip()
        ))
    parts.append(oracle_sql.strip() if oracle_sql else "")
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()[:16]


def current_fingerprints() -> dict[str, dict[str, str]]:
    from canvas_data_loader_spark import queries as Q

    out = {}
    for name in sorted(Q.SPARK):
        fn, osql = Q.SPARK[name], Q.ORACLE.get(name)
        out[name] = {
            "hash": source_fingerprint(fn, osql),
            "sem": source_fingerprint(fn, osql, _LOADER_FNS),
        }
    return out


def load_hashes() -> dict[str, dict]:
    if os.path.exists(HASHES_PATH):
        with open(HASHES_PATH) as f:
            return json.load(f)
    return {}


# --- status computation ----------------------------------------------------


def row_ok(row: dict) -> bool:
    return (
        row.get("err") is None
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") is not False
    )


def proof_rounds(name: str, rounds: dict[int, dict]) -> tuple[list[int], list[int]]:
    green, failed = [], []
    for rnd, data in rounds.items():
        row = data.get(name)
        if row is None:
            continue
        (green if row_ok(row) else failed).append(rnd)
    return green, failed


def status_of(
    name: str,
    rounds: dict[int, dict],
    recorded: dict[str, dict],
    current_fp: dict[str, str] | None,
) -> str:
    """green | pending driver proof | STALE (…) | FAILED last check |
    never in driver window.

    STALE = has a green row, but the current source fingerprint differs
    from the one recorded when that proof was snapshotted (or no
    fingerprint was ever recorded, so currency is unprovable). Two
    stale flavors: the query's own logic changed ("semantics"), or
    only the shared source loader it reads through changed ("loader
    only") — both need driver re-proof, semantics first.

    "pending driver proof" = a closing snapshot recorded this exact
    fingerprint as edited-but-unproven; it must lead the next driver
    window (round-12 mechanical replacement for the hand-maintained
    one-shot lead list).
    """
    green, failed = proof_rounds(name, rounds)
    if not green:
        return "FAILED last check" if failed else "never in driver window"
    if failed and max(failed) >= max(green):
        return "FAILED last check"
    rec = recorded.get(name)
    if rec is None or current_fp is None:
        return "STALE (no fingerprint recorded)"
    pend = rec.get("pending")
    if pend and pend["hash"] == current_fp["hash"]:
        return "pending driver proof"
    if rec["hash"] == current_fp["hash"]:
        return "green"
    if rec.get("sem") == current_fp["sem"]:
        return "STALE (loader only)"
    return "STALE (semantics changed)"


# --- snapshot --------------------------------------------------------------


def snapshot(ref: str | None) -> None:
    """Record the source state the next driver window will verify.

    NEVER marks a changed fingerprint proof-current (the round-11
    blemish: the closing snapshot re-bound edited rows' fingerprints
    before a driver window ran, so they read green and needed a
    hand-list to re-queue). A fingerprint that differs from the
    proven one is recorded under ``pending`` — status reads "pending
    driver proof" and the query leads the window; ``confirm`` promotes
    it once a green row lands. With --ref, fingerprint that commit's
    tree (what the driver verifies); without, the current worktree."""
    if ref is None:
        fps, label = current_fingerprints(), "worktree"
    else:
        with tempfile.TemporaryDirectory() as td:
            tar = subprocess.run(
                ["git", "-C", REPO, "archive", ref], capture_output=True, check=True
            )
            subprocess.run(["tar", "-x", "-C", td], input=tar.stdout, check=True)
            # Load THIS file (the current fingerprint logic) by path, but
            # resolve the engine package from the archived tree: the
            # module body inserts REPO into sys.path, so td must be
            # re-inserted in front immediately before the package import.
            code = (
                "import sys, json, importlib.util\n"
                f"spec = importlib.util.spec_from_file_location('ledger_now', {os.path.abspath(__file__)!r})\n"
                "L = importlib.util.module_from_spec(spec); spec.loader.exec_module(L)\n"
                f"sys.path.insert(0, {td!r})\n"
                "print(json.dumps(L.current_fingerprints()))\n"
            )
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, check=True, cwd=td
            )
            fps, label = json.loads(out.stdout.strip().splitlines()[-1]), ref
    hashes = load_hashes()
    kept = pended = cleared = 0
    for name, fp in fps.items():
        rec = hashes.get(name)
        if rec is None:
            # brand-new query: no proof exists, everything is pending.
            # The top-level slot is provisionally filled with the same
            # fingerprint (status_of needs the keys) — harmless even if
            # a later snapshot "clears" the pending as unchanged,
            # because a query with no green CORRECTNESS row reads
            # "never in driver window" (tier 0) regardless of slots.
            hashes[name] = {**fp, "ref": label, "pending": {**fp, "ref": label}}
            pended += 1
        elif rec["hash"] == fp["hash"]:
            # unchanged since last proof — a stray pending (e.g. an
            # edit that was reverted) no longer describes the tree
            if rec.pop("pending", None) is not None:
                cleared += 1
            kept += 1
        else:
            rec["pending"] = {**fp, "ref": label}
            pended += 1
    with open(HASHES_PATH, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
    print(
        f"snapshot of {label}: {kept} proof-current, {pended} pending "
        f"driver proof, {cleared} stray pendings cleared -> {HASHES_PATH}"
    )


def confirm(rnd: int) -> None:
    """Promote pending fingerprints proven by CORRECTNESS_r{rnd}: a
    query whose round-``rnd`` row is green had its snapshot-recorded
    source verified by the driver, so pending becomes the proven
    fingerprint. Queries green in the round WITHOUT a pending entry
    are untouched (their proven fingerprint already matches)."""
    rounds = load_rounds()
    if rnd not in rounds:
        raise SystemExit(f"no CORRECTNESS_r{rnd}.json in {REPO}")
    hashes = load_hashes()
    promoted, still = [], []
    for name, rec in hashes.items():
        pend = rec.get("pending")
        if not pend:
            continue
        row = rounds[rnd].get(name)
        if row is not None and row_ok(row):
            hashes[name] = {k: v for k, v in pend.items()}
            promoted.append(name)
        else:
            still.append(name)
    with open(HASHES_PATH, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
    print(
        f"round {rnd}: promoted {len(promoted)} pending fingerprints to "
        f"proven ({', '.join(sorted(promoted)) or '—'}); "
        f"{len(still)} still pending ({', '.join(sorted(still)) or '—'})"
    )


# --- report ----------------------------------------------------------------


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "snapshot":
        ref = None
        if "--ref" in sys.argv:
            ref = sys.argv[sys.argv.index("--ref") + 1]
        snapshot(ref)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "confirm":
        confirm(int(sys.argv[sys.argv.index("--round") + 1]))
        return

    from canvas_data_loader_spark import queries as Q

    rounds = load_rounds()
    recorded = load_hashes()
    fps = current_fingerprints()
    print("| query | last green driver row | failed rows | status |")
    print("|---|---|---|---|")
    bad = []
    for name in sorted(Q.SPARK):
        green, failed = proof_rounds(name, rounds)
        status = status_of(name, rounds, recorded, fps.get(name))
        if status != "green":
            bad.append(name)
        print(
            f"| {name} | {('r%d' % max(green)) if green else '—'} |"
            f" {','.join('r%d' % r for r in failed) or '—'} | {status} |"
        )
    print()
    print(f"{len(bad)} without a current green proof: {', '.join(bad)}")


if __name__ == "__main__":
    main()
