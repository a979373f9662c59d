"""Staleness-aware verification ledger (tools/ledger.py).

The ledger's green status must be mechanical: a green driver row only
counts while the query's source fingerprint (callable + reachable
engine helpers + oracle SQL) still matches the fingerprint recorded
when the proof was snapshotted. These tests pin the failure mode that
survived rounds 2-4: a query edited (directly or via a shared helper)
after its last green row kept reporting green.
"""

from __future__ import annotations

import importlib.util
import sys
import textwrap

import pytest

from tools.ledger import source_fingerprint, status_of


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def fake_engine(tmp_path):
    """A file-backed miniature engine package so inspect.getsource works."""

    def build(helper_body):
        pkg = tmp_path / "canvas_data_loader_spark_fake"
        pkg.mkdir(exist_ok=True)
        (pkg / "__init__.py").write_text("")
        (pkg / "ops.py").write_text(textwrap.dedent(f"""
            def helper(x):
                {helper_body}

            def query_fn(x):
                return helper(x) + 1
        """))
        mod = _load_module(pkg / "ops.py", "canvas_data_loader_spark.fake_ops")
        return mod

    return build


class TestFingerprint:
    def test_touching_query_changes_fingerprint(self, fake_engine):
        before = source_fingerprint(fake_engine("return x * 2").query_fn, "SELECT 1")
        after_reload = source_fingerprint(
            fake_engine("return x * 2").query_fn, "SELECT 1"
        )
        assert before == after_reload  # deterministic across reloads

    def test_shared_helper_change_invalidates_query(self, fake_engine):
        # The round-4 escape: q67's own source was untouched but a shared
        # helper (_exact_rescore) changed. The fingerprint must move.
        before = source_fingerprint(fake_engine("return x * 2").query_fn, "SELECT 1")
        after = source_fingerprint(fake_engine("return x * 3").query_fn, "SELECT 1")
        assert before != after

    def test_oracle_change_invalidates_query(self, fake_engine):
        fn = fake_engine("return x * 2").query_fn
        assert source_fingerprint(fn, "SELECT 1") != source_fingerprint(fn, "SELECT 2")

    def test_function_local_imports_are_walked(self):
        # q42 imports read_events_stream INSIDE the function body —
        # such names never appear in __globals__, and the first
        # fingerprint implementation missed them (the round-5 streaming
        # probe change left all 7 streaming queries falsely green).
        from canvas_data_loader_spark import queries as Q
        from tools.ledger import _engine_deps

        fn = Q.SPARK["q42_stream_tumbling"]
        names = {d.__qualname__ for d in _engine_deps(fn, {fn})}
        assert "read_events_stream" in names
        assert "_probe_ts_is_long" in names  # transitively

    def test_real_registry_walks_shared_helpers(self):
        # q67 and q116 share simsearch._exact_rescore through a module
        # reference — the dependency walk must reach it for both, so a
        # helper edit stales BOTH queries.
        from canvas_data_loader_spark import queries as Q
        from canvas_data_loader_spark.operators import simsearch as S
        from tools.ledger import _engine_deps

        for qname in ("q67_embedding_neardup", "q116_lsh_neardup_pairs"):
            fn = Q.SPARK[qname]
            deps = _engine_deps(fn, {fn})
            names = {d.__qualname__ for d in deps}
            assert any("_exact_rescore" in n for n in names), (qname, names)


def fp(h, sem):
    return {"hash": h, "sem": sem}


class TestStatus:
    ROUNDS = {
        1: {"qA": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}},
        2: {"qB": {"err": "boom", "rows_match": False, "schema_match": False, "hash_match": False}},
    }

    def test_green_when_fingerprint_matches(self):
        rec = {"qA": fp("f" * 16, "s" * 16)}
        assert status_of("qA", self.ROUNDS, rec, fp("f" * 16, "s" * 16)) == "green"

    def test_semantics_stale_when_own_logic_changed(self):
        rec = {"qA": fp("f" * 16, "s" * 16)}
        s = status_of("qA", self.ROUNDS, rec, fp("0" * 16, "0" * 16))
        assert s == "STALE (semantics changed)"

    def test_loader_only_stale_when_sem_hash_survives(self):
        # full hash moved (shared loader edited) but the semantic hash
        # — which excludes the loader trio — is unchanged
        rec = {"qA": fp("f" * 16, "s" * 16)}
        s = status_of("qA", self.ROUNDS, rec, fp("0" * 16, "s" * 16))
        assert s == "STALE (loader only)"

    def test_stale_when_never_recorded(self):
        assert status_of("qA", self.ROUNDS, {}, fp("f" * 16, "s" * 16)).startswith("STALE")

    def test_failed_and_never_rows(self):
        assert status_of("qB", self.ROUNDS, {}, fp("x", "x")) == "FAILED last check"
        assert status_of("qC", self.ROUNDS, {}, fp("x", "x")) == "never in driver window"

    def test_newer_failure_beats_old_green(self):
        rounds = {
            1: {"qA": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}},
            3: {"qA": {"err": "x", "rows_match": False, "schema_match": False, "hash_match": False}},
        }
        rec = {"qA": fp("f" * 16, "s" * 16)}
        assert status_of("qA", rounds, rec, fp("f" * 16, "s" * 16)) == "FAILED last check"

    def test_pending_fingerprint_leads_not_green(self):
        # Round-12 mechanics: a closing snapshot records an edited
        # query's fingerprint under "pending" — status must read
        # "pending driver proof" (tier 0 in the window), NOT green,
        # even though the recorded pending hash equals the current one.
        rec = {
            "qA": {
                **fp("f" * 16, "s" * 16),
                "pending": fp("e" * 16, "t" * 16),
            }
        }
        s = status_of("qA", self.ROUNDS, rec, fp("e" * 16, "t" * 16))
        assert s == "pending driver proof"
        # the proven fingerprint still reads green (edit reverted)
        assert status_of("qA", self.ROUNDS, rec, fp("f" * 16, "s" * 16)) == "green"
        # a THIRD fingerprint (edited again after the snapshot) is stale
        s = status_of("qA", self.ROUNDS, rec, fp("0" * 16, "0" * 16))
        assert s == "STALE (semantics changed)"

    def test_loader_change_stales_every_query_but_sem_separates(self):
        # the round-5 incident in miniature: current_fingerprints()'s
        # sem hash must NOT include the loader trio, so a load() edit
        # moves "hash" for all queries while "sem" moves for none
        from tools.ledger import _LOADER_FNS, current_fingerprints

        assert _LOADER_FNS == {"load", "load_events", "_pin_utc"}
        fps = current_fingerprints()
        some = fps["q01_pricing_summary"]
        assert set(some) == {"hash", "sem"} and some["hash"] != some["sem"]


class TestSnapshotConfirm:
    """The round-12 snapshot/confirm cycle: a closing snapshot must
    never promote an edited fingerprint to proven (the round-11
    blemish that required a hand-maintained lead list); confirm
    promotes exactly the pendings a green CORRECTNESS row covers."""

    def _run_cycle(self, monkeypatch, tmp_path, steps):
        import json

        import tools.ledger as L

        hpath = tmp_path / "hashes.json"
        monkeypatch.setattr(L, "HASHES_PATH", str(hpath))
        out = []
        for kind, payload in steps:
            if kind == "fps":
                monkeypatch.setattr(L, "current_fingerprints", lambda p=payload: p)
                L.snapshot(None)
            elif kind == "rounds":
                monkeypatch.setattr(L, "load_rounds", lambda p=payload: p)
                L.confirm(max(payload))
            out.append(json.loads(hpath.read_text()))
        return out

    GREEN = {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
    RED = {"err": "boom", "rows_match": False, "schema_match": False, "hash_match": False}

    def test_edit_self_queues_and_confirm_promotes(self, monkeypatch, tmp_path):
        from tools.ledger import status_of

        v1, v2 = fp("a" * 16, "a" * 16), fp("b" * 16, "b" * 16)
        states = self._run_cycle(
            monkeypatch,
            tmp_path,
            [
                ("fps", {"qA": v1}),                      # new query -> pending
                ("rounds", {1: {"qA": self.GREEN}}),      # driver proves it
                ("fps", {"qA": v2}),                      # edited -> pending again
            ],
        )
        # 1) brand-new query is pending, not proven
        assert states[0]["qA"]["pending"]["hash"] == v1["hash"]
        assert status_of(
            "qA", {1: {"qA": self.GREEN}}, states[0], v1
        ) == "pending driver proof"
        # 2) confirm promoted it: pending gone, proven == v1
        assert "pending" not in states[1]["qA"]
        assert states[1]["qA"]["hash"] == v1["hash"]
        assert status_of("qA", {1: {"qA": self.GREEN}}, states[1], v1) == "green"
        # 3) the edit re-queued itself mechanically — no hand list
        assert states[2]["qA"]["hash"] == v1["hash"]  # proven unchanged
        assert states[2]["qA"]["pending"]["hash"] == v2["hash"]
        assert status_of(
            "qA", {1: {"qA": self.GREEN}}, states[2], v2
        ) == "pending driver proof"

    def test_confirm_skips_failed_rows_and_revert_clears_pending(
        self, monkeypatch, tmp_path
    ):
        v1, v2 = fp("a" * 16, "a" * 16), fp("b" * 16, "b" * 16)
        states = self._run_cycle(
            monkeypatch,
            tmp_path,
            [
                ("fps", {"qA": v1}),
                ("rounds", {1: {"qA": self.GREEN}}),
                ("fps", {"qA": v2}),                 # edit -> pending v2
                ("rounds", {1: {"qA": self.GREEN}, 2: {"qA": self.RED}}),
                ("fps", {"qA": v1}),                 # revert -> pending cleared
            ],
        )
        # failed round-2 row must NOT promote pending v2
        assert states[3]["qA"]["hash"] == v1["hash"]
        assert states[3]["qA"]["pending"]["hash"] == v2["hash"]
        # reverting to the proven source clears the stray pending
        assert "pending" not in states[4]["qA"]
        assert states[4]["qA"]["hash"] == v1["hash"]
