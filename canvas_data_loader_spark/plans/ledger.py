"""Import ledger: the idempotency control table.

The reference tracks per-dump state in RocksDB ("whiskey"):
``dump_processed_{id}`` in {in_progress, successful, failure,
out-of-date} plus ``last_version_processed`` = schema version
(src/main.rs:76, 119-147, 171-174, 195-206, 243-246).

Here it is a tiny parquet-backed control table — on a cluster this
would be a Delta/JDBC table; the interface is the state machine, the
storage is pluggable. Reruns become idempotent via a lookup (an
anti-join when planning many dumps at once).

State rules preserved exactly from the reference:
- skip dumps marked successful or out-of-date (main.rs:133 — note
  ``failure`` dumps ARE retried)
- a dump whose schema_version != latest is marked out-of-date and
  never imported (main.rs:141-147)
- mark in_progress before import, successful/failure after
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone

IN_PROGRESS = "in_progress"
SUCCESSFUL = "successful"
FAILURE = "failure"
OUT_OF_DATE = "out-of-date"

_SKIP_STATES = {SUCCESSFUL, OUT_OF_DATE}


@dataclass
class LedgerEntry:
    dump_id: str
    status: str
    schema_version: str
    updated_at: str


class ImportLedger:
    """File-backed KV ledger with the reference's state machine.

    Storage is a JSON-lines log (append-only, last-writer-wins on
    replay) — the moral equivalent of the RocksDB store, trivially
    swappable for a Delta table at scale.
    """

    LAST_VERSION_KEY = "__last_version_processed__"

    def __init__(self, path: str):
        self.path = path
        self._state: dict[str, LedgerEntry] = {}
        self._last_version: str | None = None
        if os.path.exists(path):
            self._replay()

    def _replay(self) -> None:
        with open(self.path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if rec["dump_id"] == self.LAST_VERSION_KEY:
                    self._last_version = rec["schema_version"]
                else:
                    self._state[rec["dump_id"]] = LedgerEntry(**rec)

    def _append(self, entry: LedgerEntry) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as fh:
            fh.write(json.dumps(entry.__dict__) + "\n")

    def _set(self, dump_id: str, status: str, schema_version: str = "") -> None:
        entry = LedgerEntry(
            dump_id=dump_id,
            status=status,
            schema_version=schema_version,
            updated_at=datetime.now(timezone.utc).isoformat(),
        )
        self._state[dump_id] = entry
        self._append(entry)

    # -- state machine (reference src/main.rs) ------------------------------
    def status(self, dump_id: str) -> str | None:
        e = self._state.get(dump_id)
        return e.status if e else None

    def should_skip(self, dump_id: str) -> bool:
        """successful / out-of-date skip; failure retries (main.rs:119-138)."""
        return self.status(dump_id) in _SKIP_STATES

    def mark_in_progress(self, dump_id: str, schema_version: str = "") -> None:
        self._set(dump_id, IN_PROGRESS, schema_version)

    def mark_successful(self, dump_id: str, schema_version: str = "") -> None:
        self._set(dump_id, SUCCESSFUL, schema_version)

    def mark_failure(self, dump_id: str, schema_version: str = "") -> None:
        self._set(dump_id, FAILURE, schema_version)

    def mark_out_of_date(self, dump_id: str, schema_version: str = "") -> None:
        self._set(dump_id, OUT_OF_DATE, schema_version)

    @property
    def last_version_processed(self) -> str | None:
        return self._last_version

    def set_last_version_processed(self, version: str) -> None:
        self._last_version = version
        self._append(
            LedgerEntry(
                dump_id=self.LAST_VERSION_KEY,
                status="",
                schema_version=version,
                updated_at=datetime.now(timezone.utc).isoformat(),
            )
        )
