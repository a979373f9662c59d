"""Layered runtime configuration (reference src/settings.rs:61-80).

Resolution order, later wins (identical to the reference's
config-rs stack): ``config/default.toml`` <- optional
``config/local.toml`` <- environment variables prefixed ``cdl`` with
``__`` as the section separator (README.md:45-54), e.g.
``cdl__database__url`` or ``cdl__save_location``.

Key names mirror settings.rs:42-57 exactly: top-level
``save_location``, ``rocksdb_location`` (kept name; backs the ledger
path here), ``skip_historical_imports``, ``only_load_final``,
``all_tables_volatile``; sections ``[canvasdataauth]``
(api_key/api_secret) and ``[database]`` (url/db_type). Unknown
db_type strings fall back to Psql like the reference
(settings.rs:113-118).
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass
from typing import Any

_BOOL_KEYS = {"skip_historical_imports", "only_load_final", "all_tables_volatile"}


def _coerce(key: str, value: str) -> Any:
    if key in _BOOL_KEYS:
        return value.strip().lower() in ("1", "true", "yes", "on")
    return value


def _load_toml(path: str) -> dict:
    with open(path, "rb") as fh:
        return tomllib.load(fh)


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _env_overrides(environ: dict[str, str]) -> dict:
    """``cdl__section__key`` / ``cdl__key`` -> nested dict (prefix
    ``cdl``, separator ``__``, case-insensitive like config-rs)."""
    out: dict = {}
    for name, value in environ.items():
        if not name.lower().startswith("cdl__"):
            continue
        parts = name.lower().split("__")[1:]
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _coerce(parts[-1], value)
    return out


@dataclass
class Settings:
    """Typed view over the merged configuration."""

    save_location: str
    rocksdb_location: str
    skip_historical_imports: bool = False
    only_load_final: bool = False
    all_tables_volatile: bool = False
    api_key: str = ""
    api_secret: str = ""
    database_url: str = ""
    db_type: str = "Psql"

    @classmethod
    def load(
        cls,
        config_dir: str = "config",
        environ: dict[str, str] | None = None,
    ) -> "Settings":
        merged: dict = {}
        default_path = os.path.join(config_dir, "default.toml")
        if os.path.exists(default_path):
            merged = _load_toml(default_path)
        local_path = os.path.join(config_dir, "local.toml")
        if os.path.exists(local_path):  # optional, like File::required(false)
            merged = _deep_merge(merged, _load_toml(local_path))
        merged = _deep_merge(
            merged, _env_overrides(environ if environ is not None else dict(os.environ))
        )
        auth = merged.get("canvasdataauth", {})
        db = merged.get("database", {})
        db_type = str(db.get("db_type", "Psql"))
        if db_type not in ("Psql", "Mysql"):
            db_type = "Psql"  # unknown strings silently -> Psql (settings.rs:113-118)
        return cls(
            save_location=str(merged.get("save_location", "/tmp/cdl-save")),
            rocksdb_location=str(merged.get("rocksdb_location", "/tmp/cdl-ledger")),
            skip_historical_imports=bool(merged.get("skip_historical_imports", False)),
            only_load_final=bool(merged.get("only_load_final", False)),
            all_tables_volatile=bool(merged.get("all_tables_volatile", False)),
            api_key=str(auth.get("api_key", "")),
            api_secret=str(auth.get("api_secret", "")),
            database_url=str(db.get("url", "")),
            db_type=db_type,
        )
