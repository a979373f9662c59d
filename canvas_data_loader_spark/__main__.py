"""CLI runner: the ``cdl-runner`` analog (reference src/main.rs:55).

One invocation = one import cycle (the unit the reference schedules
hourly from cron, README.md:31-33): load layered settings, build the
signed API client, list dumps, and run the import pipeline. Intended
use::

    python -m canvas_data_loader_spark --config-dir config \
        [--warehouse-dir DIR] [--offline-fixture DIR]

``--offline-fixture`` points at a directory of canned JSON fixtures
(served through LocalDirTransport) for running without network — the
signing, planning, merge, and ledger code paths are identical.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="canvas_data_loader_spark")
    ap.add_argument("--config-dir", default="config")
    ap.add_argument("--warehouse-dir", default=None)
    ap.add_argument("--offline-fixture", default=None)
    args = ap.parse_args(argv)

    from .plans.pipeline import ImportPipeline, PipelineConfig
    from .session import get_spark
    from .settings import Settings
    from .sources.api_client import (
        CanvasDataApiClient,
        HttpTransport,
        LocalDirTransport,
    )

    st = Settings.load(args.config_dir)
    if args.offline_fixture:
        fx = args.offline_fixture
        with open(os.path.join(fx, "dumps.json")) as fh:
            dumps_json = json.load(fh)
        with open(os.path.join(fx, "schema.json")) as fh:
            schema_json = json.load(fh)
        with open(os.path.join(fx, "files_by_dump.json")) as fh:
            files_json = json.load(fh)
        # payloads/ holds one file per shard, named by the shard
        # filename; the transport fetches by URL, so key the payload
        # map by every URL whose basename matches.
        by_name = {}
        payload_dir = os.path.join(fx, "payloads")
        if os.path.isdir(payload_dir):
            for name in os.listdir(payload_dir):
                with open(os.path.join(payload_dir, name), "rb") as fh:
                    by_name[name] = fh.read()
        payloads = {}
        for fd in files_json.values():
            for art in fd.get("artifactsByTable", {}).values():
                for f in art.get("files", []):
                    base = f["filename"]
                    if base in by_name:
                        payloads[f["url"]] = by_name[base]
        transport = LocalDirTransport(dumps_json, schema_json, files_json, payloads)
    else:
        transport = HttpTransport()

    client = CanvasDataApiClient(st.api_key, st.api_secret, transport)
    spark = get_spark("cdl-runner")
    cfg = PipelineConfig(
        stage_dir=st.save_location,
        warehouse_dir=args.warehouse_dir or os.path.join(st.save_location, "warehouse"),
        ledger_path=st.rocksdb_location,
        only_load_final=st.only_load_final,
        skip_historical_imports=st.skip_historical_imports,
        all_tables_volatile=st.all_tables_volatile,
    )
    pipeline = ImportPipeline(spark, client, cfg)
    results = pipeline.run()
    for r in results:
        print(f"{r.dump_id}: {r.status}")
    return 0 if all(r.status != "failure" for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
