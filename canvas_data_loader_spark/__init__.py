"""canvas_data_loader_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of instructure/canvas-data-loader (a Rust
batch ETL loader, see /root/reference) as an idiomatic Spark engine:

- ``schema``     Canvas type system -> Spark StructType, key inference,
                 filename routing, volatile-table routing
                 (reference: src/type_converter.rs, src/importer.rs)
- ``sources``    HMAC-signed Canvas Data API client, TSV-gz ingest
                 (reference: src/api_client.rs)
- ``operators``  keyed merge/upsert, dedup family, similarity search,
                 text analysis, relational query surface
                 (reference: src/importer.rs:345-390 for merge; the
                 query surface is the Tier-B extension from SURVEY.md §2)
- ``plans``      import ledger + pipeline orchestration
                 (reference: src/main.rs)
- ``streaming``  Structured-Streaming incremental ingest + windowed aggs
                 (the Spark-native analog of the reference's hourly cron)

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.
"""

__version__ = "0.1.0"
