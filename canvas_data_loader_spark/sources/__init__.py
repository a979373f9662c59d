"""Source connectors: Canvas Data API client, TSV-gz ingest, parquet."""
