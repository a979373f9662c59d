"""Structured Streaming surface: incremental ingest + windowed aggs."""
