"""Structured Streaming surface (chunked ingest, windowed aggregation)."""
