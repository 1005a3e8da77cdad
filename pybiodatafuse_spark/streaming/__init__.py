"""Structured Streaming jobs (incremental ingest of crawl/event streams)."""
