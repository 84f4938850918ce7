"""Structured Streaming ingest of crawl batches."""
