"""Incremental ingestion via Structured Streaming foreachBatch."""
