"""Structured Streaming surface: drop-zone ingest + event-time ops."""
