"""Structured-Streaming surface: continuous page-capture ingest."""
