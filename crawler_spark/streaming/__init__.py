"""Structured Streaming surface: continuous frontier ingest."""
