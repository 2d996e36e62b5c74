"""Structured Streaming surface (SURVEY.md §2.10 — absent from the
reference; built here because the engine's incremental-upsert seam
(create_or_extend) is exactly foreachBatch + merge, and event-time windows
are required engine capabilities)."""
