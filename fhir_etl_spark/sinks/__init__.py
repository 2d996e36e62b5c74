"""Sinks: NDJSON emission (parity single-file + scale multi-part) and
merge-by-id upsert."""
