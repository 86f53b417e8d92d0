"""Sinks: idempotent MERGE upsert + partitioned append + partition ops."""
