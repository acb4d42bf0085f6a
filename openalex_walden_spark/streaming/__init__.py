"""Structured-Streaming plane: file-source ingest, SCD1 upsert streams,
change-log chaining, expectations (SURVEY.md §2.9 St1-St5)."""
