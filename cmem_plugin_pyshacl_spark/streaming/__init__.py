"""Streaming facade.

The reference is strictly batch (SURVEY.md §1.4: its only 'stream' is a
chunked HTTP upload), and the north_rule requires batch resumability via
snapshots, not Structured Streaming. This module still provides a thin
incremental-ingest path for completeness: a file-source readStream over a
pages directory, reusing the exact batch extraction/validation plans via
foreachBatch — the recommended Spark pattern for reusing batch logic."""

from .ingest import pages_stream, validate_stream  # noqa: F401
