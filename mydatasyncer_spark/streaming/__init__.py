"""Structured Streaming operators: windowed aggregation, streaming
sessionization, and streaming snapshot-diff maintenance."""
