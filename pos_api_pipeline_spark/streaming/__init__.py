"""Structured Streaming surface: windowed aggregation, late-data
watermarks, streaming dedup, stateful sessionization."""
