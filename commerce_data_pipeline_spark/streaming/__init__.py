"""Structured Streaming surface: the same event analytics, incremental."""
