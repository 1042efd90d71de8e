"""Operator library: relational, analytics, dedup, similarity, text, sketches."""
