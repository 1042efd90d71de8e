"""Column-function library (GA4 helpers, scalar function surface)."""
