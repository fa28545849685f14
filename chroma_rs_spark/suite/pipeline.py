"""Placeholder — filled in incrementally."""

QUERIES: dict = {}
