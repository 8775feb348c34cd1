"""Placeholder — filled in this round."""
from . import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
