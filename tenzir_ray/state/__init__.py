"""Mutable shared state: enrichment contexts (lookup tables, bloom filters)."""
