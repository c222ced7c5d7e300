"""Mutable shared state: enrichment contexts (lookup tables, bloom filters)."""
from tenzir_ray.state.context import (
    BloomFilter,
    GeoTable,
    LookupTable,
    SubnetTable,
    bloom_filter_semi_join,
    enrich,
    enrich_geo,
    enrich_subnet,
)
from tenzir_ray.state.concepts import ConceptMap, select_concepts, where_concept

__all__ = ["LookupTable", "SubnetTable", "GeoTable", "BloomFilter",
           "enrich", "enrich_subnet", "enrich_geo", "bloom_filter_semi_join",
           "ConceptMap", "where_concept", "select_concepts"]
