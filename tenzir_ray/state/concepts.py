"""Taxonomies / concepts — schema-agnostic field aliasing (reference
web/docs/data-model/taxonomies.md; shipped concept definitions under
schema/concepts/): a *concept* names a logical field ("source_ip") that
maps to different concrete fields per data source ("src_ip",
"id.orig_h", "source.address", …). Binding resolves the concept against
each batch's actual schema and predicates expand to the disjunction over
every bound field — the same rule as the expression language's suffix
extractors.
"""

from __future__ import annotations

import sys

import pyarrow.compute as pc
import pyarrow.dataset as pads

from tenzir_ray._ship import ship_by_value


class ConceptMap:
    """concept name → ordered candidate field names."""

    def __init__(self, concepts: dict[str, list[str]]):
        self.concepts = {k: list(v) for k, v in concepts.items()}

    def resolve(self, schema, concept: str) -> list[str]:
        """Concrete columns the concept binds to in ``schema`` (every
        candidate present, in candidate order)."""
        cands = self.concepts.get(concept, [concept])
        names = set(schema.names)
        return [c for c in cands if c in names]

    def first(self, schema, concept: str) -> str | None:
        bound = self.resolve(schema, concept)
        return bound[0] if bound else None


def where_concept(ds, concepts: ConceptMap, concept: str, op: str, value):
    """Filter by ``<concept> <op> <value>``: the predicate binds to every
    matching concrete field per batch schema (disjunction), exactly like
    the reference's concept lookup in expressions. Delegates to the
    shared predicate builder in :mod:`tenzir_ray.expr`."""
    from tenzir_ray.expr import disjunction_predicate

    def _f(batch):
        expr = disjunction_predicate(
            concepts.resolve(batch.schema, concept), op, value
        )
        if expr is None:
            return batch.slice(0, 0)
        return pads.dataset(batch).to_table(filter=expr)

    return ds.map_batches(_f, batch_format="pyarrow")


def select_concepts(ds, concepts: ConceptMap, names: list[str],
                    strict: bool = False):
    """Project concepts to a UNIFORM schema: each output column is named
    by the concept and filled from the first bound candidate (null
    column when nothing binds unless ``strict``) — the cross-source
    normalization taxonomies exist for."""
    import pyarrow as pa

    def _f(batch):
        cols, out_names = [], []
        for concept in names:
            src = concepts.first(batch.schema, concept)
            if src is None:
                if strict:
                    raise KeyError(
                        f"concept {concept!r} binds nothing in "
                        f"{list(batch.schema.names)}"
                    )
                # pa.null() widens cleanly against any bound type in
                # other blocks (string would conflict with e.g. int64)
                cols.append(pa.nulls(batch.num_rows, pa.null()))
            else:
                cols.append(batch.column(src))
            out_names.append(concept)
        return pa.table(cols, names=out_names)

    return ds.map_batches(_f, batch_format="pyarrow")


ship_by_value(sys.modules[__name__])
