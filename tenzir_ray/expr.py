"""Expression compiler: predicate/value expressions → pyarrow compute.

The analog of the reference's expression language
(web/docs/language/expressions.md; AST in
libtenzir/include/tenzir/expression.hpp, evaluated per batch as bitmaps in
libtenzir/src/table_slice.cpp:609-629). Instead of inventing a parser we
accept Python expression syntax (parsed with ``ast``) and compile it to
``pyarrow.dataset`` expressions (``pc.field``/scalars), which serve double
duty:

- evaluated per batch inside ``map_batches`` (vectorized bitmap filter,
  like the reference's ``evaluate``), and
- pushed down into ``ray.data.read_parquet(filter=...)`` for row-group
  pruning (the reference's catalog/sketch pruning analog,
  libtenzir/builtins/operators/export.cpp:139).

Supported: comparisons (== != < <= > >=, chained), boolean and/or/not,
arithmetic (+ - * / %), field names (dotted via attribute access),
literals, ``x in [..]`` / ``x not in [..]``, ``is None`` / ``is not
None``, and a small function library (abs, len/str ops via method calls
like ``text.startswith("a")``).
"""

from __future__ import annotations

import ast

import pyarrow.compute as pc
import pyarrow.dataset as pads

_METHOD_MAP = {
    "startswith": lambda col, pat: pc.starts_with(col, pat),
    "endswith": lambda col, pat: pc.ends_with(col, pat),
    "contains": lambda col, pat: pc.match_substring(col, pat),
    "match": lambda col, pat: pc.match_substring_regex(col, pat),
    "lower": lambda col: pc.utf8_lower(col),
    "upper": lambda col: pc.utf8_upper(col),
    "strip": lambda col: pc.utf8_trim_whitespace(col),
    "isin": lambda col, values: col.isin(values),
}

def _lift(op):
    """pyarrow Expression lacks reflected ops (__rsub__ …): lift plain
    Python scalars on the left into pc.scalar expressions."""

    def f(a, b):
        if not isinstance(a, pads.Expression) and isinstance(b, pads.Expression):
            a = pc.scalar(a)
        return op(a, b)

    return f


_BINOP = {
    ast.Add: _lift(lambda a, b: a + b),
    ast.Sub: _lift(lambda a, b: a - b),
    ast.Mult: _lift(lambda a, b: a * b),
    ast.Div: _lift(lambda a, b: a / b),
}

_CMPOP = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}


_DATE_RE = __import__("re").compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$"
)


def _date_literal(v):
    """ISO-date-shaped string literals in comparisons become datetime
    scalars (the reference's time literals, expressions.md) — Arrow has no
    timestamp<->string comparison kernel."""
    if isinstance(v, str) and _DATE_RE.match(v):
        from datetime import datetime

        return datetime.fromisoformat(v)
    return v


def compile_expr(text: str) -> pads.Expression:
    """Compile an expression string to a pyarrow.dataset Expression.

    Bare field names become ``pc.field(name)``; dotted paths
    (``props.id``) become nested field refs.
    """
    tree = ast.parse(text, mode="eval")
    return _compile(tree.body)


def _field_path(node: ast.expr) -> tuple[str, ...] | None:
    if isinstance(node, ast.Name):
        return (node.id,)
    if isinstance(node, ast.Attribute):
        base = _field_path(node.value)
        if base is not None:
            return base + (node.attr,)
    return None


def _compile(node: ast.expr):
    if isinstance(node, ast.BoolOp):
        parts = [_compile(v) for v in node.values]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if isinstance(node.op, ast.And) else (out | p)
        return out
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.Not):
            return ~_compile(node.operand)
        if isinstance(node.op, ast.USub):
            operand = _compile(node.operand)
            return -operand if not isinstance(operand, pads.Expression) else 0 - operand
    if isinstance(node, ast.Compare):
        out = None
        left_node = node.left
        for op, comp in zip(node.ops, node.comparators):
            left = _compile(left_node)
            if isinstance(op, (ast.In, ast.NotIn)):
                term = left.isin(_compile(comp))
                if isinstance(op, ast.NotIn):
                    term = ~term
            elif isinstance(op, (ast.Is, ast.IsNot)):
                if not (isinstance(comp, ast.Constant) and comp.value is None):
                    raise ValueError("`is` only supported with None")
                term = left.is_null() if isinstance(op, ast.Is) else left.is_valid()
            else:
                term = _CMPOP[type(op)](left, _date_literal(_compile(comp)))
            out = term if out is None else out & term
            left_node = comp
        return out
    if isinstance(node, ast.BinOp) and type(node.op) in _BINOP:
        return _BINOP[type(node.op)](_compile(node.left), _compile(node.right))
    if isinstance(node, ast.Call):
        if isinstance(node.func, ast.Attribute):
            path = _field_path(node.func.value)
            if path is not None and node.func.attr in _METHOD_MAP:
                col = pc.field(*path)
                args = [_compile(a) for a in node.args]
                return _METHOD_MAP[node.func.attr](col, *args)
        if isinstance(node.func, ast.Name) and node.func.id == "abs":
            return abs(_compile(node.args[0]))
        raise ValueError(f"unsupported call: {ast.dump(node)}")
    path = _field_path(node)
    if path is not None:
        return pc.field(*path)
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, (ast.List, ast.Tuple)):
        return [_compile(e) for e in node.elts]
    raise ValueError(f"unsupported expression node: {ast.dump(node)}")


# ---------------------------------------------------------------------------
# extractors — the reference's suffix / type / meta extractor semantics
# (web/docs/language/expressions.md:100-167): a *suffix* extractor `z`
# matches any field whose dotted path ends in `.z`; a *type* extractor
# `:ip` / `:timestamp` matches every field of that type; meta extractors
# (`#schema`) read stream metadata — here the `_schema` column our JSON
# selector parsers emit. Binding expands to a DISJUNCTION over matching
# fields, evaluated per batch schema.


def resolve_extractor(schema, extractor: str) -> list[str]:
    """Column names a reference-style extractor binds to in ``schema``
    (a ``pa.Schema``). Supports ``:typename`` type extractors
    (int/uint/float/string/timestamp/bool/duration and exact Arrow type
    strings), ``#schema``-style meta extractors, plain names, and suffix
    semantics (``z`` ≡ ``*.z`` over dotted flattened names)."""
    import pyarrow as pa

    names = schema.names
    if extractor.startswith("#"):
        meta = "_" + extractor[1:]
        return [meta] if meta in names else []
    if extractor.startswith(":"):
        want = extractor[1:]
        checks = {
            "int": pa.types.is_signed_integer,
            "uint": pa.types.is_unsigned_integer,
            "integer": pa.types.is_integer,
            "float": pa.types.is_floating,
            "double": pa.types.is_floating,
            "string": pa.types.is_string,
            "bool": pa.types.is_boolean,
            "timestamp": pa.types.is_timestamp,
            "time": pa.types.is_timestamp,
            "duration": pa.types.is_duration,
            "blob": pa.types.is_binary,
        }
        pred = checks.get(want)
        if pred is not None:
            return [f.name for f in schema if pred(f.type)]
        return [f.name for f in schema if str(f.type) == want]
    if extractor in names:
        return [extractor]
    suffix = "." + extractor
    return [n for n in names if n.endswith(suffix)]


_PRED_OPS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "in": lambda c, v: c.isin(v),
}


def disjunction_predicate(columns: list[str], op: str, value):
    """``<any of columns> <op> <value>`` as ONE pads expression (the
    reference's multi-field binding rule); None when nothing binds
    (⇒ no rows). Shared by extractors and concepts."""
    if not columns:
        return None
    out = None
    for name in columns:
        term = _PRED_OPS[op](pc.field(name), value)
        out = term if out is None else out | term
    return out


def extractor_predicate(schema, extractor: str, op: str, value):
    """Compile ``<extractor> <op> <value>`` into ONE pads expression: the
    disjunction over every field the extractor binds to."""
    return disjunction_predicate(resolve_extractor(schema, extractor), op, value)


def where_extractor(ds, extractor: str, op: str, value):
    """Filter by a reference-style extractor predicate (suffix / type /
    meta semantics), bound against each batch's schema at runtime."""

    def _f(batch):
        expr = extractor_predicate(batch.schema, extractor, op, value)
        if expr is None:
            return batch.slice(0, 0)
        return pads.dataset(batch).to_table(filter=expr)

    return ds.map_batches(_f, batch_format="pyarrow")


import sys as _sys
from tenzir_ray._ship import ship_by_value as _ship
_ship(_sys.modules[__name__])
