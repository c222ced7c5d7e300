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
import re

import pyarrow as pa
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
    "lstrip": lambda col: pc.utf8_ltrim_whitespace(col),
    "rstrip": lambda col: pc.utf8_rtrim_whitespace(col),
    "title": lambda col: pc.utf8_title(col),
    "capitalize": lambda col: pc.utf8_capitalize(col),
    "reverse": lambda col: pc.utf8_reverse(col),
    "length": lambda col: pc.utf8_length(col),
    # Python-style 0-based substring by codepoints (SQL substr is
    # 1-based — adjust in oracle SQL)
    "substr": lambda col, start, length=None: pc.utf8_slice_codeunits(
        col, start, None if length is None else start + length),
    "replace": lambda col, old, new: pc.replace_substring(
        col, pattern=old, replacement=new),
    "regex_replace": lambda col, pat, new: pc.replace_substring_regex(
        col, pattern=pat, replacement=new),
    "find": lambda col, sub: pc.find_substring(col, sub),
    "count": lambda col, sub: pc.count_substring(col, sub),
    "lpad": lambda col, width, pad=" ": pc.utf8_lpad(
        col, width=width, padding=pad),
    "rpad": lambda col, width, pad=" ": pc.utf8_rpad(
        col, width=width, padding=pad),
    "split": lambda col, sep: pc.split_pattern(col, pattern=sep),
    "isin": lambda col, values: col.isin(values),
    # unicode normalization (decomposing forms only: this pyarrow's
    # utf8_normalize NFC/NFKC skips the recomposition step — verified
    # against unicodedata — so composing forms go through
    # stages.text.normalize_unicode instead). strip_accents is NFD +
    # drop combining marks, which leaves compatibility ligatures alone
    # exactly like DuckDB's strip_accents.
    "normalize": lambda col, form="NFD": _utf8_normalize_checked(col, form),
    "strip_accents": lambda col: pc.replace_substring_regex(
        pc.utf8_normalize(col, form="NFD"), pattern=r"\p{Mn}",
        replacement=""),
    # temporal component extraction (DuckDB-parity: dow is Sunday=0,
    # isodow Monday=1, week = ISO week; Arrow's day_of_week is Monday=0
    # hence the remaps)
    "year": lambda col: pc.year(col),
    "month": lambda col: pc.month(col),
    "day": lambda col: pc.day(col),
    "hour": lambda col: pc.hour(col),
    "minute": lambda col: pc.minute(col),
    "second": lambda col: pc.second(col),
    "dow": lambda col: pc.if_else(
        pc.equal(pc.day_of_week(col), 6), 0,
        pc.add(pc.day_of_week(col), 1)),
    "isodow": lambda col: pc.add(pc.day_of_week(col), 1),
    "week": lambda col: pc.iso_week(col),
    "quarter": lambda col: pc.quarter(col),
    "trunc": lambda col, unit="day": pc.floor_temporal(col, unit=unit),
    # Expression.cast — pc.cast rejects pads Expressions; normalize to
    # microsecond resolution FIRST so ns/s/date columns don't leak
    # their raw storage unit
    "epoch_us": lambda col: col.cast(pa.timestamp("us")).cast(pa.int64()),
    # cast family. NOTE: these are Arrow SAFE casts — a fractional
    # float in `.int()` RAISES (ArrowInvalid) rather than rounding the
    # way SQL CAST(x AS BIGINT) does; write `round(x).int()` for the
    # SQL behavior. Loud-by-default beats silently diverging from the
    # user's engine of reference.
    "str": lambda col: col.cast(pa.string()),
    "int": lambda col: col.cast(pa.int64()),
    "float": lambda col: col.cast(pa.float64()),
}


def _utf8_normalize_checked(col, form):
    if form not in ("NFD", "NFKD"):
        raise ValueError(
            f"normalize({form!r}): this pyarrow's utf8_normalize does not "
            "recompose (NFC/NFKC come back decomposed); use "
            "tenzir_ray.stages.text.normalize_unicode for composing forms")
    return pc.utf8_normalize(col, form=form)

def _mathfn(pcfn, pyfn):
    """Dispatch a unary/binary math function over pads Expressions
    (Arrow kernel) or plain literals (Python math)."""

    def f(*args):
        if any(isinstance(a, pads.Expression) for a in args):
            return pcfn(*args)
        return pyfn(*args)

    return f


def _py_round(x, n=0):
    return round(x, int(n))


#: reference-style function calls in expressions: round(x[, n]),
#: floor/ceil/sqrt/exp/ln (Arrow kernels on columns, math on literals)
import math as _math  # noqa: E402

def _round_expr(x, n=0):
    if isinstance(n, pads.Expression):
        raise ValueError(
            "round(x, n): n must be an integer literal, not a column")
    return pc.round(x, ndigits=int(n))


def _nullif(a, b):
    """SQL NULLIF: a unless a == b, else null (DuckDB semantics). The
    typed-null third operand unifies at evaluation, so no Arrow
    null-typed-constant kernel abort (probed on this pyarrow)."""
    import pyarrow as _pa

    if isinstance(a, pads.Expression) or isinstance(b, pads.Expression):
        return pc.if_else(pc.not_equal(a, b), a, _pa.scalar(None))
    return None if a == b else a


def _skipnull_extremum(pcfn, pyfn):
    def f(*args):
        if any(isinstance(a, pads.Expression) for a in args):
            return pcfn(*args)
        vals = [a for a in args if a is not None]
        return pyfn(vals) if vals else None
    return f


_MATH_FNS = {
    "round": _mathfn(_round_expr, _py_round),
    "floor": _mathfn(pc.floor, _math.floor),
    "ceil": _mathfn(pc.ceil, _math.ceil),
    "sqrt": _mathfn(pc.sqrt, _math.sqrt),
    "exp": _mathfn(pc.exp, _math.exp),
    "ln": _mathfn(pc.ln, _math.log),
    # SQL n-ary conditionals (DuckDB parity: greatest/least skip nulls,
    # all-null -> null)
    "greatest": _skipnull_extremum(pc.max_element_wise, max),
    "least": _skipnull_extremum(pc.min_element_wise, min),
    "nullif": _nullif,
}


def _efloor(x):
    """floor() that works on both plain numbers and pads Expressions
    (pc.floor dispatches to an Expression call on the latter)."""
    if isinstance(x, pads.Expression):
        return pc.floor(x)
    import math

    return math.floor(x) if isinstance(x, float) else x


def _trunc_mod(a, b):
    return a - _efloor(a / b) * b


def _floor_mod(a, b):
    """Python floor-mod semantics (sign of the divisor) over plain
    numbers AND pads Expressions — see the _BINOP comment."""
    return _trunc_mod(_trunc_mod(a, b) + b, b)


def _lift(op):
    """pyarrow Expression lacks reflected ops (__rsub__ …): lift plain
    Python scalars on the left into pc.scalar expressions."""

    def f(a, b):
        from datetime import timedelta

        # date-string ± duration literal → datetime arithmetic
        # ('2026-01-15' + 36h); _date_literal is a no-op on other strings
        if isinstance(a, timedelta) and isinstance(b, str):
            b = _date_literal(b)
        elif isinstance(b, timedelta) and isinstance(a, str):
            a = _date_literal(a)
        if not isinstance(a, pads.Expression) and isinstance(b, pads.Expression):
            a = pc.scalar(a)
        return op(a, b)

    return f


_BINOP = {
    ast.Add: _lift(lambda a, b: a + b),
    ast.Sub: _lift(lambda a, b: a - b),
    ast.Mult: _lift(lambda a, b: a * b),
    ast.Div: _lift(lambda a, b: a / b),
    # there is no pc.mod kernel for pads Expressions. a - floor(a/b)*b
    # alone is TRUNC-mod on integer columns (Arrow's int `/` truncates
    # before the no-op floor), which diverges from Python on negatives
    # (-7 % 3 must be 2, not -1). The double identity
    # tm(tm(a,b) + b, b) lifts trunc-mod to floor-mod for every sign
    # combination, on ints and floats alike; // then derives as
    # (a - mod) / b, exact by construction.
    ast.Mod: _lift(lambda a, b: _floor_mod(a, b)),
    ast.FloorDiv: _lift(lambda a, b: _efloor((a - _floor_mod(a, b)) / b)),
}

_CMPOP = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}


_DATE_RE = re.compile(
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


# --- typed literals (reference web/docs/language/expressions.md) ----------
# The reference's language has first-class ip (1.2.3.4), subnet
# (10.0.0.0/8) and duration (24h) literals. Python's ast can't lex those,
# so a quote-aware preprocessor rewrites them into marker calls
# (__ip__ / __subnet__ / __dur__) before parsing; users can also write
# ip("..."), subnet("...") and dur("...") directly (e.g. for IPv6, whose
# colon syntax can't be rewritten safely).

_CIDR_RE = re.compile(r"(?<![\w.])((?:\d{1,3}\.){3}\d{1,3}/\d{1,3})(?![\w.])")
_IPV4_RE = re.compile(r"(?<![\w.])((?:\d{1,3}\.){3}\d{1,3})(?![\w./])")
_DUR_RE = re.compile(r"(?<![\w.])(\d+(?:\.\d+)?)(ns|us|ms|s|min|m|h|d|w)\b(?!\s*\()")

_DUR_UNIT_S = {
    "ns": 1e-9, "us": 1e-6, "ms": 1e-3, "s": 1.0,
    "m": 60.0, "min": 60.0, "h": 3600.0, "d": 86400.0, "w": 604800.0,
}


def duration_value(text: str):
    """'24h' / '1.5s' / '250ms' → datetime.timedelta."""
    from datetime import timedelta

    m = re.fullmatch(r"(\d+(?:\.\d+)?)\s*([a-z]+)", text.strip())
    if not m or m.group(2) not in _DUR_UNIT_S:
        raise ValueError(f"bad duration literal {text!r}")
    return timedelta(seconds=float(m.group(1)) * _DUR_UNIT_S[m.group(2)])


class SubnetLiteral:
    """Marker produced for CIDR literals; only valid on the right of
    ``in`` / ``not in`` (membership), compiled to the vectorized
    iptype.subnet_mask kernel by :func:`compile_filter`."""

    def __init__(self, cidr: str):
        from tenzir_ray.iptype import parse_cidr

        parse_cidr(cidr)  # validate eagerly — fail at compile time
        self.cidr = cidr

    def __repr__(self):
        return f"subnet({self.cidr!r})"


class PatternLiteral:
    """Regex pattern literal ``/re/`` (reference expressions.md patterns,
    RE2 partial-match semantics): valid with ``==`` / ``!=``, compiled
    to ``pc.match_substring_regex``."""

    def __init__(self, pattern: str):
        re.compile(pattern)  # validate eagerly — fail at compile time
        self.pattern = pattern

    def __repr__(self):
        return f"pattern(/{self.pattern}/)"


# a pattern literal is only lexed directly after ==/!=/in — `/` anywhere
# else stays division
_PAT_RE = re.compile(r"(==|!=|\bin)\s*/((?:[^/\\\"]|\\.)*)/")


#: `A ni B` (reference operator.hpp:44-55: "B in A", i.e. A contains B)
#: and its negation. Operands are single tokens by the time this runs —
#: quoted strings are placeholders (__qstr_N__).
_NI_RE = re.compile(r"([\w.]+)\s+(!?)ni\s+([\w.\-/:]+)")
_QSTR_RE = re.compile(r"__qstr_(\d+)__")

#: relative-time literals: `2 hours ago`, `now` (expressions.md:52).
#: `now` is reserved as a keyword — a column named `now` needs quoting
#: through a rename, same trade the reference makes.
_AGO_RE = re.compile(
    r"(\d+(?:\.\d+)?)\s*(seconds?|minutes?|hours?|days?|weeks?"
    r"|ns|us|ms|s|min|m|h|d|w)\s+ago\b")
_NOW_RE = re.compile(r"\bnow\b(?!\s*\()")
_WORD_UNITS = {"second": "s", "minute": "min", "hour": "h", "day": "d",
               "week": "w"}


def _now():
    from datetime import datetime, timezone

    return datetime.now(timezone.utc).replace(tzinfo=None)


#: injectable clock for `now` / `... ago` literals (tests freeze it);
#: evaluated once at expression COMPILE time, like the reference binds
#: relative times when the pipeline starts
NOW_FN = _now


def _ago_value(text: str):
    n, unit = text.split(" ", 1)
    unit = _WORD_UNITS.get(unit.rstrip("s"), unit)
    return NOW_FN() - duration_value(n + unit)


def _preprocess(text: str) -> str:
    """Rewrite reference-syntax forms into parseable Python: quoted
    strings are lifted to placeholders first, then `!in` / `ni` / `!ni`
    operators and ip/subnet/duration/pattern literals rewrite on the
    quote-free skeleton, then the strings substitute back."""

    def others(chunk: str) -> str:
        chunk = _CIDR_RE.sub(r'__subnet__("\1")', chunk)
        chunk = _IPV4_RE.sub(r'__ip__("\1")', chunk)
        chunk = _DUR_RE.sub(r'__dur__("\1\2")', chunk)
        return chunk

    # 1. lift quoted strings out (placeholders are plain identifiers, so
    #    no literal/operator regex can touch their contents)
    strings: list[str] = []
    skel: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n and (text[j] != ch or text[j - 1] == "\\"):
                j += 1
            skel.append(f"__qstr_{len(strings)}__")
            strings.append(text[i : j + 1])
            i = j + 1
        else:
            j = i
            while j < n and text[j] not in ("'", '"'):
                j += 1
            skel.append(text[i:j])
            i = j
    skeleton = "".join(skel)

    # 2. lift PATTERN literals out BEFORE any operator/literal rewrite —
    #    a body like /right now/ or /a !in b/ must never be rewritten
    #    (the ni/ago/now substitutions previously corrupted it)
    pats: list[str] = []

    def _lift_pat(m):
        pats.append(m.group(2))
        return f"{m.group(1)} __patref_{len(pats) - 1}__"

    skeleton = _PAT_RE.sub(_lift_pat, skeleton)

    # 3. operator sugar: `!in` → `not in`; `A ni B` → `B in A` (contains);
    #    the reference's `null` keyword → None (a field can't be named
    #    null in this grammar — same reservation the reference makes)
    skeleton = re.sub(r"\bnull\b", "None", skeleton)
    # TQL2 record spread `{...rec, a: 1}` → Python dict-unpack syntax
    # (`{**rec, ...}` parses with a None key in ast.Dict)
    skeleton = re.sub(r"\.\.\.\s*(?=[A-Za-z_])", "**", skeleton)
    skeleton = re.sub(r"\s+!in\s+", " not in ", skeleton)
    skeleton = _NI_RE.sub(
        lambda m: f"{'not ' if m.group(2) else ''}{m.group(3)} in {m.group(1)}",
        skeleton,
    )
    # relative time BEFORE duration literals (`2h ago` must not become
    # `__dur__("2h") ago`)
    skeleton = _AGO_RE.sub(r'__ago__("\1 \2")', skeleton)
    skeleton = _NOW_RE.sub('__now__("0")', skeleton)
    # TQL2 lambda arrows (`x => x + 1`, tql2/parser.cpp lambda
    # literals) → Python lambda syntax so ast can parse them
    skeleton = re.sub(r"\b([A-Za-z_]\w*)\s*=>", r"lambda \1:", skeleton)

    # 4. ip/subnet/duration literal rewrites (pattern bodies are gone)
    skeleton = others(skeleton)

    # 5. patterns and strings back in place
    skeleton = re.sub(
        r"__patref_(\d+)__",
        lambda m: f'__pat__(r"{pats[int(m.group(1))]}")',
        skeleton,
    )
    return _QSTR_RE.sub(lambda m: strings[int(m.group(1))], skeleton)


def compile_expr(text: str) -> pads.Expression:
    """Compile an expression string to a pyarrow.dataset Expression.

    Bare field names become ``pc.field(name)``; dotted paths
    (``props.id``) become nested field refs. Subnet-membership terms are
    NOT expressible as pads expressions — use :func:`compile_filter`
    for filter contexts (it splits pushdown vs residual automatically).
    """
    tree = ast.parse(_preprocess(text), mode="eval")
    return _compile(tree.body)


def eval_expr(expr, batch):
    """Evaluate a compiled value expression against a ``pa.Table``:
    pads Expressions run through a one-table dataset scan (no copy,
    nested refs work); :class:`RecordExpr` / :class:`ListLambda` use
    their batch kernels; plain literals return as-is (callers
    broadcast)."""
    if getattr(expr, "_tz_batch_expr", False):
        return expr.evaluate(batch)
    if isinstance(expr, pads.Expression):
        return pads.dataset(batch).to_table(columns={"_": expr}).column("_")
    return expr


def _field_path(node: ast.expr) -> tuple[str, ...] | None:
    if isinstance(node, ast.Name):
        return (node.id,)
    if isinstance(node, ast.Attribute):
        base = _field_path(node.value)
        if base is not None:
            return base + (node.attr,)
    return None


class _Residual(Exception):
    """Raised when a subtree needs the batch-kernel path (subnet
    membership) and cannot become a pads expression; compile_filter
    catches it and compiles that conjunct as a residual mask."""


def _broadcast_scalar(v, n: int):
    """Literal → n-row Array. The type comes from a one-element probe,
    never the broadcast itself (``pa.array([])`` on an empty slice would
    infer null type, which poisons downstream kernels)."""
    import pyarrow as pa

    if v is None:
        return pa.nulls(n)
    v = _date_literal(v)
    return pa.array([v] * n, type=pa.array([v]).type)


class RecordExpr:
    """Compiled TQL2 record literal ``{a: 1, b: x + 1}``
    (tql2/parser.cpp record expressions): evaluates each field
    expression per batch and assembles one StructArray. Only valid in
    VALUE position (assignments / ``set``); cannot become a pads
    Expression, so it takes the batch-kernel path via
    :func:`eval_expr`."""

    #: duck-type marker — eval_expr dispatches on this, NOT isinstance:
    #: by-value pickling (ship_by_value) can put a copy of this class in
    #: a worker closure while the worker's own import holds another
    _tz_batch_expr = True

    def __init__(self, fields: "list[tuple[str | None, object]]"):
        names = [n for n, _ in fields if n is not None]
        if len(set(names)) != len(names):
            raise ValueError(f"record literal repeats a field: {names}")
        self.fields = fields

    def evaluate(self, batch):
        import pyarrow as pa

        n = batch.num_rows
        acc: "dict[str, pa.Array]" = {}
        for name, sub in self.fields:
            v = eval_expr(sub, batch)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            if name is None:
                # spread `...rec`: expand the struct's fields in place
                # (flatten() applies the parent null mask); later
                # entries override by VALUE, keeping first position —
                # Python dict-merge semantics
                if not isinstance(v, pa.Array) or not pa.types.is_struct(v.type):
                    raise ValueError(
                        "record spread `...x` needs a record value, got "
                        f"{getattr(v, 'type', type(v).__name__)}")
                for f, child in zip(v.type, v.flatten()):
                    acc[f.name] = child
                continue
            if not isinstance(v, pa.Array):
                v = _broadcast_scalar(v, n)
            acc[name] = v
        return pa.StructArray.from_arrays(
            list(acc.values()), names=list(acc.keys()))

    def __repr__(self):
        return "{" + ", ".join(f"{n}: …" for n, _ in self.fields) + "}"


class ListLambda:
    """Compiled TQL2 list-lambda call ``map(xs, x => x * 2)`` /
    ``where(xs, x => x > 0)`` (tql2 list functions). Vectorized
    evaluation: flatten the list column once, run the body expression
    over the FLAT element vector (outer row fields gathered by parent
    index — one ``take`` per referenced field), then rebuild list
    offsets. Null lists stay null; for ``where``, elements whose
    predicate is null are dropped (SQL filter semantics)."""

    _tz_batch_expr = True  # duck-type marker (see RecordExpr)

    def __init__(self, kind: str, source, param: str, body,
                 outer_refs: "set[str]"):
        if kind not in ("map", "where"):
            raise ValueError(f"unknown list lambda kind {kind!r}")
        self.kind = kind
        self.source = source
        self.param = param
        self.body = body
        self.outer_refs = outer_refs

    def evaluate(self, batch):
        import numpy as np
        import pyarrow as pa

        src = eval_expr(self.source, batch)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if not isinstance(src, pa.Array) or not (
            pa.types.is_list(src.type)
            or pa.types.is_large_list(src.type)
            or pa.types.is_fixed_size_list(src.type)
        ):
            raise TypeError(
                f"{self.kind}(): first argument must be a list column, "
                f"got {getattr(src, 'type', type(src))}")
        n = len(src)
        lens = pc.list_value_length(src)
        lens_np = lens.fill_null(0).to_numpy(zero_copy_only=False)
        lens_np = lens_np.astype(np.int64, copy=False)
        flat = pc.list_flatten(src)
        null_mask = pc.is_null(src)

        env_cols: dict = {self.param: flat}
        parent = None
        for r in sorted(self.outer_refs):
            if r == self.param or r not in batch.column_names:
                continue
            if parent is None:
                parent = pa.array(np.repeat(np.arange(n), lens_np))
            env_cols[r] = batch.column(r).take(parent)
        env = pa.table(env_cols)
        val = eval_expr(self.body, env)
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        if not isinstance(val, pa.Array):
            val = _broadcast_scalar(val, len(flat))

        if self.kind == "map":
            off = np.concatenate(
                ([0], np.cumsum(lens_np))).astype(np.int32)
            return pa.ListArray.from_arrays(
                pa.array(off, type=pa.int32()), val, mask=null_mask)
        # where: boolean mask over flat elements, null → drop
        if not pa.types.is_boolean(val.type):
            raise TypeError(
                f"where(): lambda must return booleans, got {val.type}")
        keep = np.asarray(val.fill_null(False))
        if parent is None:
            parent = np.repeat(np.arange(n), lens_np)
        else:
            parent = np.asarray(parent)
        new_lens = np.bincount(
            parent[keep], minlength=n).astype(np.int64)
        off = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int32)
        return pa.ListArray.from_arrays(
            pa.array(off, type=pa.int32()),
            flat.filter(pa.array(keep)), mask=null_mask)

    def __repr__(self):
        return f"{self.kind}(…, {self.param} => …)"


class ListExpr:
    """Compiled TQL2 list literal ``[a, a * 2, 1]`` in VALUE position
    (tql2/parser.cpp parse_list): evaluates each element per batch and
    interleaves into one ListArray with k elements per row. Element
    types unify permissively (int + float → float); nulls stay null
    inside the list. Membership tests (``x in [...]``) never reach
    this — they compile to a constant value set."""

    _tz_batch_expr = True  # duck-type marker (see RecordExpr)

    def __init__(self, elements: list):
        self.elements = elements

    def evaluate(self, batch):
        import numpy as np
        import pyarrow as pa

        n = batch.num_rows
        k = len(self.elements)
        if k == 0:
            off = pa.array(np.zeros(n + 1, dtype=np.int32))
            return pa.ListArray.from_arrays(off, pa.array([], pa.null()))
        arrs = []
        for sub in self.elements:
            v = eval_expr(sub, batch)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            if not isinstance(v, pa.Array):
                v = _broadcast_scalar(v, n)
            arrs.append(v)
        typ = pa.unify_schemas(
            [pa.schema([("_", a.type)]) for a in arrs],
            promote_options="permissive").field("_").type
        flat = pa.concat_arrays([a.cast(typ) for a in arrs])
        # concat layout is element-major ([e0 rows..., e1 rows...]);
        # one take permutes to row-major without a Python loop
        idx = (np.arange(k, dtype=np.int64)[None, :] * n
               + np.arange(n, dtype=np.int64)[:, None]).ravel()
        vals = flat.take(pa.array(idx))
        off = pa.array(np.arange(0, n * k + 1, k, dtype=np.int32))
        return pa.ListArray.from_arrays(off, vals)

    def __repr__(self):
        return f"[{', '.join('…' for _ in self.elements)}]"


#: names that appear as Call funcs / markers, never row-field refs
_NON_FIELD_NAMES = frozenset(
    {"abs", "map", "where", "lambda"}
    | set(_MATH_FNS)
)


def _lambda_outer_refs(body: ast.expr, param: str) -> set[str]:
    """Root identifiers the lambda body references besides its param
    (conservative; a false positive only costs a skipped/absent column
    at eval time)."""
    return {
        n.id for n in ast.walk(body)
        if isinstance(n, ast.Name)
        and n.id != param
        and n.id not in _NON_FIELD_NAMES
        and not n.id.startswith("__")
    }


def _compile_list_lambda(node: ast.Call):
    """``map(xs, x => e)`` / ``where(xs, x => p)`` → :class:`ListLambda`
    (the `=>` arrow was rewritten to a Python lambda by _preprocess)."""
    kind = node.func.id
    if len(node.args) != 2:
        raise ValueError(f"{kind}() takes (list, lambda), "
                         f"got {len(node.args)} args")
    lam = node.args[1]
    assert isinstance(lam, ast.Lambda)
    params = lam.args
    if (len(params.args) != 1 or params.vararg or params.kwarg
            or params.kwonlyargs or params.defaults):
        raise ValueError(f"{kind}(): lambda takes exactly one parameter")
    param = params.args[0].arg
    source = _compile(node.args[0])
    body = _compile(lam.body)
    return ListLambda(kind, source, param, body,
                      _lambda_outer_refs(lam.body, param))


_MARKER_FNS = {
    "__ip__": lambda s: s,  # ips compare as their string form
    "ip": lambda s: s,
    "__dur__": duration_value,
    "dur": duration_value,
    "__subnet__": SubnetLiteral,
    "subnet": SubnetLiteral,
    "__pat__": PatternLiteral,
    "pattern": PatternLiteral,
    "__ago__": _ago_value,
    "__now__": lambda _s: NOW_FN(),
}


def _as_pred(node: ast.expr):
    """Compile a node in PREDICATE position: a bare field path means
    "field exists and is not null", a bare VALUE means ``:type == value``
    (reference short forms, expressions.md:173-199). The value form
    binds per batch schema, so it escapes to the residual mask path via
    _Residual — e.g. ``42 or x > 5`` compiles the whole disjunct as a
    mask. Value positions use _compile directly."""
    if _field_path(node) is not None:
        return _compile(node).is_valid()
    if _bare_value_node(node) is not None:
        raise _Residual(node)
    return _compile(node)


def _is_none_const(node: ast.expr) -> bool:
    return isinstance(node, ast.Constant) and node.value is None


def _const_value_set(node) -> list:
    """``x in [...]`` membership list → plain Python value set. Only
    constants (and marker literals like ``ip("...")``) are allowed —
    per-row expressions belong in list LITERALS, not value sets."""
    vals = []
    for e in node.elts:
        v = _compile(e)
        if isinstance(v, pads.Expression) or getattr(
                v, "_tz_batch_expr", False):
            raise ValueError(
                "membership value sets must be constant literals")
        vals.append(v)
    return vals


def _compile(node: ast.expr):
    if isinstance(node, ast.BoolOp):
        parts = [_as_pred(v) for v in node.values]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if isinstance(node.op, ast.And) else (out | p)
        return out
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.Not):
            return ~_as_pred(node.operand)
        if isinstance(node.op, ast.USub):
            operand = _compile(node.operand)
            return -operand if not isinstance(operand, pads.Expression) else 0 - operand
    if isinstance(node, ast.Compare):
        out = None
        left_node = node.left
        for op, comp in zip(node.ops, node.comparators):
            left = _compile(left_node)
            if isinstance(op, (ast.In, ast.NotIn)):
                rhs = (_const_value_set(comp)
                       if isinstance(comp, (ast.List, ast.Tuple, ast.Set))
                       else _compile(comp))
                if isinstance(rhs, SubnetLiteral):
                    raise _Residual(node)  # → compile_filter's mask path
                if isinstance(rhs, PatternLiteral):
                    term = pc.match_substring_regex(left, rhs.pattern)
                elif isinstance(left, str) and _field_path(comp) is not None:
                    # `"sub" in field` (also what `field ni "sub"`
                    # rewrites to): substring containment, the
                    # reference's in/ni string semantics
                    term = pc.match_substring(rhs, left)
                else:
                    term = left.isin(rhs)
                if isinstance(op, ast.NotIn):
                    term = ~term
            elif (isinstance(op, (ast.Eq, ast.NotEq))
                  and isinstance(comp, ast.Call)
                  and isinstance(comp.func, ast.Name)
                  and comp.func.id in ("__pat__", "pattern")):
                # field == /regex/ — RE2-style partial match
                pat = _compile(comp)
                term = pc.match_substring_regex(left, pat.pattern)
                if isinstance(op, ast.NotEq):
                    term = ~term
            elif isinstance(op, (ast.Is, ast.IsNot)) or (
                isinstance(op, (ast.Eq, ast.NotEq))
                and (_is_none_const(comp) or _is_none_const(left_node))
            ):
                # `x is [not] None` and the reference's `x == null` /
                # `null == x` (expression.md: equality with null is a
                # null TEST, not SQL's always-null comparison —
                # symmetric, either operand may be the null literal)
                if not (_is_none_const(comp) or _is_none_const(left_node)):
                    raise ValueError("`is` only supported with None")
                if _is_none_const(comp) and _is_none_const(left_node):
                    raise ValueError(
                        "null == null is a constant — write the boolean")
                subj = _compile(comp) if _is_none_const(left_node) else left
                term = (subj.is_null()
                        if isinstance(op, (ast.Is, ast.Eq))
                        else subj.is_valid())
            else:
                rhs = _date_literal(_compile(comp))
                if isinstance(rhs, SubnetLiteral) or isinstance(left, SubnetLiteral):
                    raise ValueError(
                        "subnet literals are only valid with `in`/`not in`"
                    )
                if isinstance(rhs, PatternLiteral) or isinstance(left, PatternLiteral):
                    raise ValueError(
                        "pattern literals are only valid with `==`/`!=`/`in`"
                    )
                term = _CMPOP[type(op)](left, rhs)
            out = term if out is None else out & term
            left_node = comp
        return out
    if isinstance(node, ast.BinOp) and type(node.op) in _BINOP:
        return _BINOP[type(node.op)](_compile(node.left), _compile(node.right))
    if isinstance(node, ast.IfExp):
        # Python ternary `a if cond else b` → SQL CASE WHEN
        return pc.if_else(_compile(node.test), _compile(node.body),
                          _compile(node.orelse))
    if isinstance(node, ast.Call):
        if isinstance(node.func, ast.Attribute):
            if node.func.attr in _METHOD_MAP:
                # receiver compiles recursively, so methods CHAIN:
                # `text.substr(0, 60).regex_replace("[aeiou]", "")`
                col = _compile(node.func.value)
                args = [_compile(a) for a in node.args]
                return _METHOD_MAP[node.func.attr](col, *args)
        if isinstance(node.func, ast.Name) and node.func.id == "abs":
            return abs(_compile(node.args[0]))
        if isinstance(node.func, ast.Name) and node.func.id in _MATH_FNS:
            return _MATH_FNS[node.func.id](
                *[_compile(a) for a in node.args])
        if isinstance(node.func, ast.Name) and node.func.id == "iif":
            if len(node.args) != 3:
                raise ValueError("iif(cond, then, else) takes 3 arguments")
            return pc.if_else(*[_compile(a) for a in node.args])
        if isinstance(node.func, ast.Name) and node.func.id == "coalesce":
            if len(node.args) < 2:
                raise ValueError("coalesce() takes at least 2 arguments")
            return pc.coalesce(*[_compile(a) for a in node.args])
        if isinstance(node.func, ast.Name) and node.func.id == "concat":
            # DuckDB concat semantics: nulls become empty strings (the
            # || operator's null propagation is NOT this function).
            # Literal args wrap as scalar Expressions — a plain-str
            # FIRST arg would dispatch pyarrow to the eager kernel,
            # which rejects Expression arguments.
            if len(node.args) < 2:
                raise ValueError("concat() takes at least 2 arguments")
            args = []
            for arg in node.args:
                # boolean literals (python True / TQL true) render
                # lowercase like DuckDB — catch them at the AST level,
                # before they compile to a boolean scalar Expression
                # the join kernel can't take
                if (isinstance(arg, ast.Constant)
                        and isinstance(arg.value, bool)) or (
                        isinstance(arg, ast.Name)
                        and arg.id in ("true", "false")):
                    lit = (arg.value if isinstance(arg, ast.Constant)
                           else arg.id == "true")
                    args.append(pads.scalar("true" if lit else "false"))
                    continue
                a = _compile(arg)
                if isinstance(a, pads.Expression):
                    args.append(a)
                elif isinstance(a, bool):
                    # DuckDB renders booleans lowercase
                    args.append(pads.scalar("true" if a else "false"))
                elif isinstance(a, (str, int, float)):
                    args.append(pads.scalar(str(a)))
                else:
                    raise ValueError(
                        f"concat(): unsupported argument {type(a).__name__}"
                        " (str/number/bool literals and field expressions"
                        " only)")
            return pc.binary_join_element_wise(
                *args, "", null_handling="replace", null_replacement="")
        if isinstance(node.func, ast.Name) and node.func.id in _MARKER_FNS:
            arg = node.args[0]
            if not (isinstance(arg, ast.Constant) and isinstance(arg.value, str)):
                raise ValueError(f"{node.func.id}() takes one string literal")
            return _MARKER_FNS[node.func.id](arg.value)
        if (isinstance(node.func, ast.Name)
                and node.func.id in ("map", "where")
                and len(node.args) == 2
                and isinstance(node.args[1], ast.Lambda)):
            return _compile_list_lambda(node)
        raise ValueError(f"unsupported call: {ast.dump(node)}")
    path = _field_path(node)
    if path is not None:
        return pc.field(*path)
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, (ast.List, ast.Tuple)):
        # value position → TQL2 list literal (a per-row list column);
        # membership value sets are intercepted by the In branch above
        return ListExpr([_compile(e) for e in node.elts])
    if isinstance(node, ast.Dict):
        # TQL2 record literal `{a: 1, b: x + 1}` — keys are bare field
        # names (ast.Name) or quoted strings; a None key is the TQL2
        # spread `...rec` (preprocessed to Python's `**rec`): the
        # struct's fields expand in place, later entries override
        fields: list[tuple[str | None, object]] = []
        for k, v in zip(node.keys, node.values):
            if k is None:
                fields.append((None, _compile(v)))
                continue
            if isinstance(k, ast.Name):
                name = k.id
            elif isinstance(k, ast.Constant) and isinstance(k.value, str):
                name = k.value
            else:
                raise ValueError(
                    "record literal keys must be field names or strings")
            fields.append((name, _compile(v)))
        return RecordExpr(fields)
    raise ValueError(f"unsupported expression node: {ast.dump(node)}")


# ---------------------------------------------------------------------------
# filter compilation: pushdown + residual split


class Filter:
    """A compiled filter: ``pushdown`` (pads.Expression over the
    pushdown-able conjuncts — hand it to ``read_parquet(filter=)`` /
    a dataset scan) plus ``residual`` (a batch→bool-mask callable for
    the kernels pads can't express, e.g. subnet membership). Either may
    be None. ``apply`` runs both on one batch."""

    def __init__(self, pushdown, residual, residual_refs=None):
        self.pushdown = pushdown
        self.residual = residual
        #: column names the residual conjuncts reference statically
        #: (projection-widening hint for readers); extractor-based
        #: residuals resolve per batch schema and contribute nothing
        self.residual_refs: set[str] = residual_refs or set()

    def apply(self, batch):
        import pyarrow as pa

        if self.pushdown is not None:
            batch = pads.dataset(batch).to_table(filter=self.pushdown)
        if self.residual is not None and batch.num_rows:
            batch = batch.filter(pa.array(self.residual(batch)))
        return batch

    def mask(self, batch) -> "np.ndarray":
        """Combined pushdown+residual boolean mask over ``batch``
        (null → False — identical row-keep semantics to :meth:`apply`).
        For callers that need the COMPLEMENT row set under SQL WHERE
        null rules (e.g. counter-example streams: a null predicate is
        non-matching, so it belongs to the complement)."""
        import numpy as np

        m = np.ones(batch.num_rows, dtype=bool)
        if self.pushdown is not None:
            m &= _eval_mask(self.pushdown, batch)
        if self.residual is not None and batch.num_rows:
            m &= np.asarray(self.residual(batch), dtype=bool)
        return m

    def widen_projection(self, columns, available=None):
        """The residual-projection contract shared by every filtered
        reader: a residual mask evaluates AFTER projection, so the scan
        must include the columns it references — return ``(scan_cols,
        drop_after)`` where ``drop_after`` are the extra columns to
        drop post-filter. ``available`` (optional) bounds the widening
        to columns that actually exist in the source."""
        if self.residual is None or not columns:
            return columns, []
        extra = sorted(self.residual_refs - set(columns))
        if available is not None:
            extra = [c for c in extra if c in available]
        if not extra:
            return columns, []
        return list(columns) + extra, extra


def _split_and(node: ast.expr) -> list[ast.expr]:
    if isinstance(node, ast.BoolOp) and isinstance(node.op, ast.And):
        out: list[ast.expr] = []
        for v in node.values:
            out.extend(_split_and(v))
        return out
    return [node]


def _eval_mask(expr, batch):
    """pads expression → numpy bool mask over the batch (null → False,
    matching filter semantics)."""
    import numpy as np
    import pyarrow as pa

    arr = pads.dataset(batch).to_table(columns={"_": expr}).column("_")
    return np.asarray(pc.fill_null(arr, False).combine_chunks())


def _batch_column(batch, path: tuple[str, ...]):
    name = ".".join(path)
    if name in batch.column_names:
        return batch.column(name)
    col = batch.column(path[0])
    for p in path[1:]:
        import pyarrow.compute as _pc

        col = _pc.struct_field(col, p)
    return col


def _compile_mask(node: ast.expr):
    """Compile a subtree containing subnet-membership terms into a
    batch→bool-mask callable: subnet terms go through the vectorized
    iptype kernel, every other subtree compiles to a pads expression
    evaluated per batch."""
    bare = _bare_value_node(node)
    if bare is not None:
        return _bare_value_mask(bare)
    if isinstance(node, ast.BoolOp):
        subs = [_compile_mask(v) for v in node.values]
        is_and = isinstance(node.op, ast.And)

        def f_bool(batch):
            m = subs[0](batch)
            for s in subs[1:]:
                m = (m & s(batch)) if is_and else (m | s(batch))
            return m

        return f_bool
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
        inner = _compile_mask(node.operand)
        return lambda batch: ~inner(batch)
    if (
        isinstance(node, ast.Compare)
        and len(node.ops) == 1
        and isinstance(node.ops[0], (ast.In, ast.NotIn))
    ):
        rhs = _compile(node.comparators[0])
        if isinstance(rhs, SubnetLiteral):
            path = _field_path(node.left)
            if path is None:
                raise ValueError("subnet membership needs a field on the left")
            neg = isinstance(node.ops[0], ast.NotIn)
            # capture the kernel NOW: a runtime `import tenzir_ray...`
            # inside a shipped-by-value closure fails on workers whose
            # sys.path lacks the repo (ship-by-value covers code, not
            # import statements)
            from tenzir_ray.iptype import subnet_mask as _snm

            def f_subnet(batch, path=path, cidr=rhs.cidr, neg=neg, _snm=_snm):
                # three-valued logic: null/malformed ips are dropped by
                # BOTH polarities (valid & ~member under negation), as
                # the pushdown conjuncts do (ADVICE r3)
                m, valid = _snm(_batch_column(batch, path), cidr,
                                with_valid=True)
                return (valid & ~m) if neg else m

            return f_subnet
    expr = _as_pred(node)  # no subnet in this subtree → pads eval
    return lambda batch: _eval_mask(expr, batch)


def _bare_value_node(node: ast.expr):
    """Bare-VALUE short form (expressions.md:173-199): a lone literal
    conjunct means ``:type == value``. Returns the value, or None if the
    node isn't a bare literal. Bound per batch schema (type extractors
    can't precompile), so it lands in the residual."""
    if isinstance(node, ast.Constant) and isinstance(
        node.value, (bool, int, float, str)
    ):
        return node.value
    if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
            and node.func.id in ("__ip__", "ip")
            and isinstance(node.args[0], ast.Constant)):
        return node.args[0].value  # bare ip literal → string equality
    return None


def _bare_value_mask(value):
    import numpy as np

    ext = {bool: ":bool", int: ":integer",
           float: ":float", str: ":string"}[type(value)]

    def f(batch):
        expr = extractor_predicate(batch.schema, ext, "==", value)
        if expr is None:
            return np.zeros(batch.num_rows, dtype=bool)
        return _eval_mask(expr, batch)

    return f


def compile_filter(text: str) -> Filter:
    """Compile a filter expression, splitting top-level conjuncts into a
    pushdown pads expression and a residual batch-mask callable. This is
    what `where` and `read_parquet(filter_expr=)` use — CIDR terms like
    ``src_ip in 10.0.0.0/8`` land in the residual, everything else stays
    pushdown-able to the parquet row-group scan."""
    tree = ast.parse(_preprocess(text), mode="eval").body
    pushdown = None
    residuals = []
    residual_refs: set[str] = set()
    for c in _split_and(tree):
        bare = _bare_value_node(c)
        if bare is not None:
            residuals.append(_bare_value_mask(bare))
            continue
        try:
            e = _as_pred(c)  # bare field conjunct ≡ field != null
            pushdown = e if pushdown is None else pushdown & e
        except _Residual:
            residuals.append(_compile_mask(c))
            residual_refs |= _node_names(c)
    if not residuals:
        residual = None
    elif len(residuals) == 1:
        residual = residuals[0]
    else:
        def residual(batch, _rs=residuals):
            m = _rs[0](batch)
            for r in _rs[1:]:
                m = m & r(batch)
            return m

    return Filter(pushdown, residual, residual_refs)


def _node_names(tree: ast.AST) -> set[str]:
    """Root column names an AST subtree references explicitly (``a.b.c``
    → ``a``). Suffix/type/meta extractors resolve per batch schema at
    evaluation time and contribute nothing."""
    out: set[str] = set()
    skip = (set(_MARKER_FNS) | set(_MATH_FNS)
            | {"abs", "now", "true", "false", "null"})
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            n = node.id
            if n in skip or (n.startswith("__") and n.endswith("__")):
                continue  # preprocess placeholders (__qstr_N__ etc.)
            out.add(n)
    return out


def referenced_columns(text: str) -> set[str]:
    """Root column names an expression references explicitly."""
    return _node_names(ast.parse(_preprocess(text), mode="eval").body)


_CMP_OPS = {ast.Lt: "<", ast.LtE: "<=", ast.Gt: ">", ast.GtE: ">=",
            ast.Eq: "==", ast.NotEq: "!="}


def prune_conjuncts(text: str) -> list:
    """Zone-map-testable conjuncts of a filter expression: the
    ``(column, op, literal)`` triples for simple top-level comparisons
    (``col <op> literal`` / ``literal <op> col``). Every other conjunct
    shape contributes nothing (never a wrong prune — the scan filter
    still applies in full)."""
    tree = ast.parse(_preprocess(text), mode="eval").body
    out = []
    for c in _split_and(tree):
        if not (isinstance(c, ast.Compare) and len(c.ops) == 1
                and type(c.ops[0]) in _CMP_OPS):
            continue
        op = _CMP_OPS[type(c.ops[0])]
        lhs, rhs = c.left, c.comparators[0]
        if isinstance(lhs, ast.Name) and isinstance(rhs, ast.Constant):
            col, v = lhs.id, rhs.value
        elif isinstance(rhs, ast.Name) and isinstance(lhs, ast.Constant):
            # literal <op> col ≡ col <flipped-op> literal
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            col, v, op = rhs.id, lhs.value, flip.get(op, op)
        else:
            continue
        if isinstance(v, (int, float, str)) and not isinstance(v, bool):
            out.append((col, op, v))
    return out


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

    # engine-internal columns (e.g. the `if` fallback's row-order tag)
    # are invisible to type/suffix extractors — a `:int` disjunction must
    # not bind plumbing the user never created
    if any(n.startswith("__tz_") for n in schema.names):
        schema = pa.schema([f for f in schema
                            if not f.name.startswith("__tz_")])
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
