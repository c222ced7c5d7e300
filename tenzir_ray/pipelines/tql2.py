"""TQL2-flavored textual front-end (scoped subset).

The reference ships a second pipeline language behind a flag
(``libtenzir/src/tql2/parser.cpp``; ``exec_pipeline.cpp:190`` routes to
``tql2::exec`` when ``cfg.tql2`` is set). Its visible differences from
TQL1 at this snapshot (parser.cpp:83-230):

- statements separate on NEWLINES as well as ``|``;
- ``//`` line comments and ``/* */`` block comments (tokens.cpp:40-44);
- bare ASSIGNMENT statements: ``rev = price * (1 - discount)`` instead
  of ``set rev=...`` (parse_invocation_or_assignment);
- ``let $name = <expr>`` bindings, substituted into later statements
  (parse_let_stmt — ``$``-prefixed, constant);
- invocations take COMMA-separated arguments: ``select a, b``,
  ``from "file.parquet"``;
- ``from <string>`` infers the loader from the path/extension;
- ``if <expr> { stmts } [else { … } | else if …]`` statement blocks
  (parse_if_stmt): events route by the predicate (SQL-null = false →
  else branch), branch sub-pipelines transform their slice, outputs
  union (branches must keep union-compatible schemas);
- ``match <expr> { v1[, v2…] => { stmts } … [_ => { … }] }``
  (parse_match_stmt — the reference parses this shape but leaves
  execution TODO, parser.cpp:151; here it desugars to the nested-if
  chain: first matching arm wins, ``_`` catch-all, unmatched rows pass
  through unchanged).

This module implements exactly that statement layer on top of the same
operator registry the TQL1 front-end drives; expressions inside
statements reuse the engine expression language (expr.py), which
carries the TQL2 literal/lambda surface too: record literals
``{a: 1, b: x + 1}`` (parse_record), list literals ``[a, a * 2]``
(parse_list), and list lambdas ``map(xs, x => x + 1)`` /
``where(xs, x => x > 0)``. Two-input operators take named
comma-separated arguments with a PIPELINE EXPRESSION as the second
input (parser.cpp parse_pipeline_expr — pipelines are values in TQL2):
``hash_join on="l_orderkey", right=( from "orders.parquet" | select
o_orderkey, o_orderpriority ), how="inner"`` — the nested pipeline
parses with this grammar, not TQL1's. ``move a=b, c=d`` is the TQL2
move-assignment (assign then remove the source fields). Everything
accepted executes with reference-shaped (or, for match,
documented-extension) semantics.
"""

from __future__ import annotations

import re

from tenzir_ray.pipelines.pipeline import Pipeline
from tenzir_ray.pipelines.tql import (
    _PAT_OPENER,
    _literal,
    _matching_paren,
    parse_segment,
    split_segments,
)

_LET_RE = re.compile(r"^let\s+\$(\w+)\s*=\s*(.+)$", re.S)
# `=(?!=)`: a bare comparison (`x == 1`) must NOT parse as an assignment
_ASSIGN_RE = re.compile(r"^([A-Za-z_][\w.]*)\s*=(?!=)\s*(.+)$", re.S)

#: invocation verbs whose single argument is ONE raw expression
_EXPR_VERBS = {"where"}

#: two-input operators accepting a pipeline-expression argument
#: (``right=( <statements> )``) — same operator set as the TQL1 front
#: end, but the nested pipeline parses with THIS grammar (newline
#: statements, ``from``, assignments, if/match)
_TWO_INPUT = {
    "hash_join", "asof_join", "range_join", "range_join_partitioned",
    "skew_join", "ann_topk", "fuzzy_decontaminate", "intersect",
    "except", "cross_join", "union_by_name",
}


def strip_comments(text: str) -> str:
    """Remove ``//`` line and ``/* */`` block comments, quote-aware
    (tokens.cpp:40-44)."""
    out: list[str] = []
    i = 0
    quote: str | None = None
    n = len(text)
    while i < n:
        ch = text[i]
        if quote:
            if ch == "\\" and i + 1 < n:  # escape consumes the next char
                out.append(ch)
                out.append(text[i + 1])
                i += 2
                continue
            out.append(ch)
            if ch == quote:
                quote = None
            i += 1
        elif ch in ("'", '"'):
            quote = ch
            out.append(ch)
            i += 1
        elif text.startswith("//", i):
            j = text.find("\n", i)
            i = n if j < 0 else j  # keep the newline (it separates)
        elif text.startswith("/*", i):
            j = text.find("*/", i + 2)
            if j < 0:
                raise ValueError("non-terminated /* comment")
            i = j + 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def split_statements(text: str) -> list[str]:
    """Statements separate on top-level newlines AND ``|``
    (parser.cpp:87 accepts either token between statements). A
    statement starting with ``else`` re-joins its preceding ``if`` —
    the token-based reference parser accepts the K&R-alternative
    newline-before-else layout, so the line splitter must too."""
    stmts: list[str] = []
    for line in split_segments(text, "\n"):
        stmts.extend(split_segments(line, "|"))
    out: list[str] = []
    for s in (x.strip() for x in stmts):
        if not s:
            continue
        if re.match(r"else\b", s) and out:
            out[-1] += " " + s
        else:
            out.append(s)
    return out


def _subst_lets(stmt: str, env: dict[str, str]) -> str:
    """Replace ``$name`` occurrences (outside quotes) with the bound
    literal text."""

    def _repl(m: re.Match) -> str:
        name = m.group(1)
        if name not in env:
            raise ValueError(f"unbound let binding ${name}")
        return env[name]

    out: list[str] = []
    quote: str | None = None
    i = 0
    while i < len(stmt):
        ch = stmt[i]
        if quote:
            if ch == "\\" and i + 1 < len(stmt):  # escape eats next char
                out.append(ch)
                out.append(stmt[i + 1])
                i += 2
                continue
            out.append(ch)
            if ch == quote:
                quote = None
            i += 1
        elif ch in ("'", '"'):
            quote = ch
            out.append(ch)
            i += 1
        elif ch == "$":
            m = re.match(r"\$(\w+)", stmt[i:])
            if not m:
                raise ValueError("lone `$` — let bindings are `$name`")
            out.append(_repl(m))
            i += m.end()
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _from_step(arg: str) -> dict:
    """``from "<path>"`` — loader inferred from the extension
    (TQL2's from/load entity; csv/json/ndjson/lines/feather/parquet)."""
    path = str(_literal(arg.strip()))
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    op = {
        "parquet": "read_parquet", "csv": "read_csv", "tsv": "read_csv",
        "json": "read_json", "ndjson": "read_json", "jsonl": "read_json",
        "feather": "read_feather", "arrow": "read_feather",
        "txt": "read_lines", "log": "read_lines",
    }.get(ext)
    if op is None:
        raise ValueError(
            f"from: cannot infer a loader from {path!r} — use an explicit "
            "read_* operator"
        )
    step: dict = {"op": op, "paths": path}
    if ext == "tsv":
        step["delimiter"] = "\t"
    return step


def _code_chars(text: str, start: int = 0):
    """Yield ``(i, ch)`` for characters OUTSIDE quotes and ``/pattern/``
    literals (the ONE scanner behind the brace/arrow helpers — replaces
    hand-rolled quote loops that diverged on regex literals and
    escaped-backslash runs). Escapes skip the next char, so a string
    ending in a literal backslash closes correctly; a ``/`` opens a
    pattern only directly after ``==``/``!=``/``in`` (same rule as
    ``split_segments``). ``start`` must sit at top-level code (e.g. a
    brace found by a previous scan)."""
    quote: str | None = None
    in_pat = False
    tail = ""
    i, n = start, len(text)
    while i < n:
        ch = text[i]
        if quote:
            if ch == "\\":
                i += 2
                continue
            if ch == quote:
                quote = None
            i += 1
            continue
        if in_pat:
            if ch == "\\":
                i += 2
                continue
            if ch == "/":
                in_pat = False
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            i += 1
            continue
        if ch == "/" and _PAT_OPENER.search(tail):
            in_pat = True
            i += 1
            continue
        yield i, ch
        tail = (tail + ch)[-8:]
        i += 1


def _match_brace(text: str, open_idx: int) -> int:
    """Index of the ``}`` matching ``text[open_idx] == '{'``
    (quote/pattern-aware)."""
    depth = 0
    for i, ch in _code_chars(text, open_idx):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("non-terminated { block")


def _first_brace(text: str, what: str = "if") -> int:
    """Index of the first top-level ``{``."""
    for i, ch in _code_chars(text):
        if ch == "{":
            return i
    raise ValueError(f"{what}: missing {{ block }}")


def _find_code(text: str, needle: str, start: int = 0) -> int:
    """First top-level occurrence of ``needle`` (anchored on its first
    char being code; used for the match-arm ``=>``)."""
    for i, ch in _code_chars(text, start):
        if ch == needle[0] and text.startswith(needle, i):
            return i
    return -1


def _parse_if(stmt: str) -> dict:
    """``if <expr> { stmts } [else { stmts } | else if <expr> { … }]``
    (parser.cpp parse_if_stmt). Branch bodies are nested statement
    lists over the same grammar; events route by the predicate
    (SQL-null = false → else branch), outputs union."""
    body_open = _first_brace(stmt)
    cond = stmt[2:body_open].strip()
    if not cond:
        raise ValueError("if: empty condition")
    body_close = _match_brace(stmt, body_open)
    then_steps = [parse_statement(s) for s in
                  split_statements(stmt[body_open + 1:body_close])]
    rest = stmt[body_close + 1:].strip()
    else_steps: list[dict] | None = None
    if rest:
        if not re.match(r"else\b", rest):
            raise ValueError(f"if: unexpected trailer {rest!r}")
        rest = rest[4:].strip()
        if re.match(r"if\b", rest):
            else_steps = [_parse_if(rest)]  # else-if chain
        else:
            if not rest.startswith("{"):
                raise ValueError("if: `else` needs a { block } or `if`")
            close = _match_brace(rest, 0)
            if rest[close + 1:].strip():
                raise ValueError(
                    f"if: unexpected trailer {rest[close + 1:].strip()!r}")
            else_steps = [parse_statement(s)
                          for s in split_statements(rest[1:close])]
    step = {"op": "if", "expr": cond, "then": then_steps}
    if else_steps is not None:
        step["else"] = else_steps
    return step


def _parse_match(stmt: str) -> dict:
    """``match <expr> { v1[, v2…] => { stmts } … [_ => { stmts }] }``
    (parser.cpp:150 parse_match_stmt — the reference PARSES this shape
    but leaves execution semantics TODO, parser.cpp:151-155; here it
    desugars to the nested-``if`` chain with the natural semantics:
    first matching arm wins, ``_`` is the catch-all, rows matching no
    arm pass through unchanged)."""
    body_open = _first_brace(stmt, "match")
    subject = stmt[5:body_open].strip()
    if not subject:
        raise ValueError("match: empty subject expression")
    body_close = _match_brace(stmt, body_open)
    if stmt[body_close + 1:].strip():
        raise ValueError(
            f"match: unexpected trailer {stmt[body_close + 1:].strip()!r}")
    body = stmt[body_open + 1:body_close].strip()
    arms: list[tuple[list[str] | None, list[dict]]] = []
    while body:
        arrow = _find_code(body, "=>")
        if arrow < 0:
            raise ValueError(f"match: arm without `=>`: {body!r}")
        values = [v.strip() for v in
                  split_segments(body[:arrow], ",") if v.strip()]
        if not values:
            raise ValueError("match: arm needs at least one value")
        open_i = _first_brace(body[arrow:], "match") + arrow
        close_i = _match_brace(body, open_i)
        steps = [parse_statement(s)
                 for s in split_statements(body[open_i + 1:close_i])]
        arms.append((None if values == ["_"] else values, steps))
        body = body[close_i + 1:].strip().lstrip(",").strip()
    if not arms:
        raise ValueError("match: no arms")
    # desugar right-to-left into the nested if chain
    step: dict | None = None
    tail: list[dict] | None = None
    for values, steps in reversed(arms):
        if values is None:  # `_` catch-all
            if step is not None or tail is not None:
                raise ValueError("match: `_` must be the last arm")
            tail = steps
            continue
        pred = " or ".join(f"({subject}) == ({v})" for v in values)
        node: dict = {"op": "if", "expr": pred, "then": steps}
        if step is not None:
            node["else"] = [step]
        elif tail is not None:
            node["else"] = tail
        step = node
    if step is None:  # only a `_` arm: unconditional sub-pipeline
        return {"op": "apply", "pipeline": tail}
    return step


def _parse_two_input(name: str, rest: str) -> dict:
    """TQL2 operator invocation with NAMED comma-separated arguments
    and a pipeline-expression argument (the reference's TQL2 grammar
    passes pipelines as expression values — parser.cpp
    parse_pipeline_expr): ``hash_join on="l_orderkey", right=( <tql2
    statements> ), how="inner"``. The nested pipeline parses with the
    TQL2 statement grammar (newlines, ``from``, assignments, if/match),
    NOT the TQL1 segment grammar."""
    # locate `right=(` quote-aware — a regex search over the raw text
    # would match inside a quoted argument value
    m = None
    for i, ch in _code_chars(rest):
        if (ch == "r" and rest.startswith("right", i)
                and (i == 0 or not (rest[i - 1].isalnum()
                                    or rest[i - 1] == "_"))):
            m = re.match(r"right\s*=\s*\(", rest[i:])
            if m is not None:
                open_idx = i + m.end() - 1
                start_idx = i
                break
    if m is None:
        raise ValueError(
            f"{name}: needs `right=( <sub-pipeline> )` for the second "
            "input")
    close = _matching_paren(rest, open_idx)
    inner = rest[open_idx + 1:close]
    right = [parse_statement(s) for s in split_statements(inner)]
    remainder = rest[:start_idx] + rest[close + 1:]
    step: dict = {"op": name, "right": right}
    for tok in split_segments(remainder, ","):
        tok = tok.strip()
        if not tok:
            continue
        k, eq, v = tok.partition("=")
        k = k.strip()
        if not eq or not re.match(r"^\w+$", k):
            raise ValueError(f"{name}: want `key=value`, got {tok!r}")
        if k in ("op", "right"):
            raise ValueError(
                f"{name}: argument name {k!r} is reserved")
        step[k] = _literal(v.strip())
    return step


def parse_statement(stmt: str) -> dict:
    stmt = stmt.strip()
    head = stmt.split(None, 1)[0] if stmt else ""
    if head == "if":
        return _parse_if(stmt)
    if head == "match":
        return _parse_match(stmt)
    # assignment statement: `path = expr` (but `==` is a comparison and
    # verbs like `where x = 1` never reach here — verbs are idents
    # followed by args, assignments start with the TARGET)
    m = _ASSIGN_RE.match(stmt)
    if m and not stmt.startswith("let "):
        target, expr = m.group(1), m.group(2).strip()
        return {"op": "set", target: expr}
    name, _, rest = stmt.partition(" ")
    rest = rest.strip()
    if name == "from":
        return _from_step(rest)
    if name in _TWO_INPUT:
        return _parse_two_input(name, rest)
    if name == "move":
        # TQL2 move-assignment (parser.cpp parse_invocation_or_
        # assignment's `move` form): `move a=b, c=d` assigns each
        # source to its target and REMOVES the source field.
        # Assignments apply strictly LEFT-TO-RIGHT, each one a
        # set-then-drop pair — `move y=z, x=y` leaves x = old z and
        # neither y nor z (the chained value moved twice). Sources must
        # be TOP-LEVEL columns (the removal is a column drop; use `set`
        # + explicit restructuring for struct members).
        steps: list[dict] = []
        for part in split_segments(rest, ","):
            m = _ASSIGN_RE.match(part.strip())
            if not m:
                raise ValueError(f"move: want `target=source`, "
                                 f"got {part.strip()!r}")
            tgt, src = m.group(1), m.group(2).strip()
            if tgt in ("op", "pipeline") or src == "op":
                raise ValueError(
                    f"move: field name {('op' if 'op' in (tgt, src) else tgt)!r} "
                    "is reserved in the step grammar — rename the column "
                    "first")
            if not re.match(r"^[A-Za-z_]\w*$", src):
                raise ValueError(
                    "move: source must be a top-level column name "
                    f"(got {src!r}); move struct members with `set` + "
                    "`drop`")
            steps.append({"op": "set", tgt: src})
            if src != tgt:
                steps.append({"op": "drop", "columns": [src]})
        if not steps:
            raise ValueError("move: needs at least one `target=source`")
        return {"op": "apply", "pipeline": steps}
    if name in _EXPR_VERBS:
        return {"op": name, "expr": rest}
    if name in ("select", "drop"):
        return {"op": name, "columns": [c.strip()
                                        for c in split_segments(rest, ",")]}
    if name == "sort":
        # TQL2 descending = `-field`
        keys, desc = [], []
        for tok in split_segments(rest, ","):
            tok = tok.strip()
            if tok.startswith("-"):
                keys.append(tok[1:].strip())
                desc.append(True)
            else:
                keys.append(tok)
                desc.append(False)
        step: dict = {"op": "sort", "keys": keys if len(keys) > 1 else keys[0]}
        if any(desc):
            step["descending"] = desc if len(desc) > 1 else desc[0]
        return step
    if name in ("summarize", "summarize_hash"):
        # `summarize qty=sum(x), n=count() by k1, k2`
        m2 = re.search(r"\bby\b(?![^(]*\))", rest)
        by = None
        if m2:
            by = [c.strip() for c in split_segments(rest[m2.end():], ",")]
            by = by[0] if len(by) == 1 else by
            rest = rest[: m2.start()].strip().rstrip(",")
        aggs = {}
        for part in split_segments(rest, ","):
            am = re.match(r"^(\w+)\s*=\s*(.+)$", part.strip(), re.S)
            if not am:
                raise ValueError(f"{name}: want `alias=fn(col)`, "
                                 f"got {part.strip()!r}")
            spec = am.group(2).strip()
            # TQL2 `count()` == TQL1 `count(*)`
            spec = re.sub(r"^count\(\s*\)$", "count(*)", spec)
            aggs[am.group(1)] = spec
        step = {"op": name, "aggs": aggs}
        if by is not None:
            step["by"] = by
        return step
    # everything else: comma-separated positional/kv args mapped through
    # the SAME grammar TQL1 uses for that verb (single source of truth)
    args = [a.strip() for a in split_segments(rest, ",") if a.strip()]
    return parse_segment(f"{name} {' '.join(args)}" if args else name)


def parse_pipeline2(text: str) -> Pipeline:
    """Parse a TQL2-flavored program into a :class:`Pipeline`."""
    env: dict[str, str] = {}
    steps: list[dict] = []
    for stmt in split_statements(strip_comments(text)):
        m = _LET_RE.match(stmt)
        if m:
            # bindings may reference earlier bindings in their RHS
            env[m.group(1)] = _subst_lets(m.group(2).strip(), env)
            continue
        steps.append(parse_statement(_subst_lets(stmt, env)))
    return Pipeline(steps)


def run_pipeline2(text: str, ds=None, optimize: bool = True):
    """Parse and execute a TQL2-flavored program."""
    return parse_pipeline2(text).run(ds, optimize=optimize)
