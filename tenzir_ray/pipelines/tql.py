"""Textual pipeline front-end — the `tenzir "<pipeline>"` UX.

The reference's primary interface is an operator-chain string parsed by
``tql::parse`` (libtenzir/src/exec_pipeline.cpp:186); this module gives
the same front door onto the engine's operator registry::

    run_pipeline("read_parquet /data/lineitem.parquet "
                 "| where l_quantity > 45 and l_returnflag == 'A' "
                 "| select l_orderkey, l_quantity "
                 "| summarize q=sum(l_quantity), n=count(*) by l_orderkey "
                 "| sort q desc | head 5")

Grammar: segments split on top-level ``|`` (quote-aware); each segment
is ``opname <args>``. Expression-valued operators (where/set/put/extend)
take the rest of the segment verbatim (the expression language handles
its own syntax, including `src_ip in 10.0.0.0/8`); structured operators
(summarize/sort/select/rename/...) have small dedicated grammars; any
other registered operator takes ``key=value`` pairs (values parsed as
JSON when possible, else strings) plus one optional leading positional
argument mapped per the table below.
"""

from __future__ import annotations

import json
import re

from tenzir_ray.pipelines.pipeline import Pipeline

#: ops whose argument text is ONE raw expression string
_EXPR_OPS = {"where": "expr"}
#: ops taking comma-separated `name=expr` assignments (raw expressions)
_ASSIGN_OPS = {"set", "put", "extend"}
#: first bare (non key=value) token maps to this parameter
_POSITIONAL = {
    "read_parquet": "paths", "read_csv": "paths", "read_json": "paths",
    "read_lines": "paths", "read_feather": "paths", "read_bitz": "path",
    "read_lake": "root", "write_lake": "root", "read_lake_changes": "root",
    "lake_search": "root",
    "write_parquet": "path", "write_csv": "path", "write_tsv": "path",
    "write_json": "path", "write_feather": "path", "write_bitz": "path",
    "head": "n", "limit": "n", "taste": "n", "repeat": "n", "tail": "n",
    "top": "column", "rare": "column", "unroll": "column",
    "hash": "column", "pseudonymize": "column", "repartition": "n",
    "parse_json": "column", "parse_ndjson": "column", "parse_kv": "column",
    "parse_syslog": "column", "parse_cef": "column", "parse_leef": "column",
    "parse_grok": "column", "enumerate": "by", "enumerate_global": "out",
    "compress": "codec", "decompress": "codec", "shell": "command",
    "duplicate_spans": "column", "clip_duplicate_spans": "column",
    "measure": "out",
    "enrich": "context", "context_create": "name",
    "context_update": "name", "context_delete": "name",
}


_PAT_OPENER = re.compile(r"(==|!=|\bin)\s*$")


def split_segments(text: str, sep: str = "|") -> list[str]:
    """Split on top-level ``sep`` outside quotes/parens/brackets — and
    outside ``/regex/`` pattern literals (which may contain ``|`` and
    unbalanced brackets; a ``/`` opens a pattern only directly after
    ``==``/``!=``/``in``, mirroring the expression lexer)."""
    out: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None
    in_pattern = False
    i = 0
    while i < len(text):
        ch = text[i]
        if quote:
            # escapes consume the NEXT char too, so a string ending in
            # an escaped backslash ("a\\") closes its quote correctly
            if ch == "\\" and i + 1 < len(text):
                buf.append(ch)
                buf.append(text[i + 1])
                i += 2
                continue
            buf.append(ch)
            if ch == quote:
                quote = None
        elif in_pattern:
            if ch == "\\" and i + 1 < len(text):
                buf.append(ch)
                buf.append(text[i + 1])
                i += 2
                continue
            buf.append(ch)
            if ch == "/":
                in_pattern = False
        elif ch == "/" and _PAT_OPENER.search("".join(buf[-8:])):
            in_pattern = True
            buf.append(ch)
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch in "([{":
            depth += 1
            buf.append(ch)
        elif ch in ")]}":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    last = "".join(buf).strip()
    if last:
        out.append(last)
    return [s for s in out if s]


def _literal(tok: str):
    tok = tok.strip()
    # `op a="x", b=2` tokenizes on spaces, so a comma SEPARATOR rides
    # along on the previous token — drop it (a value that really ends
    # in a comma is quoted, leaving the quote outermost)
    if tok.endswith(","):
        tok = tok[:-1].rstrip()
    try:
        return json.loads(tok)
    except (json.JSONDecodeError, ValueError):
        return tok.strip("'\"")


def _csv(text: str) -> list[str]:
    return [t.strip() for t in split_segments(text, ",")]


_AGG_RE = re.compile(r"^(\w+)\s*=\s*(.+)$", re.S)


def _matching_paren(text: str, open_idx: int) -> int:
    """Index of the ``)`` matching ``text[open_idx] == '('``
    (quote-aware)."""
    depth = 0
    quote: str | None = None
    for i in range(open_idx, len(text)):
        ch = text[i]
        if quote:
            if ch == quote and text[i - 1] != "\\":
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced parentheses in sub-pipeline")


def parse_segment(seg: str) -> dict:
    seg = seg.strip()
    name, _, rest = seg.partition(" ")
    name = name.strip()
    rest = rest.strip()
    if name in _EXPR_OPS:
        return {"op": name, _EXPR_OPS[name]: rest}
    if name in _ASSIGN_OPS:
        step: dict = {"op": name}
        for part in _csv(rest):
            m = _AGG_RE.match(part)
            if not m:
                raise ValueError(f"{name}: want `field=expr`, got {part!r}")
            step[m.group(1)] = m.group(2)
        return step
    if name in ("select", "drop"):
        return {"op": name, "columns": _csv(rest)}
    if name == "rename":
        mapping = {}
        for part in _csv(rest):
            m = _AGG_RE.match(part)
            if not m:
                raise ValueError(f"rename: want `old=new`, got {part!r}")
            mapping[m.group(1)] = m.group(2).strip()
        return {"op": "rename", "mapping": mapping}
    if name in ("summarize", "summarize_hash", "streaming_summarize"):
        # summarize a=sum(x), n=count(*) by k1, k2
        m = re.search(r"\bby\b(?![^(]*\))", rest)
        by = None
        if m:
            by = _csv(rest[m.end():])
            by = by[0] if len(by) == 1 else by
            rest = rest[: m.start()].strip()
        aggs = {}
        for part in _csv(rest):
            am = _AGG_RE.match(part)
            if not am:
                raise ValueError(f"{name}: want `alias=fn(col)`, got {part!r}")
            aggs[am.group(1)] = am.group(2).strip()
        step = {"op": name, "aggs": aggs}
        if by is not None:
            step["by"] = by
        return step
    if name == "sort":
        toks = rest.split()
        keys: list[str] = []
        desc: list[bool] = []
        kwargs: dict = {}
        for t in _csv(" ".join(toks)):
            sub = t.split()
            if not sub:
                continue
            if sub[0] in ("nulls_first", "nulls_last"):
                kwargs["nulls_first"] = sub[0] == "nulls_first"
                continue
            keys.append(sub[0])
            desc.append(len(sub) > 1 and sub[1].lower() == "desc")
        step = {"op": "sort", "keys": keys if len(keys) > 1 else keys[0]}
        if any(desc):
            step["descending"] = desc if len(desc) > 1 else desc[0]
        step.update(kwargs)
        return step
    if name == "apply":
        # named user-defined pipeline (apply.cpp:106)
        return {"op": "apply", "name": rest.strip()}
    if name in ("hash_join", "asof_join", "range_join",
                "range_join_partitioned", "skew_join", "ann_topk",
                "fuzzy_decontaminate", "intersect", "except",
                "cross_join", "union_by_name"):
        # two-input operators: `right=( read_* ... | where ... )` is a
        # nested sub-pipeline (the textual analog of the dict form's
        # right: [steps]; reference pipelines compose the same way,
        # exec_pipeline.cpp:186). Everything else is key=value.
        step = {"op": name}
        m = re.search(r"\bright\s*=\s*\(", rest)
        if m is None:
            raise ValueError(
                f"{name}: needs `right=( <sub-pipeline> )` for the "
                "second input"
            )
        close = _matching_paren(rest, m.end() - 1)
        inner = rest[m.end():close]
        step["right"] = [parse_segment(s) for s in split_segments(inner)]
        remainder = (rest[: m.start()] + " " + rest[close + 1:]).strip()
        for tok in split_segments(remainder, " "):
            if not tok:
                continue
            if "=" not in tok:
                raise ValueError(f"{name}: want key=value, got {tok!r}")
            k, _, v = tok.partition("=")
            step[k] = _literal(v)
        return step
    if name == "slice":
        # slice b:e[:stride] [key=value ...] (reference slice.cpp syntax)
        toks = rest.split()
        spec, kvs = (toks[0], toks[1:]) if toks else ("", [])
        step = {"op": "slice"}
        for key, val in zip(["start", "stop", "stride"], spec.split(":")):
            if val.strip():
                step[key] = int(val)
        for tok in kvs:
            k, _, v = tok.partition("=")
            step[k] = _literal(v)
        return step
    # generic: one optional positional + key=value pairs
    step = {"op": name}
    for tok in split_segments(rest, " "):
        if "=" in tok and re.match(r"^\w+=", tok):
            k, _, v = tok.partition("=")
            step[k] = _literal(v)
        elif tok:
            pos = _POSITIONAL.get(name)
            if pos is None or pos in step:
                raise ValueError(f"{name}: unexpected argument {tok!r}")
            step[pos] = _literal(tok)
    return step


def parse_pipeline(text: str) -> Pipeline:
    """Parse an ``op | op | op`` string into a :class:`Pipeline`."""
    return Pipeline([parse_segment(s) for s in split_segments(text)])


def run_pipeline(text: str, ds=None, optimize: bool = True):
    """Parse and execute a pipeline string (the `tenzir "<...>"` analog)."""
    return parse_pipeline(text).run(ds, optimize=optimize)


def explain_pipeline(text: str, parser=None):
    """Parse-and-plan WITHOUT executing: one ``(stage, op, spec)`` row
    per step, parsed vs optimized (the reference's plan introspection).
    Returns a pyarrow Table so it drops into notebooks/CLIs directly.
    ``parser`` overrides the front-end (e.g. tql2's parse_pipeline2)."""
    import json as _json

    import pyarrow as pa

    parsed, optimized = (parser or parse_pipeline)(text).explain()
    rows = [("parsed", s["op"],
             _json.dumps({k: v for k, v in s.items() if k != "op"},
                         default=str))
            for s in parsed]
    rows += [("optimized", s["op"],
              _json.dumps({k: v for k, v in s.items() if k != "op"},
                          default=str))
             for s in optimized]
    return pa.table({
        "stage": pa.array([r[0] for r in rows], pa.string()),
        "op": pa.array([r[1] for r in rows], pa.string()),
        "spec": pa.array([r[2] for r in rows], pa.string()),
    })
