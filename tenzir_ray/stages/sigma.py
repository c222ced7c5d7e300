"""Sigma-style detection rules → compiled dataset filters.

The reference compiles Sigma YAML rules into its expression AST and
matches them against event streams (plugins/sigma/src/parse.cpp:522,
plugin.cpp:214). Here a rule's ``detection`` block compiles to a
``pyarrow.dataset`` expression evaluated per batch (and usable for
parquet row-group pruning).

Supported subset of the public Sigma spec:
- selections: ``{field: value}``, ``{field: [v1, v2]}`` (OR),
  modifiers ``field|contains``, ``field|startswith``, ``field|endswith``,
  ``field|re``, ``field|gt/gte/lt/lte``;
- condition: boolean expression over selection names with
  ``and / or / not`` and the ``1 of them`` / ``all of them`` forms.
"""

from __future__ import annotations

import ast
import sys

import pyarrow.compute as pc
import pyarrow.dataset as pads

from tenzir_ray._ship import ship_by_value

_MODIFIERS = {
    "contains": lambda f, v: pc.match_substring(f, v),
    "startswith": lambda f, v: pc.starts_with(f, v),
    "endswith": lambda f, v: pc.ends_with(f, v),
    "re": lambda f, v: pc.match_substring_regex(f, v),
    "gt": lambda f, v: f > v,
    "gte": lambda f, v: f >= v,
    "lt": lambda f, v: f < v,
    "lte": lambda f, v: f <= v,
}


def _field_term(key: str, value) -> pads.Expression:
    if "|" in key:
        name, mod = key.split("|", 1)
        fn = _MODIFIERS.get(mod)
        if fn is None:
            raise ValueError(f"unsupported sigma modifier {mod!r}")
        field = pc.field(name)
        if isinstance(value, list):
            out = None
            for v in value:
                t = fn(field, v)
                out = t if out is None else (out | t)
            return out
        return fn(field, value)
    field = pc.field(key)
    if isinstance(value, list):
        return field.isin(value)
    if value is None:
        return field.is_null()
    return field == value


def _selection_expr(sel) -> pads.Expression:
    """A selection maps field→matcher (AND across fields); a LIST of such
    maps is OR across them (Sigma list-of-maps semantics)."""
    if isinstance(sel, list):
        out = None
        for m in sel:
            e = _selection_expr(m)
            out = e if out is None else (out | e)
        return out
    out = None
    for k, v in sel.items():
        e = _field_term(k, v)
        out = e if out is None else (out & e)
    return out


def compile_rule(rule: dict) -> pads.Expression:
    """Compile a Sigma-style rule dict (its ``detection`` block) into one
    dataset expression."""
    detection = rule.get("detection", rule)
    condition = detection.get("condition", None)
    selections = {
        k: _selection_expr(v) for k, v in detection.items() if k != "condition"
    }
    if condition is None:
        condition = " and ".join(selections) if len(selections) > 1 else next(iter(selections))
    cond = condition.strip()
    if cond in ("1 of them", "any of them"):
        out = None
        for e in selections.values():
            out = e if out is None else (out | e)
        return out
    if cond == "all of them":
        out = None
        for e in selections.values():
            out = e if out is None else (out & e)
        return out

    tree = ast.parse(cond, mode="eval")

    def _walk(node):
        if isinstance(node, ast.BoolOp):
            parts = [_walk(v) for v in node.values]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if isinstance(node.op, ast.And) else (out | p)
            return out
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            return ~_walk(node.operand)
        if isinstance(node, ast.Name):
            return selections[node.id]
        raise ValueError(f"unsupported sigma condition node: {ast.dump(node)}")

    return _walk(tree.body)


def load_rules(path: str) -> list[dict]:
    """Load Sigma rules from a YAML file or a directory of ``*.yml`` /
    ``*.yaml`` files (the reference's rule-directory loading,
    plugins/sigma/plugin.cpp — without the hot-reload watcher; re-call to
    pick up changes). Multi-document files yield one rule each."""
    import glob
    import os

    import yaml

    files = (
        sorted(
            glob.glob(os.path.join(path, "*.yml"))
            + glob.glob(os.path.join(path, "*.yaml"))
        )
        if os.path.isdir(path)
        else [path]
    )
    rules = []
    for f in files:
        with open(f) as fh:
            for doc in yaml.safe_load_all(fh):
                if isinstance(doc, dict) and "detection" in doc:
                    rules.append(doc)
    return rules


def sigma(ds, rule: "dict | str | list[dict]"):
    """Filter a Dataset to events matching the rule(s) (the reference's
    `sigma` operator). ``rule`` may be a rule dict, a list of rule dicts
    (match = ANY rule, tagged in ``_sigma_rule``), or a path to a YAML
    rule file / directory."""
    if isinstance(rule, str):
        rule = load_rules(rule)
    if isinstance(rule, list):
        import pyarrow as pa

        compiled = [
            (r.get("title", f"rule{i}"), compile_rule(r))
            for i, r in enumerate(rule)
        ]

        def _filter_many(batch):
            if not compiled:
                # zero rules ⇒ zero matches, not a crash
                return batch.slice(0, 0).append_column(
                    "_sigma_rule", pa.array([], pa.string())
                )
            view = pads.dataset(batch)
            outs = []
            for title, e in compiled:
                hit = view.to_table(filter=e)
                outs.append(
                    hit.append_column(
                        "_sigma_rule",
                        pa.array([title] * hit.num_rows, pa.string()),
                    )
                )
            return pa.concat_tables(outs)

        return ds.map_batches(_filter_many, batch_format="pyarrow")
    expr = compile_rule(rule)

    def _filter(batch):
        return pads.dataset(batch).to_table(filter=expr)

    return ds.map_batches(_filter, batch_format="pyarrow")


def sigma_scan(paths, rule: "dict | str | list[dict]",
               columns: list[str] | None = None, **kw):
    """Sigma rule(s) pushed INTO the parquet read: the compiled
    expression prunes row groups at the scan (the reference's
    catalog/sketch pruning analog — export.cpp:139 candidate selection).
    Accepts the same rule forms as :func:`sigma` (dict, YAML file/dir
    path, or list — a list pushes the OR of all rules; per-rule tagging
    needs the post-read :func:`sigma`)."""
    import ray.data

    if isinstance(rule, str):
        rule = load_rules(rule)
    if isinstance(rule, list):
        if not rule:
            raise ValueError("sigma_scan: empty rule list")
        expr = None
        for r in rule:
            e = compile_rule(r)
            expr = e if expr is None else (expr | e)
    else:
        expr = compile_rule(rule)
    return ray.data.read_parquet(paths, columns=columns, filter=expr, **kw)


class RuleWatcher:
    """Hot-reload for a Sigma rule file/directory (the reference's
    rule-directory watcher, plugins/sigma/plugin.cpp — it live-reloads
    rules for long-running pipelines).

    A Ray Data pipeline serializes its compiled expressions at launch,
    so reload happens at micro-batch boundaries: each scheduled tick
    (``every``/``cron``, pipelines/schedule.py) calls :meth:`rules` and
    gets the current set, re-read only when an mtime/file-set change is
    detected (one cheap stat pass per tick, no YAML parse when clean)."""

    def __init__(self, path: str):
        self.path = path
        self._sig: tuple | None = None
        self._rules: list[dict] = []

    def _signature(self) -> tuple:
        import glob
        import os

        if os.path.isdir(self.path):
            files = sorted(
                glob.glob(os.path.join(self.path, "*.yml"))
                + glob.glob(os.path.join(self.path, "*.yaml"))
            )
        else:
            files = [self.path]
        sig = []
        for f in files:
            try:  # one stat, tolerated racing an editor's delete+rename
                st = os.stat(f)
            except FileNotFoundError:
                continue
            sig.append((f, st.st_mtime_ns, st.st_size))
        return tuple(sig)

    def rules(self) -> list[dict]:
        """Current rule set; reloads iff the file set/mtimes changed."""
        sig = self._signature()
        if sig != self._sig:
            self._rules = load_rules(self.path) if sig else []
            self._sig = sig
        return self._rules

    @property
    def changed(self) -> bool:
        """True if the next :meth:`rules` call would reload."""
        return self._signature() != self._sig


ship_by_value(sys.modules[__name__])
