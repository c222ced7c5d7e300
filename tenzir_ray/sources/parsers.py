"""Line parsers: string-column Datasets → typed event Datasets.

Vectorized/compiled-per-actor ``map_batches`` stages mirroring the
reference's format parsers:

- parse_ndjson → builtins/formats/json.cpp (schema inference, --selector,
  --schema; the adaptive series_builder upgrade path is approximated by
  pyarrow's per-batch inference + the engine's SchemaRegistry widening)
- parse_kv     → builtins/formats/kv.cpp:190 (regex field/value split)
- parse_syslog → builtins/formats/syslog.cpp (RFC5424 + RFC3164)
- parse_cef    → builtins/formats/cef.cpp:235
- parse_leef   → builtins/formats/leef.cpp:297
- parse_grok   → builtins/formats/grok.cpp:543 (named-capture patterns,
  %{NAME:field} expansion over a small built-in pattern library)
"""

from __future__ import annotations

import json
import re
import sys

import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value
from tenzir_ray.cdc.registry import SchemaRegistry


def _from_pylist_uniform(rows: list[dict]) -> pa.Table:
    """Build a table from heterogeneous dicts: union of keys, nulls for
    missing (the series_builder additive-field behavior)."""
    keys: list[str] = []
    seen = set()
    for r in rows:
        for k in r:
            if k not in seen:
                seen.add(k)
                keys.append(k)
    return pa.Table.from_pylist([{k: r.get(k) for k in keys} for r in rows])


class _NdjsonParser:
    def __init__(self, column: str, selector: str | None, schema: pa.Schema | None,
                 arrays_of_objects: bool = False):
        self.column = column
        self.selector = selector
        self.schema = schema
        self.arrays_of_objects = arrays_of_objects

    def _fast(self, col: pa.Array) -> pa.Table | None:
        """Whole-column parse through Arrow's C++ NDJSON reader — one
        parse per BATCH instead of one ``json.loads`` per row (the hot
        ingest path; same shape as transforms.parse_json). Returns None
        on any input the C++ reader can't take faithfully (malformed
        lines, top-level non-objects) — the per-row loop then handles
        the batch, including its ``_parse_error`` row tagging."""
        import io

        import pyarrow.compute as pc
        import pyarrow.json as pa_json

        trimmed = pc.utf8_trim_whitespace(pc.fill_null(col, ""))
        keep = pc.not_equal(trimmed, "")
        lines = col.filter(keep)
        if len(lines) == 0:
            return pa.table({})
        try:
            lst = pa.ListArray.from_arrays(
                pa.array([0, len(lines)], pa.int32()), lines
            )
            blob = pc.binary_join(lst, "\n")[0].as_py().encode()
            parsed = pa_json.read_json(io.BytesIO(blob))
        except Exception:
            return None
        if parsed.num_rows != len(lines):
            return None  # embedded-newline edge — fall back
        if self.selector:
            # schema-per-event selector (json.cpp --selector): the
            # selector field's STRING value becomes the #schema analog;
            # non-string selector columns keep the per-row path (str()
            # of Python values differs from an Arrow cast)
            if self.selector in parsed.column_names:
                sc = parsed.column(self.selector)
                if not pa.types.is_string(sc.type):
                    return None
                parsed = parsed.append_column(
                    "_schema", pc.fill_null(sc, "")
                )
            else:
                parsed = parsed.append_column(
                    "_schema", pa.array([""] * parsed.num_rows, pa.string())
                )
        return parsed

    def _slow(self, col: pa.Array) -> pa.Table:
        rows = []
        for line in col.to_pylist():
            if not line or not line.strip():
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                obj = {"_raw": line, "_parse_error": True}
            # --arrays-of-objects (json.cpp): a top-level array yields
            # one event per element
            objs = (
                obj
                if self.arrays_of_objects and isinstance(obj, list)
                else [obj]
            )
            for obj in objs:
                if not isinstance(obj, dict):
                    obj = {"_raw": str(obj), "_parse_error": True}
                if self.selector:
                    # schema-per-event selector (json.cpp --selector):
                    # record the selector value as the #schema analog
                    obj["_schema"] = str(obj.get(self.selector, ""))
                rows.append(obj)
        return _from_pylist_uniform(rows)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tbl = None if self.arrays_of_objects else self._fast(col)
        if tbl is None:
            tbl = self._slow(col)
        if self.schema is not None:
            # SchemaRegistry captured at module import: a runtime
            # tenzir_ray import inside a shipped callable fails on
            # workers without the repo on sys.path
            reg = SchemaRegistry(schema=self.schema)
            tbl = reg.conform(tbl)
        return tbl


def parse_ndjson(ds, column: str = "text", selector: str | None = None,
                 schema: pa.Schema | None = None, batch_size: int = 8192,
                 arrays_of_objects: bool = False):
    """Parse an NDJSON string column into events.

    ``selector``: a field whose value names the per-event schema
    (emitted as ``_schema``); ``schema``: conform output to a fixed
    schema (``--no-infer`` analog); ``arrays_of_objects``: a top-level
    JSON array yields one event per element (json.cpp flag)."""
    # prebuilt instance → stateless task pool (scales to every CPU; an
    # actor pool here capped parallelism at its max size)
    return ds.map_batches(
        _NdjsonParser(column, selector, schema, arrays_of_objects),
        batch_format="pyarrow", batch_size=batch_size,
    )


class _KvParser:
    def __init__(self, column: str, field_split: str, value_split: str, prefix: str):
        self.column = column
        self.field_re = re.compile(field_split)
        self.value_re = re.compile(value_split)
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column(self.column).to_pylist():
            row = {}
            for pair in self.field_re.split(line or ""):
                if not pair:
                    continue
                parts = self.value_re.split(pair, maxsplit=1)
                if len(parts) == 2:
                    row[self.prefix + parts[0].strip()] = parts[1].strip()
            rows.append(row)
        parsed = _from_pylist_uniform(rows)
        for name in parsed.column_names:
            batch = batch.append_column(name, parsed.column(name))
        return batch


def parse_kv(ds, column: str = "text", field_split: str = r"\s+",
             value_split: str = "=", prefix: str = ""):
    """Split key-value pairs (reference kv.cpp: regex field/value split)."""
    return ds.map_batches(
        _KvParser(column, field_split, value_split, prefix),
        batch_format="pyarrow",
    )


_RFC5424 = re.compile(
    r"^<(?P<pri>\d+)>(?P<version>\d+)\s+(?P<ts>\S+)\s+(?P<hostname>\S+)\s+"
    r"(?P<app>\S+)\s+(?P<procid>\S+)\s+(?P<msgid>\S+)\s+"
    r"(?P<sd>-|\[.*?\])\s*(?P<message>.*)$"
)
_RFC3164 = re.compile(
    r"^<(?P<pri>\d+)>(?P<ts>\w{3}\s+\d+\s+\d{2}:\d{2}:\d{2})\s+"
    r"(?P<hostname>\S+)\s+(?P<tag>[\w\-./]+)(?:\[(?P<pid>\d+)\])?:?\s*"
    r"(?P<message>.*)$"
)


class _SyslogParser:
    def __init__(self, column: str):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column(self.column).to_pylist():
            line = line or ""
            m = _RFC5424.match(line)
            if m:
                d = m.groupdict()
                pri = int(d.pop("pri"))
                rows.append(
                    {
                        "facility": pri // 8,
                        "severity": pri % 8,
                        "rfc": 5424,
                        **{k: (None if v in ("-", None) else v) for k, v in d.items()},
                    }
                )
                continue
            m = _RFC3164.match(line)
            if m:
                d = m.groupdict()
                pri = int(d.pop("pri"))
                rows.append(
                    {"facility": pri // 8, "severity": pri % 8, "rfc": 3164, **d}
                )
                continue
            rows.append({"message": line, "rfc": None})
        return _from_pylist_uniform(rows)


def parse_syslog(ds, column: str = "text"):
    """RFC5424/RFC3164 syslog (reference syslog.cpp)."""
    return ds.map_batches(_SyslogParser(column), batch_format="pyarrow")


def _split_unescaped(s: str, sep: str) -> list[str]:
    out, cur, i = [], [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(s[i + 1])
            i += 2
            continue
        if c == sep:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


_CEF_KV = re.compile(r"(\w+)=((?:[^=\\]|\\.)*?)(?=\s+\w+=|$)")


class _CefParser:
    """CEF:version|vendor|product|device_version|event_class|name|severity|ext"""

    def __init__(self, column: str):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column(self.column).to_pylist():
            line = (line or "").strip()
            idx = line.find("CEF:")
            if idx < 0:
                rows.append({"_raw": line, "_parse_error": True})
                continue
            head = _split_unescaped(line[idx + 4 :], "|")
            row = dict(
                zip(
                    ["cef_version", "device_vendor", "device_product",
                     "device_version", "signature_id", "name", "severity"],
                    head[:7],
                )
            )
            ext = "|".join(head[7:])
            for m in _CEF_KV.finditer(ext):
                row[m.group(1)] = m.group(2).replace("\\=", "=").replace("\\\\", "\\")
            rows.append(row)
        return _from_pylist_uniform(rows)


def parse_cef(ds, column: str = "text"):
    """ArcSight CEF (reference cef.cpp)."""
    return ds.map_batches(_CefParser(column), batch_format="pyarrow")


class _LeefParser:
    """LEEF:version|vendor|product|product_version|event_id|attrs (tab- or
    configurable-delimited key=value attributes)."""

    def __init__(self, column: str):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column(self.column).to_pylist():
            line = (line or "").strip()
            idx = line.find("LEEF:")
            if idx < 0:
                rows.append({"_raw": line, "_parse_error": True})
                continue
            head = _split_unescaped(line[idx + 5 :], "|")
            row = dict(
                zip(
                    ["leef_version", "device_vendor", "device_product",
                     "device_version", "event_id"],
                    head[:5],
                )
            )
            if len(head) > 5:
                attrs = "|".join(head[5:])
                delim = "\t"
                # LEEF 2.0: optional delim char field before attrs
                if len(head) > 6 and len(head[5]) <= 4:
                    delim = head[5] or "\t"
                    if delim.startswith("0x") or delim.startswith("x"):
                        delim = chr(int(delim.lstrip("x0") or "9", 16))
                    attrs = "|".join(head[6:])
                for pair in attrs.split(delim):
                    if "=" in pair:
                        k, v = pair.split("=", 1)
                        row[k.strip()] = v
            rows.append(row)
        return _from_pylist_uniform(rows)


def parse_leef(ds, column: str = "text"):
    """IBM LEEF 1.0/2.0 (reference leef.cpp)."""
    return ds.map_batches(_LeefParser(column), batch_format="pyarrow")


# small built-in grok pattern library (grok-patterns are public / Logstash
# heritage; the reference ships a dir of them, formats/grok.cpp)
GROK_PATTERNS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}(?:\.\d{1,3}){3}",
    "IPORHOST": r"\S+",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|CRITICAL)",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "PATH": r"(?:/[\w.-]+)+",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(pattern: str, library: dict[str, str] | None = None) -> str:
    lib = {**GROK_PATTERNS, **(library or {})}

    def _sub(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        base = lib[name]
        # nested pattern refs
        base = _GROK_REF.sub(lambda mm: _sub(mm), base)
        return f"(?P<{field}>{base})" if field else f"(?:{base})"

    return _GROK_REF.sub(_sub, pattern)


class _GrokParser:
    def __init__(self, column: str, pattern: str, library: dict[str, str] | None):
        self.column = column
        self.regex = re.compile(grok_to_regex(pattern, library))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column(self.column).to_pylist():
            m = self.regex.search(line or "")
            rows.append(m.groupdict() if m else {"_raw": line, "_parse_error": True})
        parsed = _from_pylist_uniform(rows)
        for name in parsed.column_names:
            batch = batch.append_column(name, parsed.column(name))
        return batch


def parse_grok(ds, pattern: str, column: str = "text",
               library: dict[str, str] | None = None):
    """Grok named-capture parsing, e.g.
    ``%{IP:client} - %{WORD:method} %{PATH:path}`` (reference grok.cpp;
    regex compiled once per actor)."""
    return ds.map_batches(
        _GrokParser(column, pattern, library), batch_format="pyarrow"
    )


_ZEEK_TYPE_MAP = {
    "count": pa.uint64(),
    "int": pa.int64(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "port": pa.uint16(),
    "time": pa.float64(),      # epoch seconds (zeek writes decimals)
    "interval": pa.float64(),
    "string": pa.string(),
    "addr": pa.string(),
    "subnet": pa.string(),
    "enum": pa.string(),
}


def _zeek_convert(values: list, ztype: str, unset: str, empty: str):
    if ztype.startswith("set[") or ztype.startswith("vector["):
        inner = ztype[ztype.index("[") + 1 : -1]
        out = []
        for v in values:
            if v == unset:
                out.append(None)
            elif v == empty:
                out.append([])
            else:
                out.append(_zeek_convert(v.split(","), inner, unset, empty))
        return out
    typ = _ZEEK_TYPE_MAP.get(ztype, pa.string())
    out = []
    for v in values:
        if v == unset:
            out.append(None)
        elif typ == pa.bool_():
            out.append(v == "T")
        elif pa.types.is_integer(typ):
            out.append(int(v))
        elif pa.types.is_floating(typ):
            out.append(float(v))
        else:
            out.append(v)
    return out


def parse_zeek_tsv_text(text: str) -> pa.Table:
    """Parse one Zeek typed-TSV log document (reference
    builtins/formats/zeek_tsv.cpp: #separator/#fields/#types headers,
    #unset_field/#empty_field markers, set[]/vector[] containers)."""
    sep, unset, empty = "\t", "-", "(empty)"
    fields: list[str] = []
    types: list[str] = []
    rows: list[list[str]] = []
    for line in text.splitlines():
        if not line:
            continue
        if line.startswith("#"):
            parts = line[1:].split(sep if fields else "\t")
            key = parts[0].split(" ")[0]
            if key == "separator":
                raw = line[len("#separator "):]
                sep = raw.encode().decode("unicode_escape") if raw.startswith("\\x") else raw
            elif key == "unset_field":
                unset = parts[1]
            elif key == "empty_field":
                empty = parts[1]
            elif key == "fields":
                fields = parts[1:]
            elif key == "types":
                types = parts[1:]
            continue
        rows.append(line.split(sep))
    assert fields and types, "zeek tsv document lacks #fields/#types headers"
    cols = {}
    for i, (name, ztype) in enumerate(zip(fields, types)):
        vals = [r[i] if i < len(r) else unset for r in rows]
        converted = _zeek_convert(vals, ztype, unset, empty)
        if ztype.startswith("set[") or ztype.startswith("vector["):
            inner = ztype[ztype.index("[") + 1 : -1]
            cols[name] = pa.array(converted, pa.list_(_ZEEK_TYPE_MAP.get(inner, pa.string())))
        else:
            cols[name] = pa.array(converted, _ZEEK_TYPE_MAP.get(ztype, pa.string()))
    return pa.table(cols)


def read_zeek_tsv(paths):
    """Zeek typed-TSV files → events; header travels with each file, so
    parse per file (read_binary_files: one block per file)."""
    import ray.data

    def _load(batch: pa.Table) -> pa.Table:
        tables = [
            parse_zeek_tsv_text(data.decode("utf-8", "replace"))
            for data in batch.column("bytes").to_pylist()
        ]
        return pa.concat_tables(tables, promote_options="permissive")

    return ray.data.read_binary_files(paths).map_batches(
        _load, batch_format="pyarrow", batch_size=1
    )


def parse_yaml_docs(ds, column: str = "text"):
    """YAML documents → events (reference formats/yaml.cpp); each row's
    string may hold one document (use read_binary_files + split for
    multi-doc files)."""
    import yaml

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for doc in batch.column(column).to_pylist():
            try:
                obj = yaml.safe_load(doc) or {}
                rows.append(obj if isinstance(obj, dict) else {"value": obj})
            except yaml.YAMLError:
                rows.append({"_raw": doc, "_parse_error": True})
        return _from_pylist_uniform(rows)

    return ds.map_batches(_parse, batch_format="pyarrow")


def parse_suricata(ds, column: str = "text"):
    """Suricata eve.json preset (reference json.cpp alias `suricata`):
    NDJSON with the schema selected per event by `event_type`."""
    return parse_ndjson(ds, column=column, selector="event_type")


def parse_zeek_json(ds, column: str = "text"):
    """Zeek JSON-streaming preset (reference alias `zeek-json`): NDJSON
    with the schema named by `_path`."""
    return parse_ndjson(ds, column=column, selector="_path")


def parse_gelf(ds, column: str = "text"):
    """GELF preset (reference json.cpp alias `gelf`;
    web/docs/formats/gelf.md): NDJSON of Graylog Extended Log Format
    records — version, host, short_message, level, `_`-prefixed
    additional fields, and an epoch-seconds `timestamp` converted to a
    real timestamp column."""
    import pyarrow.compute as _pc

    parsed = parse_ndjson(ds, column=column)

    def _ts(t: pa.Table) -> pa.Table:
        if "timestamp" in t.column_names:
            i = t.schema.get_field_index("timestamp")
            micros = _pc.cast(
                _pc.round(
                    _pc.multiply(_pc.cast(t.column("timestamp"), pa.float64()), 1e6)
                ),
                pa.int64(),
            )
            t = t.set_column(i, "timestamp", micros.cast(pa.timestamp("us")))
        return t

    return parsed.map_batches(_ts, batch_format="pyarrow")


def split_by_schema(ds, column: str = "_schema") -> dict:
    """Heterogeneous stream → one Dataset per schema value (the
    reference's multi-schema dataflow, pipeline.hpp:30: a stream may
    interleave slices of many schemas; Ray Datasets are single-schema, so
    the split materializes the distinct schema names (small) and filters
    lazily per name)."""
    names = sorted(
        x if isinstance(x, str) else x[column] for x in ds.unique(column)
    )
    out = {}
    for name in names:
        expr_name = name

        def _f(t, _n=expr_name):
            import pyarrow.compute as _pc

            return t.filter(_pc.equal(t[column], _n))

        out[name] = ds.map_batches(_f, batch_format="pyarrow")
    return out


ship_by_value(sys.modules[__name__])
