"""CDC wire-envelope parsers: Debezium, Maxwell, wal2json → change rows.

A real binlog/WAL tail arrives as JSON envelopes on a broker topic, not
as ready-made change rows. These stages normalize the three dominant
public formats into the engine's change-row contract — ``lsn:int64,
op:string ∈ {insert,update,delete,truncate}, <key+payload columns>`` —
the exact shape :meth:`~tenzir_ray.cdc.lake.LakeTable.apply_changes`
ingests, so ``broker tail → parse_<format> → lake.apply_changes`` is a
complete pipeline over any Debezium/Maxwell/wal2json feed.

Format references (all public):
- Debezium envelope: before/after/op/ts_ms/source.lsn, optionally under
  a ``payload`` wrapper when schemas are enabled (debezium.io docs).
- Maxwell: database/table/type/ts/xid/data/old (maxwells-daemon.io).
- wal2json format-version 2: one JSON object per change with
  action/columns[{name,type,value}]/identity (wal2json README).

Scale shape: Debezium and Maxwell parse through ``pyarrow.json`` — the
whole batch's envelopes become ONE newline-joined buffer read by the
C++ JSON reader (raw newlines cannot legally occur inside JSON strings,
so the join is unambiguous), then struct-field kernels pick the
columns; no per-row Python. wal2json's per-row heterogeneous
``columns`` array defeats columnar inference, so it parses with stdlib
json per row — still batch-parallel across the pool (documented cost).

Reference analog: the reference parses wire JSON via its json plugin +
selector routing (``libtenzir/builtins/formats/json.cpp``); envelope
semantics (before/after, op codes) are format-defined, not
reference-defined.
"""

from __future__ import annotations

import io
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value

#: Debezium op codes → engine ops (c=create, r=snapshot read, u=update,
#: d=delete). Truncate ('t') has no key, so it cannot be expressed as a
#: keyed LWW change — those records (and unknown op codes) are DROPPED
#: rather than forwarded, where apply_changes would keep them as
#: phantom live rows (its LWW only special-cases op == 'delete').
_DEBEZIUM_OPS = {"c": "insert", "r": "insert", "u": "update",
                 "d": "delete"}
#: Maxwell 'type' values → engine ops. bootstrap-insert is a full-row
#: snapshot insert; framing/DDL records (bootstrap-start/-complete,
#: table-create/-alter/-drop, ...) are dropped for the same reason as
#: Debezium truncates.
_MAXWELL_OPS = {"insert": "insert", "update": "update",
                "delete": "delete", "bootstrap-insert": "insert"}
_WAL2JSON_OPS = {"I": "insert", "U": "update", "D": "delete"}


def _read_json_column(arr) -> tuple[pa.Table, np.ndarray]:
    """Parse a string column of one-line JSON objects with the arrow C++
    reader: returns (table of parsed rows, boolean keep-mask of non-null
    non-empty input rows)."""
    import pyarrow.json as pj

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = arr.to_pylist()
    keep = np.array([bool(v) and not v.isspace() for v in
                     (v if v is not None else "" for v in vals)])
    lines = [vals[i] for i in np.flatnonzero(keep)]
    if not lines:
        return pa.table({}), keep
    buf = ("\n".join(lines) + "\n").encode()
    return pj.read_json(io.BytesIO(buf)), keep


def _cast_payload(table: pa.Table, columns) -> pa.Table:
    """Pin payload columns to caller-declared types (absent → typed
    nulls) so batch-independent JSON inference cannot drift the stage's
    output schema."""
    if not columns:
        return table
    arrays, names = [], []
    for name, typ in columns.items():
        if name in table.column_names:
            arrays.append(table.column(name).cast(typ))
        else:
            arrays.append(pa.nulls(table.num_rows, typ))
        names.append(name)
    meta = [c for c in ("lsn", "op") if c in table.column_names]
    return pa.table(
        dict(zip(meta, [table.column(c) for c in meta])) | dict(zip(names, arrays))
    )


def _struct_fields(col: pa.ChunkedArray | pa.Array) -> list[str]:
    t = col.type
    return [t.field(i).name for i in range(t.num_fields)] \
        if pa.types.is_struct(t) else []


def parse_debezium(ds, column: str = "value",
                   columns: dict | None = None, batch_size: int = 8192):
    """Debezium envelope → change rows. Handles both the flat form and
    the ``payload``-wrapped form (schemas enabled); ``op`` maps
    c/r→insert, u→update, d→delete, t→truncate; payload fields come
    from ``after`` (``before`` for deletes, which carry only the old
    row); ``lsn`` prefers ``source.lsn`` and falls back to ``ts_ms``.
    ``columns`` (name → pyarrow type) pins the output payload schema —
    recommended for multi-batch streams."""

    def _p(t: pa.Table) -> pa.Table:
        parsed, _ = _read_json_column(t.column(column))
        if parsed.num_rows == 0:
            return _cast_payload(
                pa.table({"lsn": pa.array([], pa.int64()),
                          "op": pa.array([], pa.string())}), columns)
        if "payload" in parsed.column_names:
            parsed = pa.Table.from_arrays(
                [pc.struct_field(parsed.column("payload"), f)
                 for f in _struct_fields(parsed.column("payload"))],
                names=_struct_fields(parsed.column("payload")))
        names = set(parsed.column_names)
        op_raw = parsed.column("op") if "op" in names else \
            pa.nulls(parsed.num_rows, pa.string())
        op = pc.case_when(
            pc.make_struct(*[pc.equal(op_raw, k) for k in _DEBEZIUM_OPS]),
            *[pa.scalar(v) for v in _DEBEZIUM_OPS.values()],
            pa.scalar(None, pa.string()))
        lsn = None
        if "source" in names and "lsn" in _struct_fields(parsed.column("source")):
            lsn = pc.struct_field(parsed.column("source"), "lsn")
        if "ts_ms" in names:
            ts = parsed.column("ts_ms").cast(pa.int64())
            lsn = ts if lsn is None else pc.coalesce(lsn.cast(pa.int64()), ts)
        if lsn is None:
            lsn = pa.nulls(parsed.num_rows, pa.int64())
        after = parsed.column("after") if "after" in names else None
        before = parsed.column("before") if "before" in names else None
        fields: dict[str, pa.Array] = {}
        is_del = pc.equal(op, "delete")
        for src, other in ((after, before), (before, after)):
            if src is None:
                continue
            for f in _struct_fields(src):
                if f in fields:
                    continue
                v = pc.struct_field(src, f)
                if other is not None and f in _struct_fields(other):
                    o = pc.struct_field(other, f)
                    # deletes read from before, everything else from after
                    v = pc.if_else(is_del, o, v) if src is after else \
                        pc.if_else(is_del, v, o)
                fields[f] = v
        out = pa.table({"lsn": lsn.cast(pa.int64()), "op": op, **fields})
        # unknown op codes and truncates mapped to null above: drop them
        out = out.filter(pc.is_valid(out.column("op")))
        return _cast_payload(out, columns)

    return ds.map_batches(_p, batch_format="pyarrow", batch_size=batch_size)


def parse_maxwell(ds, column: str = "value",
                  columns: dict | None = None, batch_size: int = 8192):
    """Maxwell daemon envelope → change rows: ``type``
    insert/update/delete maps through verbatim and ``bootstrap-insert``
    becomes an insert; framing/DDL types (bootstrap-start/-complete,
    table-create/-alter/-drop, ...) are dropped. Payload is ``data``
    (Maxwell deletes carry the deleted row in ``data``); ``lsn``
    prefers ``xid`` and falls back to ``ts`` (seconds). ``old``
    (changed-column previous values) is dropped — LWW apply needs only
    the new image."""

    def _p(t: pa.Table) -> pa.Table:
        parsed, _ = _read_json_column(t.column(column))
        if parsed.num_rows == 0:
            return _cast_payload(
                pa.table({"lsn": pa.array([], pa.int64()),
                          "op": pa.array([], pa.string())}), columns)
        names = set(parsed.column_names)
        op_raw = parsed.column("type") if "type" in names else \
            pa.nulls(parsed.num_rows, pa.string())
        op = pc.case_when(
            pc.make_struct(*[pc.equal(op_raw, k) for k in _MAXWELL_OPS]),
            *[pa.scalar(v) for v in _MAXWELL_OPS.values()],
            pa.scalar(None, pa.string()))
        lsn = None
        if "xid" in names:
            lsn = parsed.column("xid").cast(pa.int64())
        if "ts" in names:
            ts = parsed.column("ts").cast(pa.int64())
            lsn = ts if lsn is None else pc.coalesce(lsn, ts)
        if lsn is None:
            lsn = pa.nulls(parsed.num_rows, pa.int64())
        fields = {}
        if "data" in names:
            data = parsed.column("data")
            fields = {f: pc.struct_field(data, f)
                      for f in _struct_fields(data)}
        out = pa.table({"lsn": lsn, "op": op, **fields})
        out = out.filter(pc.is_valid(out.column("op")))
        return _cast_payload(out, columns)

    return ds.map_batches(_p, batch_format="pyarrow", batch_size=batch_size)


def _pg_lsn(s):
    """PostgreSQL LSN text ``X/Y`` (hex) → int64 ``(X<<32)|Y``."""
    if not s:
        return None
    hi, _, lo = s.partition("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def parse_wal2json(ds, column: str = "value",
                   columns: dict | None = None, batch_size: int = 8192):
    """wal2json format-version-2 records → change rows. ``action``
    I/U/D maps to insert/update/delete; B(egin)/C(ommit)/M(essage)
    framing and keyless T(runcate) records are dropped (truncate has no
    keyed-LWW representation); payload fields come from
    ``columns`` (``identity`` for deletes); ``lsn`` parses the
    PostgreSQL ``X/Y`` hex form when present.

    Parses with stdlib json per row: the per-row heterogeneous
    ``columns: [{name,type,value}]`` array defeats columnar inference
    (documented cost; batches still parse in parallel across the
    pool)."""

    def _p(t: pa.Table) -> pa.Table:
        rows = []
        col = t.column(column)
        for v in (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                  else col).to_pylist():
            if not v or v.isspace():
                continue
            d = json.loads(v)
            action = d.get("action")
            if action not in _WAL2JSON_OPS:
                continue  # B/C/M/T framing + truncate records
            src = d.get("columns") if action != "D" else \
                (d.get("identity") or d.get("columns"))
            payload = {c["name"]: c.get("value") for c in (src or [])}
            rows.append({"lsn": _pg_lsn(d.get("lsn")),
                         "op": _WAL2JSON_OPS[action], **payload})
        if not rows:
            return _cast_payload(
                pa.table({"lsn": pa.array([], pa.int64()),
                          "op": pa.array([], pa.string())}), columns)
        out = pa.Table.from_pylist(rows)
        out = out.set_column(out.schema.get_field_index("lsn"), "lsn",
                             out.column("lsn").cast(pa.int64()))
        return _cast_payload(out, columns)

    return ds.map_batches(_p, batch_format="pyarrow", batch_size=batch_size)


def fold_patches(ds, keys, lsn_col: str = "lsn", op_col: str = "op",
                 buckets: int | None = None):
    """Collapse a PARTIAL-UPDATE (patch-style) change stream into full
    images — the semantic gap between wire CDC and LWW apply: Debezium
    with ``ExtractNewRecordState`` drop-tombstones off, MongoDB
    ``$set`` updates, and many homegrown binlogs emit updates carrying
    ONLY the changed columns, null meaning "unchanged". Last-writer-wins
    take-latest (what :meth:`LakeTable.apply_changes` applies) would
    wrongly null-out the untouched columns; this stage folds instead:

    - ``insert`` = full image: every column is SET, including its nulls;
    - ``update`` = patch: only non-null columns overwrite;
    - ``delete`` = tombstone: the key dies; patches after a delete (and
      before the next insert) are ignored;
    - updates with no prior insert build an image from their non-null
      columns (the common consumer upsert behavior).

    Emits ONE row per key — the folded image with ``op='insert'`` (or a
    ``'delete'`` tombstone) and the key's max lsn — ready for
    ``apply_changes`` (single row per key makes LWW trivially correct).
    Requires the stream to contain each key's full relevant history
    (true for replays; for incremental epochs against live lake state,
    use :meth:`LakeTable.merge`, which patches against the base).

    Scale shape: one grouped exchange on the key columns, then a
    per-task vectorized fold — per column one ``np.maximum.accumulate``
    last-set-pointer pass with per-segment resets; no per-row Python."""
    import pandas as pd

    from tenzir_ray.stages.exchange import grouped_apply

    kcols = [keys] if isinstance(keys, str) else list(keys)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        payload = [c for c in df.columns
                   if c not in kcols + [lsn_col, op_col]]
        if not len(df):
            # grouped_apply pins the empty-input schema from this call:
            # keep the same column order (and object-typed op) as the
            # non-empty fold so both paths emit one stable schema
            out = df[kcols + [lsn_col, op_col] + payload].copy()
            out[op_col] = out[op_col].astype(object)
            return out
        df = df.sort_values(kcols + [lsn_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        gid = df.groupby(kcols, sort=False, dropna=False).ngroup().to_numpy()
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        ends = np.append(starts[1:], n)
        row_start = np.repeat(starts, ends - starts)
        op = df[op_col].to_numpy()
        idx = np.arange(n)
        # final segment = rows at/after the key's last boundary
        # (insert/delete); keys with no boundary start at the key start
        boundary = op != "update"
        bsrc = np.maximum.accumulate(np.where(boundary, idx, -1))
        last_b = np.maximum(bsrc, row_start)  # per-row; rows before a
        # later boundary are superseded — only the value at each key's
        # LAST row matters below
        last_row = ends - 1
        seg_start = last_b[last_row]          # per-key final segment start
        dead = op[seg_start] == "delete"

        out = df.iloc[last_row][kcols].reset_index(drop=True)
        out[lsn_col] = df[lsn_col].to_numpy()[last_row]
        out[op_col] = np.where(dead, "delete", "insert")
        for c in payload:
            vals = df[c].to_numpy(object)
            set_mask = boundary | ~pd.isna(df[c]).to_numpy()
            src = np.maximum.accumulate(np.where(set_mask, idx, -1))
            pick = src[last_row]
            have = pick >= seg_start
            col = np.where(have & ~dead, vals[np.maximum(pick, 0)], None)
            s = pd.Series(col)
            try:
                s = s.astype(df[c].dtype)
            except (TypeError, ValueError):
                pass  # e.g. int column that gained nulls → inferred
            out[c] = s
        return out

    return grouped_apply(ds, kcols, _fold, num_buckets=buckets,
                         tag="foldpatch")


ship_by_value(sys.modules[__name__])
