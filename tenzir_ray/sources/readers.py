"""File readers — thin, option-mapped wrappers over ``ray.data.read_*``
(reference connectors file/directory + formats parquet/feather/xsv/json/
lines; plugins/parquet/parquet.cpp:26, builtins/formats/feather.cpp,
xsv.cpp, json.cpp, lines.cpp).

Always prefer passing ``columns=`` / ``filter=`` so projection and
row-group pruning happen at the read (the reference's catalog/sketch
pushdown analog, builtins/operators/export.cpp:139).
"""

from __future__ import annotations

import os
from typing import Any


def _bare_schema(path: str, columns: list[str] | None):
    """Footer-only read of a single parquet file's schema, metadata
    stripped and projected. Blocks produced under an explicit bare
    schema are hashable (pa.Schema with pandas metadata is not in this
    pyarrow version), which keeps Ray Data's schema-dedup fast path on
    and silences its per-task 'Failed to hash the schemas' warning."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sch = pq.read_schema(path).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


#: observability for the last file-level prune performed by
#: ``read_parquet`` (tests + `ds.stats()`-style introspection):
#: {"listed": N, "kept": K, "skipped": N-K} — None until a prune ran.
last_prune: "dict | None" = None

#: listing larger than this skips driver-side footer pruning (footers
#: are ~KB each, but a million-file listing would serialize the driver;
#: the row-group pushdown inside each read task still applies in full)
PRUNE_MAX_FILES = int(os.environ.get("TENZIR_RAY_PRUNE_MAX_FILES", "100000"))


def _list_parquet_files(paths) -> "list[str] | None":
    """Expand local paths to a flat parquet file list, or None when the
    listing isn't prunable (remote URIs, hive-partitioned layouts —
    passing an explicit file list to ray would drop hive column
    inference, so those keep the directory read)."""
    stack = list(paths) if isinstance(paths, (list, tuple)) else [paths]
    out: list[str] = []
    while stack:
        p = stack.pop()
        if not isinstance(p, str) or "://" in p:
            return None
        if os.path.isdir(p):
            for name in os.listdir(p):
                if "=" in name:  # hive-style partition dir
                    return None
                if name.startswith((".", "_")):
                    continue
                stack.append(os.path.join(p, name))
        elif p.endswith((".parquet", ".pq")):
            out.append(p)
        else:
            return None
        if len(out) > PRUNE_MAX_FILES:
            return None
    return sorted(out)


def _footer_zone(path: str, cols: "set[str]") -> dict:
    """Per-file {col: [min, max]} from parquet footer row-group
    statistics, only for the requested flat top-level columns. A column
    with any row group lacking stats is omitted (no pruning claim)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    pqs = md.schema
    leaf = {pqs.column(i).path: i for i in range(len(pqs.names))
            if pqs.column(i).path in cols}
    zone: dict = {}
    for name, li in leaf.items():
        mn = mx = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(li).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo, hi = st.min, st.max
            if isinstance(lo, bytes) or lo is None or hi is None:
                ok = False  # physical byte stats / empty: no claim
                break
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
        if ok and mn is not None:
            zone[name] = [mn, mx]
    return zone


def _zone_excludes(zone: dict, conjuncts: list) -> bool:
    """True iff the footer bounds provably exclude every row for the
    AND-ed ``(col, op, literal)`` conjuncts (the lake's manifest
    zone-map test, here over parquet footer stats — reference catalog
    synopsis pruning, libtenzir/include/tenzir/catalog.hpp:90)."""
    from datetime import date, datetime

    for col, op, v in conjuncts:
        mm = zone.get(col)
        if not mm:
            continue
        mn, mx = mm
        if isinstance(mn, (datetime, date)) and isinstance(v, str):
            try:
                v = datetime.fromisoformat(v)
                if isinstance(mn, date) and not isinstance(mn, datetime):
                    mn = datetime(mn.year, mn.month, mn.day)
                    mx = datetime(mx.year, mx.month, mx.day)
            except ValueError:
                continue
        try:
            if ((op == "==" and (v < mn or v > mx))
                    or (op == "<" and not (mn < v))
                    or (op == "<=" and not (mn <= v))
                    or (op == ">" and not (mx > v))
                    or (op == ">=" and not (mx >= v))
                    or (op == "!=" and mn == mx == v)):
                return True
        except TypeError:
            continue  # incomparable literal/stat types: keep the file
    return False


def _prune_paths(paths, filter_text: str):
    """File-level zone-map prune: returns (possibly reduced) paths. The
    driver reads only footers (threaded), so a 10k-file table prunes in
    well under a second; read tasks are never scheduled for files whose
    min/max provably exclude the filter's simple conjuncts."""
    global last_prune
    from tenzir_ray.expr import prune_conjuncts

    conjuncts = prune_conjuncts(filter_text)
    if not conjuncts:
        return paths
    files = _list_parquet_files(paths)
    if not files or len(files) < 2:
        return paths
    cols = {c for c, _, _ in conjuncts}
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(32, len(files))) as ex:
        zones = list(ex.map(lambda p: _footer_zone(p, cols), files))
    kept = [p for p, z in zip(files, zones)
            if not _zone_excludes(z, conjuncts)]
    last_prune = {"listed": len(files), "kept": len(kept),
                  "skipped": len(files) - len(kept)}
    return kept if kept else [files[0]]  # keep one: schema survives


def read_parquet(paths, columns: list[str] | None = None, filter_expr: str | None = None,
                 prune_files: bool = True, **kwargs: Any):
    """Parquet read with projection + predicate pushdown.

    ``filter_expr`` is our expression-language string; it compiles to a
    pyarrow dataset expression evaluated at the row-group level. On
    local multi-file layouts the simple comparison conjuncts also prune
    whole FILES from the footer statistics before any read task is
    scheduled (``prune_files=False`` opts out)."""
    import ray.data

    residual = None
    drop_after = []
    if filter_expr is not None:
        from tenzir_ray.expr import compile_filter

        if prune_files:
            try:
                paths = _prune_paths(paths, filter_expr)
            except Exception:
                pass  # pruning is best-effort; the scan filter is total
        f = compile_filter(filter_expr)
        if f.pushdown is not None:
            kwargs["filter"] = f.pushdown
        residual = f.residual
        if residual is not None and columns:
            # residual conjuncts evaluate AFTER projection — widen the
            # scan to what they reference (pushdown conjuncts don't need
            # this: the dataset scan filters on unprojected columns)
            avail = None
            if isinstance(paths, str) and os.path.isfile(paths):
                import pyarrow.parquet as pq

                avail = set(pq.read_schema(paths).names)
            columns, drop_after = f.widen_projection(columns, avail)
    if ("schema" not in kwargs and "filter" not in kwargs
            and isinstance(paths, str) and os.path.isfile(paths)):
        # a pushed-down filter may reference columns OUTSIDE the
        # projection; injecting a projected schema would make the scan
        # fail on them — keep default inference for filtered reads
        try:
            kwargs["schema"] = _bare_schema(paths, columns)
        except Exception:
            pass  # odd layouts keep the default inference path
    ds = ray.data.read_parquet(paths, columns=columns, **kwargs)
    if residual is not None:
        import pyarrow as pa

        def _post(batch: pa.Table) -> pa.Table:
            if batch.num_rows:
                batch = batch.filter(pa.array(residual(batch)))
            if drop_after:
                batch = batch.drop_columns(drop_after)
            return batch

        ds = ds.map_batches(_post, batch_format="pyarrow")
    return ds


def read_csv(paths, delimiter: str = ",", columns: list[str] | None = None,
             header: bool = True, column_names: list[str] | None = None,
             **kwargs: Any):
    """CSV/TSV/SSV (reference `xsv`, builtins/formats/xsv.cpp): delimiter,
    header control, projection."""
    import ray.data
    from pyarrow import csv as pacsv

    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    read_options = None
    if not header:
        read_options = pacsv.ReadOptions(column_names=column_names)
    convert_options = None
    if columns:
        convert_options = pacsv.ConvertOptions(include_columns=columns)
    return ray.data.read_csv(
        paths,
        parse_options=parse_options,
        **({"read_options": read_options} if read_options else {}),
        **({"convert_options": convert_options} if convert_options else {}),
        **kwargs,
    )


def read_json(paths, **kwargs: Any):
    """NDJSON via Ray's native reader (schema inference per block; for
    selector/strict-schema semantics use parsers.parse_ndjson over
    read_lines)."""
    import ray.data

    return ray.data.read_json(paths, **kwargs)


def read_lines(paths, **kwargs: Any):
    """One string event per line (reference `lines`, formats/lines.cpp);
    column name: ``text``."""
    import ray.data

    return ray.data.read_text(paths, **kwargs)


def _read_binary_tables(paths, read_one):
    """Shared scaffold for formats Ray has no native reader for
    (feather/orc): read_binary_files → one decoded Arrow table per file
    (files are already partition-sized in our layouts)."""
    import pyarrow as pa
    import ray.data

    def _load(batch):
        return pa.concat_tables(
            [read_one(pa.BufferReader(data)) for data in batch["bytes"]],
            promote_options="permissive",
        )

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(_load, batch_format="pandas", batch_size=1)


def read_feather(paths, columns: list[str] | None = None):
    """Arrow IPC / Feather files (reference formats/feather.cpp)."""
    import pyarrow.feather as feather

    def _one(buf):
        tbl = feather.read_table(buf)
        return tbl.select(columns) if columns else tbl

    return _read_binary_tables(paths, _one)


def read_orc(paths, columns: list[str] | None = None):
    """ORC files (beyond the reference's format set — its lake peers all
    speak ORC, so a migrating user needs it); column-pruned at the
    stripe reader."""
    import pyarrow.orc as orc

    def _one(buf):
        f = orc.ORCFile(buf)
        return f.read(columns=columns) if columns else f.read()

    return _read_binary_tables(paths, _one)


def follow_lines(path, poll_s: float = 0.5, idle_limit: int | None = None,
                 sleep=None, from_start: bool = True):
    """Tail a growing text file (the reference `file --follow`,
    connectors/file.cpp): a DRIVER-side generator yielding batches of
    complete new lines as they are appended. A byte-stream tail is
    outside the Dataset model, so the driver owns the loop and feeds
    each yielded batch into pipelines (e.g. `ray.data.from_items` +
    a parser, or a `LakeTable.apply_changes` epoch).

    ``idle_limit``: stop after this many consecutive empty polls (None =
    follow forever); ``sleep`` is injectable for tests. Partial trailing
    lines (no newline yet) are held back until completed."""
    import time as _time

    sleep = sleep or _time.sleep
    idle = 0
    pos = 0 if from_start else os.path.getsize(path)
    buf = b""
    try:
        inode = os.stat(path).st_ino
    except OSError:
        inode = None
    while True:
        try:
            st = os.stat(path)
            size = st.st_size
        except OSError:
            st, size = None, pos
        if st is not None and inode is not None and st.st_ino != inode:
            # rotation to a NEW file (rename+create): size alone can lie
            # if the replacement already grew past the old offset
            inode = st.st_ino
            pos = 0
            buf = b""
        elif size < pos:
            # in-place truncation: restart from the top
            pos = 0
            buf = b""
        if size > pos:
            # BINARY read: a poll may catch a multibyte character
            # mid-write; splitting on b"\n" first means only complete
            # lines are decoded (held-back partials finish later)
            with open(path, "rb") as f:
                f.seek(pos)
                chunk = f.read()
                pos = f.tell()
            buf += chunk
            lines = buf.split(b"\n")
            buf = lines.pop()  # partial tail (or b"" after a full line)
            if lines:
                idle = 0
                yield [x.decode("utf-8", errors="replace") for x in lines]
                continue
        idle += 1
        if idle_limit is not None and idle >= idle_limit:
            if buf:
                # flush the unterminated tail on shutdown
                yield [buf.decode("utf-8", errors="replace")]
            return
        sleep(poll_s)
