"""Write sinks (the reference's printers: json.cpp printer ~NDJSON,
xsv.cpp:~400 csv printer, feather.cpp IPC writer, parquet store).

All sinks write a DIRECTORY of part files (one per block/task) — the
resumable-output layout: a failed run can re-write only missing parts,
and no sink ever produces one giant file. csv/json ride Ray's native
distributed writers; feather adds the missing IPC sink as a map_batches
stage (uuid part names + write-then-rename, the lake's discipline).
"""

from __future__ import annotations

import os
import sys
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from tenzir_ray._ship import ship_by_value


def write_parquet(ds, path: str, **kw):
    return ds.write_parquet(path, **kw)


def write_csv(ds, path: str, **kw):
    """CSV printer (reference xsv.cpp printer)."""
    return ds.write_csv(path, **kw)


def write_json(ds, path: str, **kw):
    """NDJSON printer (reference json.cpp printer — one JSON object per
    line)."""
    return ds.write_json(path, **kw)


def _delim_args_fn(delim: str):
    # WriteOptions is not picklable — build it ON the worker
    def f():
        import pyarrow.csv as pacsv

        return {"write_options": pacsv.WriteOptions(delimiter=delim)}

    return f


def write_tsv(ds, path: str, **kw):
    """TSV printer (reference xsv.cpp `tsv` alias)."""
    return ds.write_csv(path, arrow_csv_args_fn=_delim_args_fn("\t"), **kw)


def write_ssv(ds, path: str, **kw):
    """Space-separated printer (reference xsv.cpp `ssv` alias)."""
    return ds.write_csv(path, arrow_csv_args_fn=_delim_args_fn(" "), **kw)


class _FeatherWriter:
    def __init__(self, path: str, compression: str):
        self.path = path
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.feather as feather

        rel = f"part-{uuid.uuid4().hex[:12]}.feather"
        dest = os.path.join(self.path, rel)
        tmp = dest + ".tmp"
        feather.write_feather(batch, tmp, compression=self.compression)
        os.replace(tmp, dest)
        return pa.table(
            {"path": pa.array([rel]), "rows": pa.array([batch.num_rows], pa.int64())}
        )


def write_feather(ds, path: str, compression: str = "lz4",
                  batch_size: int | None = None):
    """Arrow IPC / Feather sink (reference feather.cpp printer + store).
    Executes eagerly (like Ray's write_*); returns per-file stats."""
    os.makedirs(path, exist_ok=True)
    stats = ds.map_batches(
        _FeatherWriter(path, compression),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()
    return stats


class _OrcWriter:
    def __init__(self, path: str, compression: str):
        self.path = path
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        rel = f"part-{uuid.uuid4().hex[:12]}.orc"
        dest = os.path.join(self.path, rel)
        tmp = dest + ".tmp"
        orc.write_table(batch, tmp, compression=self.compression)
        os.replace(tmp, dest)
        return pa.table(
            {"path": pa.array([rel]), "rows": pa.array([batch.num_rows], pa.int64())}
        )


def write_orc(ds, path: str, compression: str = "zstd",
              batch_size: int | None = None):
    """ORC sink (companion to :func:`~tenzir_ray.sources.readers.read_orc`).
    Executes eagerly (like Ray's write_*); returns per-file stats."""
    os.makedirs(path, exist_ok=True)
    return ds.map_batches(
        _OrcWriter(path, compression),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()


class _BitzWriter:
    def __init__(self, path: str):
        self.path = path

    def __call__(self, batch: pa.Table) -> pa.Table:
        rel = f"part-{uuid.uuid4().hex[:12]}.bitz"
        dest = os.path.join(self.path, rel)
        tmp = dest + ".tmp"
        # length-prefixed Arrow IPC stream messages (the reference's
        # `bitz` wire format, formats/bitz.cpp: 64-bit LE frame length
        # followed by one IPC stream per frame)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_table(batch)
        payload = sink.getvalue().to_pybytes()
        with open(tmp, "wb") as f:
            f.write(len(payload).to_bytes(8, "little"))
            f.write(payload)
        os.replace(tmp, dest)
        return pa.table(
            {"path": pa.array([rel]), "rows": pa.array([batch.num_rows], pa.int64())}
        )


def write_bitz(ds, path: str, batch_size: int | None = None):
    """Length-prefixed Arrow-IPC wire sink (reference formats/bitz.cpp);
    one frame per block, directory-of-parts layout."""
    os.makedirs(path, exist_ok=True)
    return ds.map_batches(
        _BitzWriter(path), batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()


def read_bitz(paths: "str | list[str]"):
    """Read length-prefixed Arrow-IPC frames back into a Dataset
    (one read task per file; a file may hold many frames)."""
    import ray.data

    paths = [paths] if isinstance(paths, str) else list(paths)

    def _load(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                while True:
                    hdr = f.read(8)
                    if not hdr:
                        break  # clean end of file
                    if len(hdr) < 8:
                        raise ValueError(f"truncated bitz frame header in {p}")
                    n = int.from_bytes(hdr, "little")
                    payload = f.read(n)
                    if len(payload) < n:
                        raise ValueError(f"truncated bitz frame body in {p}")
                    with pa.ipc.open_stream(pa.BufferReader(payload)) as r:
                        tables.append(r.read_all())
        if not tables:
            return pa.table({})  # all listed files were empty
        return pa.concat_tables(tables, promote_options="permissive")

    return ray.data.from_items([{"path": p} for p in paths]).map_batches(
        _load, batch_format="pyarrow", batch_size=1
    )


def write_lines(ds, path: str, column: str = "text"):
    """`lines` printer (reference formats/lines.cpp print side): one
    text line per event, one file per block — the inverse of
    ``read_lines``."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)

    def _dump(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            p = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.txt")
            col = batch.column(column).cast(pa.string()).to_pylist()
            with open(p, "w") as f:
                f.write("\n".join("" if v is None else v for v in col) + "\n")
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(_dump, batch_format="pyarrow").to_pandas()
    return path


def write_yaml(ds, path: str, batch_size: int = 8192):
    """YAML printer (reference formats/yaml.cpp print side): a stream of
    ``---``-separated documents, one per event, one file per batch."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)

    def _dump(batch: pa.Table) -> pa.Table:
        import yaml

        if batch.num_rows:
            p = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.yaml")
            with open(p, "w") as f:
                yaml.safe_dump_all(batch.to_pylist(), f, sort_keys=False,
                                   default_flow_style=False)
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(_dump, batch_format="pyarrow", batch_size=batch_size
                   ).to_pandas()
    return path


def read_stdin(lines: bool = True, stream=None):
    """`stdin` connector (reference connectors/stdin — the `-` source):
    read standard input to EOF on the driver, one ``text`` row per line
    (or a single blob row). Interactive byte streams are inherently
    driver-side; pipe-fed batch use is what this supports. ``stream``
    is injectable for tests."""
    import sys as _s

    import ray.data

    stream = stream if stream is not None else _s.stdin
    data = stream.read()
    if lines:
        rows = [{"text": ln} for ln in data.splitlines()]
    else:
        rows = [{"text": data}] if data else []
    if not rows:
        return ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    return ray.data.from_items(rows)


class _PartitionedWriter:
    """map_batches stage: split the batch by the partition column and
    write one parquet file per (batch, value) with write-then-rename;
    the emitted stats rows are the PENDING manifest entries — only files
    recorded by successful tasks get committed, so orphans from retried
    tasks are never visible to readers."""

    def __init__(self, root: str, by: str, compression: str, level: int):
        self.root = root
        self.by = by
        self.compression = compression
        self.level = level

    def __call__(self, batch: pa.Table) -> pa.Table:
        import uuid

        import numpy as np

        files, values, rows = [], [], []
        if batch.num_rows:
            col = batch.column(self.by)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            # nulls partition into an explicit __null__ directory (the
            # hive default-partition convention) instead of poisoning
            # the dictionary codes with a null index
            if col.null_count:
                import pyarrow.compute as _pc

                col = _pc.fill_null(col.cast(pa.string()), "__null__")
            d = col.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = d.dictionary.to_pylist()
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            bounds = np.r_[np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]]),
                           len(sc)]
            sorted_tbl = batch.take(pa.array(order))
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                v = vals[int(sc[lo])]
                if os.sep in str(v) or (os.altsep and os.altsep in str(v)):
                    raise ValueError(
                        f"write_parquet_partitioned: partition value {v!r} "
                        "contains a path separator — derive a sanitized "
                        "partition column first"
                    )
                vdir = os.path.join(self.root, f"{self.by}={v}")
                os.makedirs(vdir, exist_ok=True)
                rel = os.path.join(
                    f"{self.by}={v}", f"part-{uuid.uuid4().hex[:12]}.parquet"
                )
                path = os.path.join(self.root, rel)
                pq.write_table(
                    sorted_tbl.slice(lo, hi - lo), path + ".tmp",
                    compression=self.compression,
                    compression_level=self.level,
                )
                os.replace(path + ".tmp", path)
                files.append(rel)
                values.append(str(v))
                rows.append(hi - lo)
        return pa.table({
            "file": pa.array(files, pa.string()),
            "value": pa.array(values, pa.string()),
            "rows": pa.array(rows, pa.int64()),
        })


def write_parquet_partitioned(ds, root: str, by: str, resume: bool = True,
                              compression: str = "zstd",
                              compression_level: int = 1) -> dict:
    """Resumable partitioned parquet sink (the 100 TB output contract:
    never one giant file, and a re-run after failure skips finished
    work). Rows land under ``root/<by>=<value>/part-*.parquet``; a
    root-level ``_manifest.json`` commits atomically (write-then-rename)
    AFTER every task succeeded, listing exactly the files written by
    successful attempts — crashed/retried tasks leave orphans that
    readers (:func:`read_parquet_partitioned`) never open. ``resume``:
    an already-committed root returns its manifest immediately (the
    job-level idempotence gate — the lake's epoch-skip analog,
    cdc/lake.py apply_changes). ``by`` should be low-cardinality (a
    date, shard id, key range): one file per (block, value)."""
    import json

    man_path = os.path.join(root, "_manifest.json")
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    os.makedirs(root, exist_ok=True)
    stats = ds.map_batches(
        _PartitionedWriter(root, by, compression, compression_level),
        batch_format="pyarrow",
    ).to_pandas()  # barrier: all files durable before the commit
    if "file" not in stats.columns:
        # zero-block input: Ray drops the schema of all-empty datasets
        # in to_pandas — still commit an EMPTY manifest so the resume
        # contract and read_parquet_partitioned hold for empty outputs
        import pandas as _pd

        stats = _pd.DataFrame({"file": [], "value": [], "rows": []})
    by_val: dict[str, dict] = {}
    for f_, v, r in zip(stats["file"], stats["value"], stats["rows"]):
        e = by_val.setdefault(v, {"files": [], "rows": 0})
        e["files"].append(f_)
        e["rows"] += int(r)
    manifest = {"by": by, "partitions": by_val,
                "rows": int(stats["rows"].sum()) if len(stats) else 0}
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)
    return manifest


def read_parquet_partitioned(root: str, values: "list | None" = None,
                             **kw):
    """Manifest-gated reader for :func:`write_parquet_partitioned`
    output: opens ONLY committed files (orphans invisible), and prunes
    whole partition directories when ``values`` is given — probe cost
    tracks the partitions touched, not the table size."""
    import json

    import ray.data

    with open(os.path.join(root, "_manifest.json")) as f:
        manifest = json.load(f)
    want = None if values is None else {str(v) for v in values}
    paths = [
        os.path.join(root, rel)
        for v, e in manifest["partitions"].items()
        if want is None or v in want
        for rel in e["files"]
    ]
    if not paths:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(paths, **kw)


ship_by_value(sys.modules[__name__])
