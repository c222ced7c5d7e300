"""Generic packed-IPC hash exchange for co-partitioned operations.

Generalizes the design the CDC lake proved out (cdc/lake.py
``_FragmentWriter``): map-side tasks write each input batch as ONE packed
Arrow-IPC file containing one record batch per hash bucket present, and
return tiny stats rows ``(bucket, rows, bytes, file, batch_idx)`` that
ARE the exchange index — the driver hands each reduce task exactly the
(file, batch) pairs for its buckets, so orphan files from retried tasks
are never even opened, and duplicate stats rows from a retried map task
are collapsed by the index builder. Measured 2-3x faster than Ray's
shuffle backends for this partition-keyed pattern locally (page cache);
on a real cluster the staging dir must live on shared storage — the same
documented assumption as the CDC lake exchange.

Scale story (the fix for the old fixed-32-bucket joins): the bucket
count is FINE (default 8x CPUs, up to 1024) so no single bucket
materializes a large fraction of the data, and reduce tasks are formed
by coalescing buckets by MEASURED bytes from the stage-1 stats — task
size tracks data size without a pre-pass, and a skewed hot bucket is
still isolated in its own task.
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import tempfile
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value

_EXCHANGE_ROOT_CANDIDATES = ("/dev/shm", tempfile.gettempdir())

#: env var naming a shared staging directory for multi-node clusters
ROOT_ENV = "TENZIR_RAY_EXCHANGE_ROOT"
#: env var selecting the transport: "fs" (packed-IPC files, default) or
#: "object" (Ray object store — no shared-filesystem requirement)
TRANSPORT_ENV = "TENZIR_RAY_EXCHANGE_TRANSPORT"


def default_transport() -> str:
    t = os.environ.get(TRANSPORT_ENV, "fs").strip().lower()
    if t not in ("fs", "object"):
        raise ValueError(f"{TRANSPORT_ENV} must be 'fs' or 'object', got {t!r}")
    return t


def exchange_root(staging_root: str | None = None) -> str:
    """Resolve the staging root: explicit argument > $TENZIR_RAY_EXCHANGE_ROOT
    > /dev/shm > tmpdir. The last two are NODE-LOCAL — fine single-node,
    rejected by :func:`new_staging` when the Ray cluster spans nodes."""
    override = staging_root or os.environ.get(ROOT_ENV)
    if override:
        root = os.path.join(override, "tenzir_ray_exchange")
        os.makedirs(root, exist_ok=True)
        return root
    for c in _EXCHANGE_ROOT_CANDIDATES:
        if os.path.isdir(c):
            root = os.path.join(c, "tenzir_ray_exchange")
            os.makedirs(root, exist_ok=True)
            return root
    raise RuntimeError("no writable temp dir for exchange staging")


def _assert_root_reachable(root: str, explicit: bool) -> None:
    """Fail fast (instead of a FileNotFoundError deep in a reduce task)
    when the cluster spans multiple nodes but staging would land on a
    known node-local path. An explicit root (argument or env var) is
    trusted — the operator is asserting it is shared storage."""
    if explicit:
        return
    try:
        import ray

        if not ray.is_initialized():
            return
        alive = [n for n in ray.nodes() if n.get("Alive")]
    except Exception:
        return
    if len(alive) > 1:
        raise RuntimeError(
            f"exchange staging root {root!r} is node-local but the Ray "
            f"cluster has {len(alive)} nodes; set {ROOT_ENV} (or pass "
            f"staging_root=) to a shared filesystem path, or select the "
            f"object-store transport ({TRANSPORT_ENV}=object / "
            f"transport='object')."
        )


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def _gc_old(root: str, max_age_s: float = 3600.0) -> None:
    """Best-effort cleanup of stale staging dirs from CRASHED runs only:
    a dir is removed when it is old AND its creating process is gone —
    a live driver may still hold lazy join datasets whose reduce tasks
    read these files at consumption time, and the root is shared
    machine-wide."""
    try:
        now = time.time()
        for d in os.listdir(root):
            p = os.path.join(root, d)
            parts = d.split("-")
            owner = int(parts[1]) if len(parts) >= 3 and parts[1].isdigit() else None
            if owner is not None and _pid_alive(owner):
                continue
            if now - os.path.getmtime(p) > max_age_s:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def new_staging(tag: str = "x", staging_root: str | None = None) -> str:
    explicit = bool(staging_root or os.environ.get(ROOT_ENV))
    root = exchange_root(staging_root)
    _assert_root_reachable(root, explicit)
    _gc_old(root)
    d = os.path.join(root, f"{tag}-{os.getpid()}-{uuid.uuid4().hex[:12]}")
    os.makedirs(d, exist_ok=True)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def default_buckets() -> int:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return min(1024, max(32, 8 * cpus))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain construction) — uniform bucket
    assignment from integer keys; numpy uint64 arithmetic wraps mod 2^64."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def key_buckets(batch: pa.Table, keys: list[str], num_buckets: int) -> np.ndarray:
    """Deterministic bucket per key tuple, agreeing across physically
    different but logically equal columns: integer families are widened
    to int64 before mixing (null slots are filled typed BEFORE any numpy
    conversion — a null in the batch must never push int keys through a
    lossy float64 path); strings/other types hash their dictionary
    uniques once (pandas siphash, fixed key) and broadcast via codes.
    Null keys hash to bucket value 0-slot deterministically on both
    sides; -0.0 normalizes to 0.0 so equal-under-join float keys meet."""
    import pyarrow.compute as pc

    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        col = batch.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_integer(t):
            if t == pa.uint64():
                # values above int64 max are legal uint64 keys (e.g.
                # 64-bit content hashes) — bitcast, don't value-cast
                filled = pc.fill_null(col, 0).cast(pa.uint64())
                vals = filled.to_numpy(zero_copy_only=False)
                hk = _mix64(vals)
            else:
                filled = pc.fill_null(col.cast(pa.int64()), 0)
                vals = filled.to_numpy(zero_copy_only=False)
                hk = _mix64(vals.astype(np.uint64))
        elif pa.types.is_floating(t):
            filled = pc.fill_null(col.cast(pa.float64()), 0.0)
            vals = filled.to_numpy(zero_copy_only=False)
            vals = vals + 0.0  # -0.0 → +0.0 (copy; never mutate the buffer)
            hk = _mix64(vals.view(np.uint64))
        elif pa.types.is_timestamp(t):
            filled = pc.fill_null(col.cast(pa.int64()), 0)
            vals = filled.to_numpy(zero_copy_only=False)
            hk = _mix64(vals.astype(np.uint64))
        else:
            d = col.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            uh = pd.util.hash_array(
                np.asarray(d.dictionary.to_pylist(), dtype=object)
            ).astype(np.uint64)
            ind = pc.fill_null(d.indices, 0) if d.null_count else d.indices
            codes = ind.to_numpy(zero_copy_only=False).astype(np.int64)
            hk = uh[codes] if len(uh) else np.zeros(batch.num_rows, np.uint64)
            if d.null_count:
                null_mask = pc.is_null(d.indices).to_numpy(zero_copy_only=False)
                hk = hk.copy()
                hk[null_mask] = np.uint64(0)
        # asymmetric combine: a plain XOR collapses any row where two key
        # columns hold equal values (h^h==0) into one hot bucket — e.g.
        # by=["src","dst"] traffic with src==dst. Re-finalizing the
        # running hash before mixing in the next column breaks the
        # symmetry while staying deterministic across exchange sides.
        h = _mix64(h ^ hk)
    return (h % np.uint64(num_buckets)).astype(np.int64)


class ExchangeWriter:
    """Stage-1 map task: bucket the batch by key hash, write ONE packed
    Arrow-IPC file (one record batch per bucket present), emit the
    stats/index rows. ``transform`` optionally rewrites the batch first
    (e.g. column renames) so the exchange carries the final schema."""

    def __init__(self, staging: str, keys: list[str], num_buckets: int,
                 side: str, transform=None):
        self.staging = staging
        self.keys = keys
        self.num_buckets = num_buckets
        self.side = side
        self.transform = transform

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.transform is not None:
            batch = self.transform(batch)
        stats_bucket, stats_rows, stats_bytes, stats_file, stats_bidx = (
            [], [], [], [], [],
        )
        if batch.num_rows:
            bucket = key_buckets(batch, self.keys, self.num_buckets)
            order = np.argsort(bucket, kind="stable")
            sb = bucket[order]
            bounds = np.r_[np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]]), len(sb)]
            body = batch.take(pa.array(order)).combine_chunks()
            rel = f"{self.side}-packed-{uuid.uuid4().hex[:12]}.arrow"
            tmp = os.path.join(self.staging, rel + ".tmp")
            # uncompressed on purpose: transient files on tmpfs/page cache
            with pa.OSFile(tmp, "wb") as sink:
                with pa.ipc.new_file(sink, body.schema) as w:
                    for bidx in range(len(bounds) - 1):
                        lo, hi = int(bounds[bidx]), int(bounds[bidx + 1])
                        piece = body.slice(lo, hi - lo)
                        w.write_table(piece, max_chunksize=hi - lo)
                        stats_bucket.append(int(sb[lo]))
                        stats_rows.append(hi - lo)
                        stats_bytes.append(piece.nbytes)
                        stats_file.append(rel)
                        stats_bidx.append(bidx)
            os.replace(tmp, os.path.join(self.staging, rel))
        return pa.table(
            {
                "bucket": pa.array(stats_bucket, pa.int32()),
                "rows": pa.array(stats_rows, pa.int64()),
                "bytes": pa.array(stats_bytes, pa.int64()),
                "file": pa.array(stats_file, pa.string()),
                "batch_idx": pa.array(stats_bidx, pa.int32()),
            }
        )


def run_exchange(ds, keys: list[str], num_buckets: int, staging: str,
                 side: str, transform=None,
                 batch_size: int | None = 65536):
    """Execute stage 1 for one side. Returns
    ``(index: dict[bucket -> list[(file, batch_idx)]], bytes_per_bucket)``.
    The ``to_pandas`` here is the exchange barrier — the stats are tiny
    (one row per (input batch, bucket) pair)."""
    stats = ds.map_batches(
        ExchangeWriter(staging, keys, num_buckets, side, transform),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()
    index: dict[int, list] = {}
    nbytes: dict[int, int] = {}
    if "bucket" not in stats.columns:
        # a zero-block input side (e.g. joining against an empty
        # Dataset) yields an empty stats frame WITHOUT columns — Ray
        # drops the schema of all-empty datasets in to_pandas
        return index, nbytes
    for b, f, i, by in zip(
        stats["bucket"], stats["file"], stats["batch_idx"], stats["bytes"]
    ):
        index.setdefault(int(b), []).append((f, int(i)))
        nbytes[int(b)] = nbytes.get(int(b), 0) + int(by)
    return index, nbytes


def read_bucket(staging: str, index: dict[int, list], buckets: list[int],
                schema: pa.Schema) -> pa.Table:
    """Reduce-side read of the given buckets' record batches (grouped per
    file so each packed file opens once)."""
    by_file: dict[str, list[int]] = {}
    for b in buckets:
        for rel, bidx in index.get(b, ()):
            by_file.setdefault(rel, []).append(bidx)
    batches = []
    for rel, idxs in by_file.items():
        # memory-map: zero-copy from the page cache (the reduce side of
        # the exchange otherwise read()-copies every tiny batch slice)
        with pa.memory_map(os.path.join(staging, rel), "rb") as f:
            reader = pa.ipc.open_file(f)
            for i in sorted(set(idxs)):
                batches.append(reader.get_batch(i))
    if not batches:
        return schema.empty_table()
    return pa.Table.from_batches(batches)


def coalesce_tasks(bucket_ids: list[int], nbytes: dict[int, int],
                   target_bytes: int = 128 << 20) -> list[list[int]]:
    """Pack buckets into reduce tasks of ~target_bytes by measured size
    (first-fit over the sorted list); an oversized hot bucket still gets
    a task of its own — skew is isolated, never merged."""
    tasks: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for b in sorted(bucket_ids):
        sz = nbytes.get(b, 0)
        if cur and cur_bytes + sz > target_bytes:
            tasks.append(cur)
            cur, cur_bytes = [], 0
        cur.append(b)
        cur_bytes += sz
    if cur:
        tasks.append(cur)
    return tasks


# --------------------------------------------------------------------------
# Object-store transport: the same exchange contract (per-bucket index +
# measured bytes) carried over Ray's shared object store instead of a
# staging filesystem. For clusters without fast shared POSIX storage —
# plasma handles node-to-node transfer and spilling. Map outputs are
# owned by the driver (returned from tasks, lineage-reconstructable);
# reduce readers borrow the refs via closure capture, which Ray
# reference-counts, so blocks live exactly as long as the join Dataset.
# --------------------------------------------------------------------------


def pack_by_partition(block: pa.Table, part_ids: np.ndarray, n: int,
                      drop: list[str] | None = None) -> list:
    """Slice one block by a per-row partition id array; returns
    ``[stats_dict, tbl_p0, ..., tbl_p{n-1}]`` — the shared packing
    kernel behind the object-store exchange AND the CDC lake's apply
    path (stable argsort, boundary flatnonzero, per-slice
    combine_chunks, (rows, nbytes) stats). Empty partitions return None
    (tiny objects; reduce skips them via the stats-driven index)."""
    outs: list = [None] * n
    stats: dict[int, tuple[int, int]] = {}
    if len(part_ids):
        order = np.argsort(part_ids, kind="stable")
        sp = part_ids[order]
        bounds = np.r_[np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]]), len(sp)]
        body = block.take(pa.array(order))
        if drop:
            body = body.drop_columns(drop)
        body = body.combine_chunks()
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            piece = body.slice(lo, hi - lo).combine_chunks()
            p = int(sp[lo])
            outs[p] = piece
            stats[p] = (hi - lo, piece.nbytes)
    return [stats] + outs


#: bucket-space segments per map task in the object transport — the
#: object-count / over-fetch dial: per task ``_OBJ_SEGMENTS + 1``
#: plasma objects (vs the old num_buckets+1, whose per-object overhead
#: measured ~2x vs fs), and a reduce task fetching one bucket pulls at
#: most ~1/_OBJ_SEGMENTS of a body cross-node (vs the whole body for a
#: single-body layout).
_OBJ_SEGMENTS = 16


def _pack_block_sorted(block: pa.Table, keys: list[str], num_buckets: int,
                       transform) -> list:
    """Pack one input block for the object transport: ``_OBJ_SEGMENTS``
    bucket-sorted SEGMENT tables + a stats dict
    ``{bucket: (segment, row_start_in_segment, rows, bytes_est)}``.

    Buckets map to segments by range (``bucket * S // num_buckets``),
    so coalesce_tasks' contiguous bucket ranges touch few segments.
    Arrow tables read back ZERO-COPY from plasma and bucket rows are
    zero-copy slices of their segment, so a local reduce touches only
    pointers; cross-node a reducer transfers only the overlapping
    segments (bounded over-fetch)."""
    if transform is not None:
        block = transform(block)
    S = _OBJ_SEGMENTS
    if not block.num_rows:
        return [{}] + [None] * S
    part_ids = key_buckets(block, keys, num_buckets)
    order = np.argsort(part_ids, kind="stable")
    sp = part_ids[order]
    bounds = np.r_[np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]]), len(sp)]
    body = block.take(pa.array(order)).combine_chunks()
    per_row = body.nbytes / max(1, body.num_rows)
    seg_of = (sp[bounds[:-1]].astype(np.int64) * S) // num_buckets
    # segment row ranges over the sorted body
    seg_lo: dict[int, int] = {}
    seg_hi: dict[int, int] = {}
    stats: dict[int, tuple[int, int, int, int]] = {}
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        s = int(seg_of[i])
        if s not in seg_lo:
            seg_lo[s] = lo
        seg_hi[s] = hi
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        s = int(seg_of[i])
        stats[int(sp[lo])] = (s, lo - seg_lo[s], hi - lo,
                              int(per_row * (hi - lo)))
    segs: list = [None] * S
    for s, lo in seg_lo.items():
        segs[s] = body.slice(lo, seg_hi[s] - lo)
    return [stats] + segs


def run_exchange_obj(ds, keys: list[str], num_buckets: int, side: str,
                     transform=None, batch_size: int | None = 65536):
    """Stage 1 over the object store. Returns
    ``(index: dict[bucket -> list[(segment_ref, row_start, rows)]],
    bytes_per_bucket)``. ``side`` is accepted for interface parity with
    :func:`run_exchange`."""
    import ray

    del side  # no per-side namespace needed: refs are already unique
    if batch_size is not None:
        # to_arrow_refs() yields one ref per BLOCK; honor the requested
        # granularity so pack tasks see comparable batch sizes
        ds = ds.map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=batch_size
        )
    block_refs = ds.to_arrow_refs()
    pack = ray.remote(_pack_block_sorted)
    outs = [
        pack.options(num_returns=_OBJ_SEGMENTS + 1).remote(
            br, keys, num_buckets, transform
        )
        for br in block_refs
    ]
    index: dict[int, list] = {}
    nbytes: dict[int, int] = {}
    # ONE batched get for every task's stats object — a per-task ray.get
    # loop serializes the driver behind len(outs) sequential round-trips
    all_stats = ray.get([refs[0] for refs in outs])
    for refs, stats in zip(outs, all_stats):
        for b, (seg, start, rows, by) in stats.items():
            index.setdefault(int(b), []).append(
                (refs[1 + int(seg)], int(start), int(rows)))
            nbytes[int(b)] = nbytes.get(int(b), 0) + int(by)
    return index, nbytes


def read_bucket_obj(index: dict[int, list], buckets: list[int],
                    schema: pa.Schema) -> pa.Table:
    """Reduce-side fetch of the given buckets' rows: one batched
    ray.get of the UNIQUE body tables (plasma zero-copies locally),
    then zero-copy row-range slices per bucket."""
    import ray

    entries = [(r, s, n) for b in buckets for (r, s, n) in index.get(b, ())]
    if not entries:
        return schema.empty_table()
    uniq: dict = {}
    for r, _s, _n in entries:
        uniq.setdefault(r.hex() if hasattr(r, "hex") else id(r), r)
    got = dict(zip(uniq.keys(), ray.get(list(uniq.values()))))
    parts = []
    for r, s, n in entries:
        body = got[r.hex() if hasattr(r, "hex") else id(r)]
        if body is not None and n:
            parts.append(body.slice(s, n))
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts, promote_options="none")


class Exchange:
    """Transport-selecting facade used by join/asof/grouped_apply:
    ``transport`` is "fs" (packed-IPC staging files; needs shared
    storage multi-node) or "object" (Ray object store — works on any
    cluster). Since the bucket-sorted segmented packing
    (:func:`_pack_block_sorted`) the two are at PARITY single-node
    (measured 8M-row join @32 cpus, same window: object 3.3-4.1 s vs
    fs 3.9-4.1 s; was object ~2x slower with per-bucket objects) —
    prefer "object" on clusters without fast shared POSIX storage.
    Defaults to $TENZIR_RAY_EXCHANGE_TRANSPORT or "fs"."""

    def __init__(self, tag: str, transport: str | None = None,
                 staging_root: str | None = None):
        self.transport = transport or default_transport()
        if self.transport not in ("fs", "object"):
            raise ValueError(f"unknown exchange transport {self.transport!r}")
        self.staging = (
            new_staging(tag, staging_root) if self.transport == "fs" else None
        )

    def run(self, ds, keys, num_buckets, side, transform=None,
            batch_size: int | None = 65536):
        if self.transport == "fs":
            return run_exchange(
                ds, keys, num_buckets, self.staging, side,
                transform=transform, batch_size=batch_size,
            )
        return run_exchange_obj(
            ds, keys, num_buckets, side, transform=transform,
            batch_size=batch_size,
        )

    def reader(self, index, schema: pa.Schema):
        """A picklable callable (buckets) -> pa.Table for reduce tasks.
        Object-store refs ride in the closure — Ray's closure-capture
        reference counting keeps them alive for the reader's lifetime."""
        if self.transport == "fs":
            staging = self.staging

            def read_fs(buckets: list[int]) -> pa.Table:
                return read_bucket(staging, index, buckets, schema)

            return read_fs

        def read_obj(buckets: list[int]) -> pa.Table:
            return read_bucket_obj(index, buckets, schema)

        return read_obj


class _GroupedApplyReducer:
    """Reduce task for :func:`grouped_apply`: read this task's WHOLE
    buckets and run ``fn`` once over their concatenation. Groups never
    split across buckets, so any per-group computation inside ``fn``
    stays exact when several complete buckets share a task."""

    def __init__(self, read, fn, fmt: str):
        self.read = read
        self.fn = fn
        self.fmt = fmt

    __name__ = "_GroupedApplyReducer"

    def __call__(self, batch: pa.Table):
        buckets = [int(x) for x in batch.column("buckets").to_pylist()[0]]
        tbl = self.read(buckets)
        if self.fmt == "pandas":
            return self.fn(tbl.to_pandas())
        return self.fn(tbl)


def grouped_apply(ds, keys, fn, *, num_buckets: int | None = None,
                  target_task_bytes: int = 128 << 20,
                  batch_size: int | None = 65536,
                  transport: str | None = None,
                  staging_root: str | None = None,
                  fn_format: str = "pandas", tag: str = "group"):
    """Exchange-backed high-cardinality grouped apply: hash-partition by
    ``keys`` (None = ALL columns, full-row key) into fine buckets
    (default 8x cluster CPUs, up to 1024), then run ``fn`` once per
    reduce task over whole buckets coalesced by MEASURED bytes.

    This is the scale-proof replacement for the old fixed-64-bucket
    ``groupby("_b").map_groups`` family (VERDICT r3 #1): parallelism
    tracks the cluster instead of a constant, per-task input is bounded
    by ``target_task_bytes`` from real stage-1 stats, and a skewed hot
    bucket still gets a task of its own."""
    import ray.data

    from tenzir_ray.stages.join import _dataset_arrow_schema

    schema = _dataset_arrow_schema(ds)
    kcols = (list(schema.names) if keys is None
             else [keys] if isinstance(keys, str) else list(keys))
    B = num_buckets or default_buckets()
    ex = Exchange(tag, transport, staging_root)
    idx, nbytes = ex.run(ds, kcols, B, "g", batch_size=batch_size)
    tasks = coalesce_tasks(list(idx), nbytes, target_task_bytes)
    reducer = _GroupedApplyReducer(ex.reader(idx, schema), fn, fn_format)
    if not tasks:
        # empty input: one driver-side call on the empty table fixes the
        # OUTPUT schema (fn may aggregate/rename). Ray drops the schema
        # of all-empty pandas-stage outputs, so fn may see a column-less
        # frame and fail — fall back to an empty Dataset then (the old
        # map_groups path returned exactly that).
        try:
            empty = reducer(
                pa.table({"buckets": pa.array([[]], pa.list_(pa.int64()))})
            )
        except Exception:
            return ds.limit(0)
        if isinstance(empty, pa.Table):
            return ray.data.from_arrow(empty)
        return ray.data.from_pandas(empty)
    return ray.data.from_items(
        [{"buckets": t} for t in tasks]
    ).map_batches(reducer, batch_format="pyarrow", batch_size=1)


ship_by_value(sys.modules[__name__])
