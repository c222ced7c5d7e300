"""``python -m tenzir_ray.lake_admin`` — lake-table maintenance CLI for
``ray job submit``: the operational verbs a table owner runs against a
live lake (the reference's `rebuild` / disk-monitor / `show` admin
surface, re-expressed for the Parquet lake).

    python -m tenzir_ray.lake_admin <root> show
    python -m tenzir_ray.lake_admin <root> metrics
    python -m tenzir_ray.lake_admin <root> optimize [--zorder col,col]
    python -m tenzir_ray.lake_admin <root> gc [--min-age-s 3600]
    python -m tenzir_ray.lake_admin <root> lookup <conv_id>
    python -m tenzir_ray.lake_admin <root> search <term> [--column text]
    python -m tenzir_ray.lake_admin <root> restore <as_of>
    python -m tenzir_ray.lake_admin <root> expire "<filter expr>"
    python -m tenzir_ray.lake_admin <root> reshard <dest> <num_partitions>
    python -m tenzir_ray.lake_admin <root> clone <dest>
    python -m tenzir_ray.lake_admin <root> truncate-lineage [--keep 100]

Every command prints ONE JSON line to stdout (machine-readable job
result); row-returning commands (lookup/search) add a bounded ``rows``
preview (``--limit``, default 20) rather than streaming the table
through the driver.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _summary(lake) -> dict:
    m = lake.manifest
    parts = m.partitions
    return {
        "root": lake.root,
        "num_partitions": lake.num_partitions,
        "live_rows": int(sum((p.get("rows", 0) or 0) for p in parts.values())),
        "delta_rows": int(sum((p.get("delta_rows", 0) or 0)
                              for p in parts.values())),
        "tombstones": int(sum((p.get("tombstones", 0) or 0)
                              for p in parts.values())),
        "files": int(sum(len(p.get("files", [])) for p in parts.values())),
        "epochs": len(m.epochs),
        "resume_lsn": lake.resume_lsn(),
        "schema": (list(lake.registry.schema.names)
                   if lake.registry.schema is not None else None),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m tenzir_ray.lake_admin")
    ap.add_argument("root", help="lake table root")
    ap.add_argument("command",
                    choices=["show", "metrics", "optimize", "gc", "lookup",
                             "search", "restore", "expire", "reshard",
                             "clone", "truncate-lineage"])
    ap.add_argument("args", nargs="*", help="command operands")
    ap.add_argument("--column", default="text")
    ap.add_argument("--zorder", default=None,
                    help="comma-separated cluster columns for optimize")
    ap.add_argument("--min-age-s", type=float, default=0.0)
    ap.add_argument("--keep", type=int, default=100)
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from tenzir_ray._cli import init_ray

    init_ray(args.num_cpus)

    from tenzir_ray.cdc import LakeTable

    lake = LakeTable(args.root)
    t0 = time.monotonic()
    cmd = args.command
    out: dict = {"command": cmd, "root": args.root}

    def _need(n: int, usage: str):
        if len(args.args) < n:
            ap.error(f"{cmd} needs {usage}")

    if cmd == "show":
        out.update(_summary(lake))
    elif cmd == "metrics":
        rows = lake.metrics().take_all()
        out["epochs"] = rows[-args.limit:]
    elif cmd == "optimize":
        cluster_by = args.zorder.split(",") if args.zorder else None
        n = lake.optimize(cluster_by=cluster_by) if cluster_by \
            else lake.optimize()
        out["partitions_compacted"] = n
    elif cmd == "gc":
        out.update(lake.gc(min_age_s=args.min_age_s))
    elif cmd == "lookup":
        _need(1, "a conv_id")
        tbl = lake.lookup(args.args[0])
        out["rows_total"] = tbl.num_rows
        out["pruned_files"] = lake._last_lookup_pruned
        out["rows"] = tbl.slice(0, args.limit).to_pylist()
    elif cmd == "search":
        _need(1, "a term")
        ds = lake.search(args.args[0], column=args.column)
        preview = ds.limit(args.limit).take_all()
        out["pruned_partitions"] = lake._last_search_pruned
        out["rows"] = preview
        out["rows_preview_limit"] = args.limit
    elif cmd == "restore":
        _need(1, "an epoch id or index")
        as_of: "str | int" = args.args[0]
        if as_of.lstrip("-").isdigit():
            as_of = int(as_of)
        out.update(lake.restore(as_of))
    elif cmd == "expire":
        _need(1, "a filter expression")
        out.update(lake.expire(args.args[0]))
    elif cmd == "reshard":
        _need(2, "<dest_root> <num_partitions>")
        dest = lake.reshard(args.args[0], int(args.args[1]))
        out["dest"] = _summary(dest)
    elif cmd == "clone":
        _need(1, "a dest root")
        dest = lake.clone(args.args[0])
        out["dest"] = _summary(dest)
    elif cmd == "truncate-lineage":
        out["epochs_dropped"] = lake.truncate_lineage(keep_epochs=args.keep)

    out["seconds"] = round(time.monotonic() - t0, 3)
    sys.stdout.write(json.dumps(out, default=str) + "\n")
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    rc = main()
    import ray

    if ray.is_initialized():
        ray.shutdown()
    sys.exit(rc)
