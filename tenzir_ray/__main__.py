"""``python -m tenzir_ray "<pipeline>"`` — the reference's ``tenzir
"<pipeline>"`` executable analog (reference tenzir/tenzir.cpp: parse →
run → print NDJSON to stdout). Owns its Ray session (library code never
calls ray.init); results stream to stdout batch-by-batch, so a pipeline
ending in a sink op prints only that sink's stats.

    python -m tenzir_ray 'read_parquet "t.parquet" | where x > 3 | head 5'
    python -m tenzir_ray --tql2 'from "t.parquet"\nwhere x > 3'
    python -m tenzir_ray --explain 'read_parquet "t.parquet" | where x > 3'
"""

from __future__ import annotations

import argparse
import sys


from tenzir_ray._cli import init_ray


def _print_dataset(ds, fmt: str, limit: int | None) -> None:
    import pandas as pd
    import pyarrow as pa

    from tenzir_ray.stages.transforms import print_ndjson

    if isinstance(ds, pd.DataFrame):
        ds = pa.Table.from_pandas(ds, preserve_index=False)
    if isinstance(ds, pa.Table):
        import ray.data

        ds = ray.data.from_arrow(ds.replace_schema_metadata(None))
    if limit is not None:
        ds = ds.limit(limit)
    if fmt == "ndjson":
        for batch in print_ndjson(ds).iter_batches(batch_format="pyarrow"):
            for line in batch.column("text").to_pylist():
                sys.stdout.write(line + "\n")
    elif fmt == "csv":
        import io

        import pyarrow.csv as pacsv

        first = True
        for batch in ds.iter_batches(batch_format="pyarrow"):
            buf = io.BytesIO()
            pacsv.write_csv(
                batch, buf,
                write_options=pacsv.WriteOptions(include_header=first))
            sys.stdout.write(buf.getvalue().decode())
            first = False
    else:  # table
        sys.stdout.write(repr(ds.to_pandas()) + "\n")
    sys.stdout.flush()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m tenzir_ray",
        description="Run a TQL pipeline string (the `tenzir` CLI analog).")
    ap.add_argument("pipeline", nargs="?", default=None,
                    help="pipeline string, ops joined by |")
    ap.add_argument("--show", metavar="ASPECT", nargs="?", default=None,
                    const="", help="print an introspection aspect "
                         "(operators, aggregations, version, …) instead "
                         "of running a pipeline; bare --show prints all "
                         "aspects")
    ap.add_argument("--tql2", action="store_true",
                    help="parse with the TQL2-flavored front-end")
    ap.add_argument("--explain", action="store_true",
                    help="print the parsed + optimized plan, do not run")
    ap.add_argument("--format", choices=("ndjson", "csv", "table"),
                    default="ndjson")
    ap.add_argument("--limit", type=int, default=None,
                    help="cap printed rows (sinks inside the pipeline are "
                         "unaffected)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if args.show is not None:
        import json

        from tenzir_ray.pipelines.pipeline import show

        try:
            aspect = show(args.show or None)
        except (KeyError, ValueError) as e:
            ap.error(f"unknown --show aspect: {e}")
        sys.stdout.write(json.dumps(aspect, default=str) + "\n")
        return 0
    if args.pipeline is None:
        ap.error("a pipeline string is required (or use --show)")

    import ray

    init_ray(args.num_cpus)

    try:
        if args.explain:
            from tenzir_ray.pipelines.tql import explain_pipeline

            parser = None
            if args.tql2:
                from tenzir_ray.pipelines.tql2 import parse_pipeline2

                parser = parse_pipeline2
            _print_dataset(explain_pipeline(args.pipeline, parser=parser),
                           args.format, args.limit)
            return 0
        if args.tql2:
            from tenzir_ray.pipelines.tql2 import run_pipeline2

            out = run_pipeline2(args.pipeline)
        else:
            from tenzir_ray.pipelines.tql import run_pipeline

            out = run_pipeline(args.pipeline)
        if out is None:
            return 0
        _print_dataset(out, args.format, args.limit)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
