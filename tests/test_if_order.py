"""Order-preserving general `if` branches: the split+union fallback tags
rows with their input position and re-sorts by it, so row-wise branches
(filters, assignments, renames) keep INPUT order; branches that
aggregate or project the tag away degrade to the unordered union."""

import pyarrow as pa
import pyarrow.parquet as pq

from tenzir_ray.pipelines.tql2 import run_pipeline2


def _write(tmp_path, n=2_000):
    p = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({
        "k": pa.array(range(n), pa.int64()),
        "v": pa.array([i * 3 % 7 for i in range(n)], pa.int64()),
    }), p)
    return p


def test_filter_branch_preserves_input_order(ray_session, tmp_path):
    p = _write(tmp_path)
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        out = run_pipeline2(f'''
            from "{p}"
            if k % 2 == 0 {{
                where v != 3
            }} else {{
                v = v * 10
            }}
        ''').to_pandas()
    finally:
        ctx.execution_options.preserve_order = prev
    # expected: original k order with even-k v==3 rows dropped — NO sort
    # step in the pipeline, the engine restores it via the row tag
    want = []
    for i in range(2_000):
        v = i * 3 % 7
        if i % 2 == 0:
            if v != 3:
                want.append((i, v))
        else:
            want.append((i, v * 10))
    assert list(zip(out["k"], out["v"])) == want


def test_nested_fallback_ifs_keep_order(ray_session, tmp_path):
    p = _write(tmp_path, n=600)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        out = run_pipeline2(f'''
            from "{p}"
            if k % 2 == 0 {{
                if v >= 4 {{
                    where v != 5
                }} else {{
                    v = v + 100
                }}
            }} else {{
                where v != 0
            }}
        ''').to_pandas()
    finally:
        ctx.execution_options.preserve_order = prev
    want = []
    for i in range(600):
        v = i * 3 % 7
        if i % 2 == 0:
            if v >= 4:
                if v != 5:
                    want.append((i, v))
            else:
                want.append((i, v + 100))
        elif v != 0:
            want.append((i, v))
    assert list(zip(out["k"], out["v"])) == want
    # no internal tag column leaks into the result
    assert not [c for c in out.columns if c.startswith("__tz_")]


def test_aggregate_branch_degrades_gracefully(ray_session, tmp_path):
    p = _write(tmp_path, n=200)
    out = run_pipeline2(f'''
        from "{p}"
        if k < 100 {{
            summarize n=count() by v
        }} else {{
            where v == 1
        }}
    ''').to_pandas()
    # aggregate branch drops the tag → unordered union, but rows/values
    # are exact and no tag column leaks
    agg = out[out["n"].notna()] if "n" in out.columns else out.iloc[0:0]
    assert len(agg) == 7  # v in 0..6 all present among k<100
    assert not [c for c in out.columns if c.startswith("__tz_")]


def test_type_extractor_ignores_internal_tag():
    # `:int`-style extractors must not bind the engine's row tag (an
    # int64 plumbing column a fallback branch would otherwise expose)
    from tenzir_ray.expr import resolve_extractor

    schema = pa.schema([
        pa.field("k", pa.int64()),
        pa.field("__tz_if_tag_abc123", pa.int64()),
        pa.field("v", pa.string()),
    ])
    assert resolve_extractor(schema, ":int") == ["k"]
    assert resolve_extractor(schema, ":int64") == ["k"]
    # suffix extractors skip it too
    assert resolve_extractor(schema, "k") == ["k"]
