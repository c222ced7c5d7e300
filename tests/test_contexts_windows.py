"""Subnet CIDR context + windowed aggregation."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tenzir_ray.state.context import SubnetTable, enrich_subnet
from tenzir_ray.stages.window import session_window, sliding_window

SF = "/root/testdata/sf0.001"


def test_subnet_longest_prefix(ray_session):
    import ray.data

    cidrs = pa.table(
        {
            "net": ["10.0.0.0/8", "10.1.0.0/16", "10.1.2.0/24", "192.168.0.0/16"],
            "zone": ["corp", "dc1", "rack42", "home"],
        }
    )
    ctx = SubnetTable(cidrs, key="net")
    events = pa.table(
        {
            "id": [1, 2, 3, 4, 5],
            "ip": ["10.9.9.9", "10.1.5.5", "10.1.2.3", "192.168.7.7", "8.8.8.8"],
        }
    )
    out = enrich_subnet(ray.data.from_arrow(events), ctx, field="ip").to_pandas()
    out = out.sort_values("id")
    assert out["zone"].tolist() == ["corp", "dc1", "rack42", "home", None]
    # --filter drops unmatched
    out2 = enrich_subnet(
        ray.data.from_arrow(events), ctx, field="ip", filter_unmatched=True
    ).to_pandas()
    assert len(out2) == 4


def test_session_window_vs_duckdb(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/events.parquet")
    got = session_window(ds, "ts", gap="1h", by="user_id").to_pandas()
    # oracle: classic gaps-and-islands SQL
    want = duckdb.sql(
        f"""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        > INTERVAL '1 hour' OR
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   THEN 1 ELSE 0 END AS brk
            FROM read_parquet('{SF}/events.parquet')),
        sess AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
            FROM marked)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n
        FROM sess GROUP BY user_id, sid
        """
    ).df()
    g = got.sort_values(["user_id", "session_start"], ignore_index=True)
    w = want.sort_values(["user_id", "session_start"], ignore_index=True)
    assert len(g) == len(w)
    assert g["n"].tolist() == w["n"].tolist()
    assert (
        pd.to_datetime(g["session_start"]).astype("int64").tolist()
        == pd.to_datetime(w["session_start"]).astype("int64").tolist()
    )


def test_sliding_window_counts(ray_session):
    import ray.data

    # 10 events at minutes 0..9; size=5m slide=1m → window starting at
    # minute k covers events in (k-5, k] … count = min(k+1, 5) for k<10
    base = 1_700_000_000_000_000_000
    ts = pa.array(
        [base + i * 60 * 1_000_000_000 for i in range(10)], pa.timestamp("ns")
    )
    ds = ray.data.from_arrow(pa.table({"ts": ts, "v": list(range(10))}))
    out = sliding_window(ds, "ts", size="5m", slide="1m").to_pandas()
    out = out.sort_values("window_start", ignore_index=True)
    # the window ending at the last event covers 5 events
    assert out["n"].max() == 5
    # every event appears in exactly 5 windows: total n == 50
    assert out["n"].sum() == 50


def test_named_contexts_lifecycle(ray_session):
    """context create / update / enrich-by-name / delete (the reference
    context plugin's surface), including the TQL string form."""
    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.pipelines import run_pipeline, show
    from tenzir_ray.state.context import (
        CONTEXTS,
        create_context,
        delete_context,
        enrich_named,
        get_context,
        list_contexts,
        update_context,
    )

    dim = rd.from_arrow(pa.table({
        "code": ["a", "b"], "label": ["alpha", "beta"]}))
    create_context("codes", "lookup-table", ds=dim, key="code")
    assert list_contexts() == {"codes": "lookup-table"}
    assert "codes" in show("named_contexts")

    events = rd.from_arrow(pa.table({"id": [1, 2, 3],
                                     "code": ["a", "b", "z"]}))
    out = enrich_named(events, "codes", field="code").to_pandas()
    assert out.sort_values("id")["label"].fillna("-").tolist() == [
        "alpha", "beta", "-"]

    # update: later rows win per key; new keys join
    update_context("codes", table=pa.table({"code": ["b", "z"],
                                            "label": ["BETA", "zeta"]}))
    out2 = enrich_named(events, "codes", field="code").to_pandas()
    assert out2.sort_values("id")["label"].tolist() == ["alpha", "BETA", "zeta"]

    # TQL string form: context create as a sink, enrich by name
    run_pipeline(
        "context_create geo2 kind=subnet-table key=net",
        ds=rd.from_arrow(pa.table({"net": ["10.0.0.0/8"], "site": ["dc1"]})),
    ).count()
    got = run_pipeline(
        "enrich geo2 field=ip prefix=x_ | select ip, x_site",
        ds=rd.from_arrow(pa.table({"ip": ["10.1.2.3", "192.168.0.1"]})),
    ).to_pandas()
    assert got.sort_values("ip")["x_site"].tolist() == ["dc1", None]

    delete_context("codes")
    delete_context("geo2")
    assert "codes" not in CONTEXTS
    import pytest as _pytest

    with _pytest.raises(KeyError):
        get_context("codes")


def test_named_context_bloom_and_errors(ray_session):
    import pyarrow as pa
    import ray.data as rd
    import pytest as _pytest

    from tenzir_ray.state.context import (
        create_context, delete_context, enrich_named, update_context,
    )

    create_context("members", "bloom-filter", capacity=1000,
                   table=pa.table({"u": ["x", "y"]}), key="u")
    ds = rd.from_arrow(pa.table({"u": ["x", "q", "y", "w"]}))
    kept = enrich_named(ds, "members", field="u").to_pandas()["u"].tolist()
    # bloom has no false negatives: x and y MUST survive
    assert {"x", "y"} <= set(kept)
    update_context("members", table=pa.table({"u": ["q"]}), key="u")
    kept2 = enrich_named(ds, "members", field="u").to_pandas()["u"].tolist()
    assert {"x", "y", "q"} <= set(kept2)
    delete_context("members")

    with _pytest.raises(ValueError):
        create_context("bad", "no-such-kind", table=pa.table({"k": [1]}),
                       key="k")
    with _pytest.raises(ValueError):
        create_context("bad", "lookup-table")  # no table/key
