"""Streaming operators, extra order-dependent transforms, lake maintenance."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tenzir_ray.cdc import LakeTable, gen_changes, naive_apply
from tenzir_ray.stages import transforms as T
from tenzir_ray.stages.streaming import (
    adjacent_unique,
    measure,
    streaming_deduplicate,
)

SF = "/root/testdata/sf0.001"


def test_streaming_deduplicate_limit(ray_session):
    import ray.data

    tbl = pa.table({"k": ["a", "a", "b", "a", "b", "a"], "v": list(range(6))})
    out = streaming_deduplicate(
        ray.data.from_arrow(tbl), by=["k"], limit=2
    ).to_pandas()
    assert sorted(out["k"].tolist()) == ["a", "a", "b", "b"]


def test_streaming_deduplicate_distance(ray_session):
    import ray.data

    tbl = pa.table({"k": ["a", "x1", "x2", "x3", "a"], "v": list(range(5))})
    # distance 2: by the second 'a', 3 events intervened → forgotten → kept
    out = streaming_deduplicate(
        ray.data.from_arrow(tbl), by=["k"], limit=1, distance=2
    ).to_pandas()
    assert out["k"].tolist().count("a") == 2


def test_adjacent_unique(ray_session):
    import ray.data

    tbl = pa.table({"k": ["a", "a", "b", "b", "a", "c", "c"]})
    out = adjacent_unique(ray.data.from_arrow(tbl), by=["k"]).to_pandas()
    assert out["k"].tolist() == ["a", "b", "a", "c"]


def test_measure(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/events.parquet")
    stats = measure(ds).to_pandas()
    assert stats["events"].sum() == 1000
    assert (stats["bytes"] > 0).all()


def test_slice_and_reverse(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/orders.parquet")
    sl = T.slice_(ds, 10, 15, order_by="o_orderkey").to_pandas()
    assert len(sl) == 5
    full = ds.sort("o_orderkey").to_pandas()
    assert sl["o_orderkey"].tolist() == full["o_orderkey"][10:15].tolist()
    neg = T.slice_(ds, -5, None, order_by="o_orderkey").to_pandas()
    assert neg["o_orderkey"].tolist() == full["o_orderkey"][-5:].tolist()
    rev = T.reverse(ds.limit(50), order_by="o_orderkey").to_pandas()
    assert rev["o_orderkey"].is_monotonic_decreasing


def test_repeat_and_enumerate(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/region.parquet")
    assert T.repeat_(ds, 3).count() == 15
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    en = T.enumerate_per_group(
        ev, by="event_type", out="idx", order_by="event_id"
    ).to_pandas()
    g = en[en["event_type"] == "click"].sort_values("event_id")
    assert g["idx"].tolist() == list(range(len(g)))


def test_pseudonymize_prefix_preserving(ray_session):
    import ray.data

    ips = ["10.0.0.1", "10.0.0.2", "10.0.99.7", "192.168.1.1", "not-an-ip"]
    ds = ray.data.from_arrow(pa.table({"ip": ips}))
    out = T.pseudonymize(ds, "ip", salt="k1").to_pandas()
    anon = dict(zip(ips, out.sort_index()["ip"]))
    # deterministic
    out2 = T.pseudonymize(ray.data.from_arrow(pa.table({"ip": ips})), "ip", salt="k1").to_pandas()
    assert sorted(out["ip"]) == sorted(out2["ip"])
    # different key → different mapping
    out3 = T.pseudonymize(ray.data.from_arrow(pa.table({"ip": ips})), "ip", salt="k2").to_pandas()
    assert sorted(out["ip"]) != sorted(out3["ip"])
    # prefix-preserving: shared /24 stays shared, distinct /16 differs
    a, b, c = anon["10.0.0.1"], anon["10.0.0.2"], anon["10.0.99.7"]
    assert a.split(".")[:3] == b.split(".")[:3]
    assert a.split(".")[:2] == c.split(".")[:2]
    assert a.split(".")[2] != c.split(".")[2]
    assert anon["not-an-ip"] == "not-an-ip"


def test_lake_gc_optimize_truncate(ray_session, tmp_path):
    changes = gen_changes(3000, seed=3)
    root = str(tmp_path / "lake")
    lake = LakeTable(root, num_partitions=4)
    lsn = changes.column("lsn")
    lake.apply_changes(changes.filter(pc.less(lsn, 1500)), epoch_id="e1")
    lake.apply_changes(changes.filter(pc.greater_equal(lsn, 1500)), epoch_id="e2")
    # e1's files are superseded orphans now
    res = lake.gc()
    assert res["files_removed"] >= 1
    before = lake.final_table()
    n = lake.optimize(compression_level=9)
    assert n == 4
    lake2 = LakeTable(root)
    assert lake2.final_table().equals(before)
    # e1 + e2 + the compaction record optimize() publishes for time travel
    assert lake2.truncate_lineage(keep_epochs=1) == 2
    eps = LakeTable(root).manifest.epochs
    # retained record + the synthetic base folding the dropped prefix
    # (keeps time travel to retained epochs complete)
    assert len(eps) == 2
    assert (eps[0].get("meta") or {}).get("_lineage_base")
    # correctness preserved end-to-end
    want = naive_apply(changes)
    got = lake2.final_table()
    assert got.select(want.column_names).equals(want)


def test_siphash24_reference_vector():
    # Official SipHash-2-4 test vector (Aumasson & Bernstein, reference
    # implementation appendix): key = 00..0f, message = bytes 00..07.
    import numpy as np

    from tenzir_ray.stages.transforms import _siphash24_u64

    k0 = np.frombuffer(bytes(range(8)), dtype="<u8")[0]
    k1 = np.frombuffer(bytes(range(8, 16)), dtype="<u8")[0]
    m = np.array([int.from_bytes(bytes(range(8)), "little")], dtype=np.uint64)
    assert int(_siphash24_u64(k0, k1, m)[0]) == 0x93F5F5799A932462


def test_pseudonymizer_table_and_direct_paths_agree():
    # The shallow-level bit-table gather and the direct per-prefix PRF
    # must produce identical ciphertexts: anonymize a large batch (table
    # path engages) and a tiny batch (gate keeps the direct path) with
    # fresh instances and compare the overlap.
    import numpy as np

    from tenzir_ray.stages.transforms import _PSEUDO_TABLES, _Pseudonymizer

    rng = np.random.default_rng(7)
    big = rng.integers(0, 2**32, 200_000, dtype=np.uint64).astype(np.uint32)
    p1 = _Pseudonymizer("ip", "vector-test")
    a_big = p1._anon_batch(big)
    _PSEUDO_TABLES.clear()  # fresh process state for the tiny-batch side
    p2 = _Pseudonymizer("ip", "vector-test")
    a_small = p2._anon_batch(big[:5])
    assert (a_big[:5] == a_small).all()
    # tiny batch must not have paid for deep tables
    assert all((1 << lvl) <= 10 for lvl in p2._tables)


# ---------------------------------------------------------------------------
# event-time watermark family


def _wm_frame():
    import numpy as np
    import pandas as pd

    # arrival order = row order; ts deliberately out of order
    return pd.DataFrame(
        {
            "i": np.arange(8, dtype=np.int64),
            "ts": pd.to_datetime(
                [
                    "2025-01-01 00:00",
                    "2025-01-01 10:00",
                    "2025-01-01 01:00",  # 9h behind max → late at 2h lateness
                    "2025-01-01 09:00",  # 1h behind → on time
                    None,                # NaT with live watermark → late
                    "2025-01-02 00:00",
                    "2025-01-01 21:00",  # 3h behind → late
                    "2025-01-02 05:00",
                ]
            ),
        }
    )


def test_watermark_drop_and_tag(ray_session):
    import ray.data

    from tenzir_ray.stages.streaming import watermark

    df = _wm_frame()
    ds = ray.data.from_pandas(df)
    kept = watermark(ds, "ts", lateness_s=7200, mode="drop").to_pandas()
    assert kept["i"].tolist() == [0, 1, 3, 5, 7]
    tagged = watermark(ds, "ts", lateness_s=7200, mode="tag").to_pandas()
    assert tagged["late"].tolist() == [
        False, False, True, False, True, False, True, False,
    ]


def test_watermark_state_spans_batches(ray_session):
    import ray.data

    from tenzir_ray.stages.streaming import watermark

    df = _wm_frame()
    # tiny batches force the carried max across many __call__ invocations
    kept = watermark(
        ray.data.from_pandas(df).repartition(4), "ts",
        lateness_s=7200, batch_size=1,
    ).to_pandas()
    assert kept["i"].tolist() == [0, 1, 3, 5, 7]


def test_watermark_summarize_matches_groupby_on_kept(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from tenzir_ray.stages.streaming import WatermarkSummarize, watermark_summarize

    rng = np.random.default_rng(3)
    n = 5000
    base = pd.Timestamp("2025-06-01").value
    df = pd.DataFrame(
        {
            "i": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                base + rng.integers(0, 86400 * 10, n) * 1_000_000_000
            ),
            "g": rng.integers(0, 3, n).astype(np.int64),
            "v": rng.random(n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6).sort("i")
    out = watermark_summarize(
        ds, "ts", size_s=86400, by="g", lateness_s=3600,
        n="count(*)", total="sum(v)",
    ).to_pandas()

    # oracle: sequential replay row by row with the same rule
    agg = WatermarkSummarize("ts", 86400, {"n": "count(*)"}, by="g")
    size_ns = 86400 * 10**9
    lateness_ns = 3600 * 10**9
    seen_max = None
    kept_rows = []
    for _, row in df.iterrows():
        end = (row["ts"].value // size_ns) * size_ns + size_ns
        wm = None if seen_max is None else seen_max - lateness_ns
        if wm is None or end > wm:
            kept_rows.append(row)
        seen_max = (
            row["ts"].value
            if seen_max is None
            else max(seen_max, row["ts"].value)
        )
    kdf = pd.DataFrame(kept_rows)
    kdf["window_start"] = pd.to_datetime(
        (kdf["ts"].astype("datetime64[ns]").astype("int64") // size_ns) * size_ns
    )
    exp = (
        kdf.groupby(["window_start", "g"], as_index=False)
        .agg(n=("i", "size"), total=("v", "sum"))
    )
    got = out.sort_values(["window_start", "g"]).reset_index(drop=True)
    exp = exp.sort_values(["window_start", "g"]).reset_index(drop=True)
    assert got["n"].tolist() == exp["n"].tolist()
    assert np.allclose(got["total"].to_numpy(), exp["total"].to_numpy())


def test_watermark_summarize_emits_before_flush():
    import pandas as pd

    from tenzir_ray.stages.streaming import WatermarkSummarize

    agg = WatermarkSummarize("ts", 3600, {"n": "count(*)"}, lateness_s=0)
    b1 = pd.DataFrame({"ts": pd.to_datetime(["2025-01-01 00:10",
                                             "2025-01-01 00:20"])})
    assert len(agg.feed(b1)) == 0  # window still open
    b2 = pd.DataFrame({"ts": pd.to_datetime(["2025-01-01 02:05"])})
    early = agg.feed(b2)  # watermark passed 01:00 → first window emits
    assert early["n"].tolist() == [2]
    # a late straggler for the emitted window is dropped, not re-opened
    b3 = pd.DataFrame({"ts": pd.to_datetime(["2025-01-01 00:30"])})
    assert len(agg.feed(b3)) == 0
    assert agg.late_dropped == 1
    final = agg.flush()
    assert final["n"].tolist() == [1]


def test_watermark_registry(ray_session):
    import ray.data

    from tenzir_ray.pipelines.pipeline import Pipeline

    df = _wm_frame()
    out = Pipeline(
        [
            {"op": "watermark", "ts_column": "ts", "lateness_s": 7200},
            {"op": "select", "columns": ["i"]},
        ]
    ).run(ray.data.from_pandas(df))
    assert out.to_pandas()["i"].tolist() == [0, 1, 3, 5, 7]
