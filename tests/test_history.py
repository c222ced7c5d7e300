"""SCD Type-2 history and LSN gap audits (cdc/history.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _stream():
    rows = [
        # key A: insert, update, update -> 3 versions, last current
        {"lsn": 1, "op": "insert", "k": "A", "v": "a1"},
        {"lsn": 5, "op": "update", "k": "A", "v": "a2"},
        {"lsn": 9, "op": "update", "k": "A", "v": "a3"},
        # key B: insert, delete -> 1 closed version, no current
        {"lsn": 2, "op": "insert", "k": "B", "v": "b1"},
        {"lsn": 4, "op": "delete", "k": "B", "v": None},
        # key C: insert only -> current
        {"lsn": 7, "op": "insert", "k": "C", "v": "c1"},
    ]
    return rows


def test_scd2_history(ray_session):
    from tenzir_ray.cdc.history import scd2_history

    out = (scd2_history(ray_session.data.from_items(_stream()), keys="k")
           .to_pandas().sort_values(["k", "valid_from"], ignore_index=True))
    recs = out.to_dict("records")
    assert [(r["k"], r["valid_from"],
             None if pd.isna(r["valid_to"]) else int(r["valid_to"]),
             bool(r["is_current"])) for r in recs] == [
        ("A", 1, 5, False), ("A", 5, 9, False), ("A", 9, None, True),
        ("B", 2, 4, False),  # closed by the delete, which emits no row
        ("C", 7, None, True),
    ]
    # live view == is_current rows
    assert out[out["is_current"]]["v"].tolist() == ["a3", "c1"]


def test_lsn_gaps(ray_session):
    from tenzir_ray.cdc.history import lsn_gaps

    rng = np.random.default_rng(3)
    lsns = np.arange(1000)
    keep = lsns[lsns % 97 != 0]
    df = pd.DataFrame({"lsn": keep, "part": keep % 4})
    per = (lsn_gaps(ray_session.data.from_pandas(df).repartition(5),
                    by="part")
           .to_pandas().sort_values("part", ignore_index=True))
    for _, r in per.iterrows():
        have = set(keep[keep % 4 == r["part"]])
        lo, hi = min(have), max(have)
        missing = sum(1 for x in range(lo, hi + 1) if x not in have)
        assert r["n_rows"] == len(have) and r["lsn_min"] == lo
        assert r["n_missing"] == missing
    g = lsn_gaps(ray_session.data.from_pandas(df).repartition(5)).to_pandas()
    have = set(keep)
    lo, hi = min(have), max(have)
    assert len(g) == 1
    assert g["n_missing"][0] == sum(1 for x in range(lo, hi + 1)
                                    if x not in have)
    assert g["max_gap"][0] == 1
    # duplicates count as covered
    dup = pd.DataFrame({"lsn": [1, 1, 2, 5]})
    d = lsn_gaps(ray_session.data.from_pandas(dup)).to_pandas()
    assert d["n_missing"][0] == 2 and d["n_rows"][0] == 4


def test_snapshot_diff_classifies_and_skips_unchanged(ray_session, tmp_path):
    import shutil

    import ray.data

    from tenzir_ray.cdc import LakeTable
    from tenzir_ray.cdc.history import snapshot_diff

    root = str(tmp_path / "lake")
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=2)
    lake.apply_changes(pa.table({
        "lsn": pa.array([0, 1, 2, 3], pa.int64()),
        "op": pa.array(["insert"] * 4),
        "conv_id": pa.array(["a", "b", "c", "d"]),
        "turn_idx": pa.array([0, 0, 0, 0], pa.int32()),
        "text": pa.array(["t1", "t2", None, "t4"]),
    }), epoch_id="base")
    lake.apply_changes(pa.table({
        "lsn": pa.array([10, 11, 12, 13], pa.int64()),
        "op": pa.array(["update", "delete", "update", "insert"]),
        "conv_id": pa.array(["a", "b", "c", "e"]),
        "turn_idx": pa.array([0, 0, 0, 0], pa.int32()),
        # c: null -> null = UNCHANGED, must not appear in the diff
        "text": pa.array(["t1x", None, None, "t5"]),
    }), epoch_id="e2")

    out = (snapshot_diff(lake, "base").to_pandas()
           .sort_values("conv_id", ignore_index=True))
    assert out["conv_id"].tolist() == ["a", "b", "e"]
    assert out["change"].tolist() == ["update", "delete", "insert"]
    assert out["text"].tolist() == ["t1x", "t2", "t5"]  # delete = FROM image

    # identical snapshots diff to empty AND keep the Dataset-level
    # schema (reducers emit schema-pinned Arrow; Ray's to_pandas still
    # drops columns of an all-empty dataset, so assert on .schema())
    same = snapshot_diff(lake, "e2")
    assert same.count() == 0
    assert "change" in same.schema().names

    # explicit to_epoch: base -> base is empty too
    assert snapshot_diff(lake, "base", "base").count() == 0


def test_lake_diff_and_dedup_from_tql(ray_session, tmp_path):
    """snapshot_diff / dedup_incoming are reachable from pure pipeline
    strings via the lake_diff source and dedup_against_lake ops."""
    import shutil

    import ray.data

    from tenzir_ray.cdc import LakeTable
    from tenzir_ray.pipelines.tql import run_pipeline

    root = str(tmp_path / "lake")
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=2)
    lake.apply_changes(pa.table({
        "lsn": pa.array([0, 1], pa.int64()),
        "op": pa.array(["insert"] * 2),
        "conv_id": pa.array(["a", "b"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "text": pa.array(["t1", "t2"]),
    }), epoch_id="base")
    lake.apply_changes(pa.table({
        "lsn": pa.array([9], pa.int64()), "op": pa.array(["update"]),
        "conv_id": pa.array(["a"]), "turn_idx": pa.array([0], pa.int32()),
        "text": pa.array(["t1x"]),
    }), epoch_id="e2")

    out = run_pipeline(
        f'lake_diff root="{root}", from_epoch="base" | where change == "update"'
    ).to_pandas()
    assert out["conv_id"].tolist() == ["a"] and out["text"].tolist() == ["t1x"]

    inc = ray.data.from_arrow(pa.table({
        "lsn": pa.array([20, 21], pa.int64()),
        "op": pa.array(["insert"] * 2),
        "conv_id": pa.array(["x", "y"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "text": pa.array(["t2", "fresh"]),
    }))
    kept = run_pipeline(f'dedup_against_lake root="{root}"', inc).to_pandas()
    assert kept["conv_id"].tolist() == ["y"]


def test_sync_lakes_converges_divergent_replica(ray_session, tmp_path):
    import shutil

    from tenzir_ray.cdc import LakeTable
    from tenzir_ray.cdc.history import sync_lakes

    def _mk(name, rows, lsn0=0):
        root = str(tmp_path / name)
        shutil.rmtree(root, ignore_errors=True)
        lk = LakeTable(root, num_partitions=2)
        lk.apply_changes(pa.table({
            "lsn": pa.array([lsn0 + i for i in range(len(rows))],
                            pa.int64()),
            "op": pa.array(["insert"] * len(rows)),
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([0] * len(rows), pa.int32()),
            "text": pa.array([r[1] for r in rows]),
        }), epoch_id="seed")
        return lk

    src = _mk("src", [("a", "t1"), ("b", "t2"), ("c", "t3")], lsn0=50)
    # replica diverged: stale a, missing b, phantom z
    dst = _mk("dst", [("a", "OLD"), ("c", "t3"), ("z", "phantom")])

    rec = sync_lakes(src, dst, epoch_id="sync1")
    assert not rec.get("skipped")
    got = dst.final_table().to_pandas().sort_values(
        "conv_id", ignore_index=True)
    want = src.final_table().to_pandas().sort_values(
        "conv_id", ignore_index=True)
    assert got.equals(want)

    # idempotent: same epoch replays as a no-op; a fresh no-change
    # sync commits an empty epoch and states stay equal
    assert sync_lakes(src, dst, epoch_id="sync1").get("skipped")
    sync_lakes(src, dst, epoch_id="sync2")
    assert dst.final_table().to_pandas().sort_values(
        "conv_id", ignore_index=True).equals(want)
