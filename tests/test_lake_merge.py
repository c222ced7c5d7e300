"""LakeTable.merge — Delta-style MERGE INTO (cdc/lake.py)."""

import shutil

import numpy as np
import pyarrow as pa
import pytest


def _mk_lake(tmp_path, n=20, convs=4, parts=4):
    from tenzir_ray.cdc import LakeTable

    root = str(tmp_path / "lake")
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=parts)
    base = pa.table({
        "lsn": pa.array(range(n), pa.int64()),
        "op": pa.array(["insert"] * n),
        "conv_id": pa.array([f"c{i % convs}" for i in range(n)]),
        "turn_idx": pa.array([i // convs for i in range(n)], pa.int32()),
        "text": pa.array([f"t{i}" for i in range(n)]),
    })
    lake.apply_changes(base, epoch_id="base")
    return lake


def _src(rows):
    import ray.data

    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows]),
    })
    return ray.data.from_arrow(t)


def test_merge_update_and_insert(ray_session, tmp_path):
    lake = _mk_lake(tmp_path)
    src = _src([("c0", 0, "upd0"), ("c1", 1, "upd1"), ("c0", 99, "new")])
    rec = lake.merge(src, "m1")
    assert not rec.get("skipped")
    f = lake.final_table().to_pandas()
    assert len(f) == 21
    assert f.loc[(f.conv_id == "c0") & (f.turn_idx == 0), "text"].item() == "upd0"
    assert f.loc[(f.conv_id == "c1") & (f.turn_idx == 1), "text"].item() == "upd1"
    assert f.loc[(f.conv_id == "c0") & (f.turn_idx == 99), "text"].item() == "new"
    # untouched row keeps its text
    assert f.loc[(f.conv_id == "c2") & (f.turn_idx == 0), "text"].item() == "t2"


def test_merge_idempotent_replay(ray_session, tmp_path):
    lake = _mk_lake(tmp_path)
    src = _src([("c0", 0, "upd0")])
    lake.merge(src, "m1")
    before = lake.final_table()
    rec = lake.merge(_src([("c0", 0, "DIFFERENT")]), "m1")
    assert rec.get("skipped") is True
    assert lake.final_table().equals(before)


def test_merge_matched_delete_with_condition(ray_session, tmp_path):
    lake = _mk_lake(tmp_path)
    src = _src([("c0", 0, "x"), ("c1", 0, "y"), ("zz", 0, "z")])
    lake.merge(src, "m1", when_matched="delete",
               matched_condition="conv_id == 'c0'",
               when_not_matched="ignore")
    f = lake.final_table().to_pandas()
    assert not ((f.conv_id == "c0") & (f.turn_idx == 0)).any()  # deleted
    assert ((f.conv_id == "c1") & (f.turn_idx == 0)).any()      # cond failed
    assert not (f.conv_id == "zz").any()                        # ignored


def test_merge_matched_ignore_inserts_only(ray_session, tmp_path):
    lake = _mk_lake(tmp_path)
    src = _src([("c0", 0, "SHOULD_NOT_APPLY"), ("c9", 5, "fresh")])
    lake.merge(src, "m1", when_matched="ignore")
    f = lake.final_table().to_pandas()
    assert f.loc[(f.conv_id == "c0") & (f.turn_idx == 0), "text"].item() == "t0"
    assert f.loc[(f.conv_id == "c9") & (f.turn_idx == 5), "text"].item() == "fresh"


def test_merge_duplicate_source_keys_rejected(ray_session, tmp_path):
    lake = _mk_lake(tmp_path)
    with pytest.raises(ValueError, match="duplicate keys"):
        lake.merge(_src([("a", 1, "p"), ("a", 1, "q")]), "m1")
    # validation happens before any commit: the epoch is replayable
    rec = lake.merge(_src([("a", 1, "p")]), "m1")
    assert not rec.get("skipped")


def test_merge_into_empty_lake(ray_session, tmp_path):
    from tenzir_ray.cdc import LakeTable

    lake = LakeTable(str(tmp_path / "empty"), num_partitions=2)
    lake.merge(_src([("c0", 0, "a"), ("c1", 0, "b")]), "first")
    f = lake.final_table().to_pandas()
    assert len(f) == 2 and sorted(f.text) == ["a", "b"]


def test_merge_tombstones_stay_dead(ray_session, tmp_path):
    # a key deleted by merge must not resurrect on a later read path
    lake = _mk_lake(tmp_path)
    lake.merge(_src([("c0", 0, "x")]), "del1", when_matched="delete",
               when_not_matched="ignore")
    lake.optimize()
    f = lake.final_table().to_pandas()
    assert not ((f.conv_id == "c0") & (f.turn_idx == 0)).any()
    # and a later merge re-inserting the key works (key is now unmatched)
    lake.merge(_src([("c0", 0, "reborn")]), "re1")
    f2 = lake.final_table().to_pandas()
    assert f2.loc[(f2.conv_id == "c0") & (f2.turn_idx == 0), "text"].item() == "reborn"


def test_merge_bad_args(ray_session, tmp_path):
    lake = _mk_lake(tmp_path)
    with pytest.raises(ValueError):
        lake.merge(_src([("c0", 0, "x")]), "m1", when_matched="upsert")
    with pytest.raises(ValueError):
        lake.merge(_src([("c0", 0, "x")]), "m1", when_not_matched="update")
