"""Token-bloom full-text search over the lake (cdc/lake.py search())."""

import shutil

import numpy as np
import pyarrow as pa
import pytest


def _lake(tmp_path, blooms=True, parts=8, n=800, convs=40):
    from tenzir_ray.cdc import LakeTable

    root = str(tmp_path / "lake")
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=parts,
                     token_bloom_cols=("text",) if blooms else ())
    texts = []
    for i in range(n):
        conv = i % convs
        if conv < 3 and (i // convs) % 5 == 0:
            texts.append(f"needle alpha row{i}")
        else:
            texts.append(f"hay beta row{i}")
    tbl = pa.table({
        "lsn": pa.array(range(n), pa.int64()),
        "op": pa.array(["insert"] * n),
        "conv_id": pa.array([f"c{i % convs}" for i in range(n)]),
        "turn_idx": pa.array([i // convs for i in range(n)], pa.int32()),
        "text": pa.array(texts),
    })
    lake.apply_changes(tbl, epoch_id="base")
    expected = sum(1 for t in texts if "needle" in t.split())
    return lake, expected


def test_search_finds_token_rows_and_prunes(ray_session, tmp_path):
    lake, expected = _lake(tmp_path)
    res = lake.search("needle").to_pandas()
    assert len(res) == expected
    assert lake._last_search_pruned > 0
    assert res["text"].str.split().map(lambda t: "needle" in t).all()


def test_search_substring_is_not_a_token(ray_session, tmp_path):
    lake, _ = _lake(tmp_path)
    # 'need' is a substring of 'needle' but never a whole token
    assert lake.search("need").to_pandas().empty
    # full prune: every partition's bloom rejects
    assert lake._last_search_pruned == lake.num_partitions


def test_search_without_blooms_is_correct_unpruned(ray_session, tmp_path):
    lake, expected = _lake(tmp_path, blooms=False)
    res = lake.search("needle").to_pandas()
    assert len(res) == expected
    assert lake._last_search_pruned == 0


def test_search_respects_lww_updates_and_deletes(ray_session, tmp_path):
    import ray.data

    lake, expected = _lake(tmp_path)
    hits = lake.search("needle").to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    # update one hit to remove the token, delete another
    upd = hits.iloc[0]
    dele = hits.iloc[1]
    ch = pa.table({
        "lsn": pa.array([10_000, 10_001], pa.int64()),
        "op": pa.array(["update", "delete"]),
        "conv_id": pa.array([upd.conv_id, dele.conv_id]),
        "turn_idx": pa.array([int(upd.turn_idx), int(dele.turn_idx)],
                             pa.int32()),
        "text": pa.array(["scrubbed clean", None]),
    })
    lake.apply_changes(ch, epoch_id="fix")
    res = lake.search("needle").to_pandas()
    assert len(res) == expected - 2
    key = set(zip(res.conv_id, res.turn_idx))
    assert (upd.conv_id, upd.turn_idx) not in key
    assert (dele.conv_id, dele.turn_idx) not in key


def test_search_column_projection(ray_session, tmp_path):
    lake, expected = _lake(tmp_path)
    res = lake.search("needle", columns=["conv_id", "turn_idx"]).to_pandas()
    assert list(res.columns) == ["conv_id", "turn_idx"]
    assert len(res) == expected


def test_search_after_optimize_keeps_blooms(ray_session, tmp_path):
    lake, expected = _lake(tmp_path)
    lake.optimize()
    res = lake.search("needle").to_pandas()
    assert len(res) == expected
    assert lake._last_search_pruned > 0  # compaction rebuilt the blooms


def test_tql_lake_search_source(ray_session, tmp_path):
    from tenzir_ray.pipelines.tql import run_pipeline

    lake, expected = _lake(tmp_path)
    out = run_pipeline(
        f"lake_search {lake.root} term=needle | select conv_id, turn_idx")
    assert out.count() == expected


def test_read_parts_subset(ray_session, tmp_path):
    lake, _ = _lake(tmp_path)
    total = lake.read().count()
    some = lake.read(parts=[0, 1]).count()
    rest = lake.read(parts=[p for p in range(lake.num_partitions)
                            if p not in (0, 1)]).count()
    assert some + rest == total
    assert lake.read(parts=[]).count() == 0
