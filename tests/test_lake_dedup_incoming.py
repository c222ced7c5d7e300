"""LakeTable.dedup_incoming — corpus-hygiene filter for incoming CDC
batches (anti join / fuzzy LSH against the lake's own content)."""

import shutil

import numpy as np
import pyarrow as pa
import pytest


def _mk_lake(tmp_path, texts, parts=4):
    from tenzir_ray.cdc import LakeTable

    root = str(tmp_path / "lake")
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=parts)
    n = len(texts)
    lake.apply_changes(pa.table({
        "lsn": pa.array(range(n), pa.int64()),
        "op": pa.array(["insert"] * n),
        "conv_id": pa.array([f"c{i}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "text": pa.array(texts),
    }), epoch_id="base")
    return lake


def _incoming(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "lsn": pa.array([100 + i for i in range(len(rows))], pa.int64()),
        "op": pa.array(["insert"] * len(rows)),
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([0] * len(rows), pa.int32()),
        "text": pa.array([r[1] for r in rows]),
    }))


def test_exact_dedup_incoming_drops_known_content(ray_session, tmp_path):
    lake = _mk_lake(tmp_path, ["alpha beta", "gamma delta", "eps zeta"])
    inc = _incoming([
        ("n0", "alpha beta"),     # known content → dropped
        ("n1", "brand new doc"),  # survives
        ("n2", "gamma delta"),    # known → dropped
        ("n3", None),             # null content survives (matches nothing)
    ])
    kept = lake.dedup_incoming(inc, column="text").to_pandas()
    assert sorted(kept["conv_id"]) == ["n1", "n3"]

    # composing with apply lands only the survivors
    lake.apply_changes(lake.dedup_incoming(inc, column="text"),
                       epoch_id="ingest")
    ft = lake.final_table().to_pandas()
    assert len(ft) == 5
    assert sorted(ft[ft.conv_id.str.startswith("n")]["conv_id"]) == ["n1", "n3"]


def test_fuzzy_dedup_incoming_catches_near_copies(ray_session, tmp_path):
    base = ["the quick brown fox jumps over the lazy dog again and again",
            "completely unrelated corpus entry about databases and rays"]
    lake = _mk_lake(tmp_path, base)
    inc = _incoming([
        ("n0", base[0]),                               # exact copy
        ("n1", base[0].replace("lazy", "sleepy")),     # near copy
        ("n2", "entirely fresh text with no overlap whatsoever in shingles"),
    ])
    kept = lake.dedup_incoming(inc, column="text", mode="fuzzy").to_pandas()
    assert "n0" not in set(kept["conv_id"])  # exact copies ALWAYS match
    assert "n2" in set(kept["conv_id"])


def test_dedup_incoming_bad_mode(ray_session, tmp_path):
    lake = _mk_lake(tmp_path, ["x"])
    with pytest.raises(ValueError, match="mode"):
        lake.dedup_incoming(_incoming([("a", "x")]), mode="nope")
