"""Per-file key blooms + point lookup (the O(1)-per-conversation read
path): bloom membership properties, file skipping on reads, and
lookup() exactness across delta files and tombstones."""

import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray.cdc.lake import (
    LakeTable,
    _bloom_build,
    _bloom_maybe_contains,
    stable_part_of_uniques,
)


def test_bloom_no_false_negatives_and_low_fp():
    keys = [f"conv-{i}" for i in range(5000)]
    bl = _bloom_build(keys)
    assert all(_bloom_maybe_contains(bl, k) for k in keys)
    probes = [f"other-{i}" for i in range(5000)]
    fp = sum(_bloom_maybe_contains(bl, p) for p in probes) / len(probes)
    assert fp < 0.05, fp  # ~1% design point, generous bound


def test_bloom_cap_respected(monkeypatch):
    monkeypatch.setenv("TENZIR_RAY_BLOOM_MAX_BYTES", "64")
    bl = _bloom_build([f"k{i}" for i in range(10_000)])
    assert bl["m"] <= 64 * 8
    monkeypatch.setenv("TENZIR_RAY_BLOOM_MAX_BYTES", "0")
    assert _bloom_build(["a"]) is None


def _changes(convs, n_turns, lsn0, op="insert", text="t"):
    conv, turn, lsn = [], [], []
    i = 0
    for c in convs:
        for t in range(n_turns):
            conv.append(c)
            turn.append(t)
            lsn.append(lsn0 + i)
            i += 1
    return pa.table({
        "lsn": pa.array(lsn, pa.int64()),
        "op": pa.array([op] * len(conv)),
        "conv_id": pa.array(conv),
        "turn_idx": pa.array(turn, pa.int32()),
        "text": pa.array([f"{text}-{c}-{t}" for c, t in zip(conv, turn)]),
    })


def test_lookup_exact_across_deltas_and_tombstones(ray_session, tmp_path):
    root = str(tmp_path / "lake")
    lake = LakeTable(root, num_partitions=4)
    base = _changes([f"c{i}" for i in range(20)], 50, lsn0=0)
    lake.apply_changes(base, epoch_id="base")
    # delta epoch: update two turns of c3, delete one turn of c3
    upd = _changes(["c3"], 2, lsn0=10_000, text="upd")
    lake.apply_changes(upd, epoch_id="upd")
    dele = pa.table({
        "lsn": pa.array([20_000], pa.int64()),
        "op": pa.array(["delete"]),
        "conv_id": pa.array(["c3"]),
        "turn_idx": pa.array([5], pa.int32()),
        "text": pa.nulls(1, pa.string()),
    })
    lake.apply_changes(dele, epoch_id="del")
    got = lake.lookup("c3")
    want = lake.final_table().filter(
        pc.equal(lake.final_table().column("conv_id"), "c3"))
    assert got.num_rows == 49  # 50 turns - 1 tombstone
    assert got.select(want.column_names).equals(want)
    # turns 0/1 carry the delta's text (LWW)
    assert got.column("text")[0].as_py() == "upd-c3-0"
    # a conversation that never existed
    assert lake.lookup("nope").num_rows == 0
    # projection
    assert lake.lookup("c3", columns=["conv_id", "text"]).column_names == \
        ["conv_id", "text"]


def test_lookup_bloom_prunes_disjoint_files(ray_session, tmp_path):
    root = str(tmp_path / "lake")
    P = 4
    lake = LakeTable(root, num_partitions=P)
    # 6 append-only epochs with DISJOINT conv sets → every partition gets
    # one file per epoch, each containing different conversations
    groups = [[f"g{e}-{i}" for i in range(30)] for e in range(6)]
    for e, convs in enumerate(groups):
        lake.apply_changes(_changes(convs, 3, lsn0=e * 1000),
                           epoch_id=f"e{e}", append_only=True)
    target = groups[2][0]
    part = int(stable_part_of_uniques([target], P)[0])
    n_files = len(lake.manifest.partitions[str(part)]["files"])
    assert n_files >= 4  # the conv's partition accumulated epoch files
    got = lake.lookup(target)
    assert got.num_rows == 3
    assert lake._last_lookup_pruned >= n_files - 2  # blooms skipped the rest
    # the streaming read path prunes through the same stats
    out = lake.read(filter_expr=f"conv_id == '{target}'")
    assert out.count() == 3
    assert lake._last_read_pruned > 0


def test_lookup_after_optimize_keeps_bloom(ray_session, tmp_path):
    root = str(tmp_path / "lake")
    lake = LakeTable(root, num_partitions=2)
    lake.apply_changes(_changes(["a", "b", "c"], 4, lsn0=0), epoch_id="e0")
    lake.optimize()
    got = lake.lookup("b")
    assert got.num_rows == 4
    # compacted file_stats carry a bloom entry
    stats = next(iter(lake.manifest.partitions[str(
        int(stable_part_of_uniques(["b"], 2)[0]))]["file_stats"].values()))
    assert "_bloom:conv_id" in stats
