"""Multi-table replication router: split one change stream into N lakes,
exactly-once per table, crash-resume convergence."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tenzir_ray.cdc import LakeTable, gen_changes, naive_apply, replicate_stream

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _routed(n=6000, seed=7) -> pa.Table:
    """Change log with a _table routing column derived from conv_id hash."""
    ch = gen_changes(n, seed=seed)
    conv = np.asarray(ch.column("conv_id").to_pylist())
    route = np.where(
        np.char.startswith(conv, "conv-0000000"), "hot", "cold"
    )
    return ch.append_column("_table", pa.array(route, pa.string()))


def _sub(ch: pa.Table, name: str) -> pa.Table:
    return ch.filter(pc.equal(ch.column("_table"), name)).drop_columns(["_table"])


def test_replicate_routes_and_matches_oracle(ray_session, tmp_path):
    ch = _routed()
    lakes = {
        "hot": LakeTable(str(tmp_path / "hot"), num_partitions=2),
        "cold": LakeTable(str(tmp_path / "cold"), num_partitions=4),
    }
    res = replicate_stream(ch, lakes, epoch_id="e1")
    assert set(res) == {"hot", "cold"}
    for name, lake in lakes.items():
        want = naive_apply(_sub(ch, name))
        got = lake.final_table()
        assert got.select(PAYLOAD).equals(want.select(PAYLOAD)), name


def test_replicate_resume_after_partial_crash(ray_session, tmp_path):
    ch = _routed(seed=9)
    hot = LakeTable(str(tmp_path / "hot"), num_partitions=2)
    cold = LakeTable(str(tmp_path / "cold"), num_partitions=2)
    # crash sim: only `hot` committed before the driver died
    hot.apply_changes(
        pa.Table.from_arrays(
            [c for c in _sub(ch, "hot").columns],
            names=_sub(ch, "hot").column_names,
        ),
        epoch_id="e1",
    )
    # re-run the whole router: hot skips (idempotent), cold applies
    res = replicate_stream(
        ch, {"hot": hot, "cold": cold}, epoch_id="e1"
    )
    assert res["hot"].get("skipped") is True
    assert "skipped" not in res["cold"]
    assert hot.final_table().select(PAYLOAD).equals(
        naive_apply(_sub(ch, "hot")).select(PAYLOAD))
    assert cold.final_table().select(PAYLOAD).equals(
        naive_apply(_sub(ch, "cold")).select(PAYLOAD))


def test_replicate_strict_rejects_unknown_tables(ray_session, tmp_path):
    ch = _routed(n=1000, seed=3)
    lakes = {"hot": LakeTable(str(tmp_path / "hot"), num_partitions=2)}
    with pytest.raises(Exception, match="undeclared table"):
        replicate_stream(ch, lakes, epoch_id="e1")
    # non-strict: unmirrored tables are ignored
    res = replicate_stream(ch, lakes, epoch_id="e2", strict=False)
    assert lakes["hot"].final_table().select(PAYLOAD).equals(
        naive_apply(_sub(ch, "hot")).select(PAYLOAD))
    assert set(res) == {"hot"}
