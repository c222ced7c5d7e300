"""Incremental materialized-view maintenance (DerivedView): delta-driven
partial recompute, exactly-once refresh, delete propagation."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tenzir_ray.cdc import DerivedView, LakeTable, gen_changes, naive_apply


def _split(ch, lo, hi):
    lsn = ch.column("lsn")
    return ch.filter(pc.and_(pc.greater_equal(lsn, lo), pc.less(lsn, hi)))


def _want(lake: LakeTable) -> pd.DataFrame:
    live = lake.final_table().to_pandas()
    w = live.groupby("conv_id").agg(
        turns=("turn_idx", "size"), max_turn=("turn_idx", "max")
    ).reset_index()
    return w.sort_values("conv_id").reset_index(drop=True)


def _got(view: DerivedView) -> pd.DataFrame:
    g = view.final_table().to_pandas()
    return g.sort_values("conv_id").reset_index(drop=True)


def _check(view: DerivedView, lake: LakeTable):
    g, w = _got(view), _want(lake)
    assert len(g) == len(w), (len(g), len(w))
    assert g["conv_id"].tolist() == w["conv_id"].tolist()
    assert g["turns"].tolist() == w["turns"].tolist()
    assert g["max_turn"].tolist() == w["max_turn"].tolist()


def test_derived_view_incremental_refresh(ray_session, tmp_path):
    ch = gen_changes(8_000, seed=41)
    lake = LakeTable(str(tmp_path / "src"), num_partitions=4)
    view = DerivedView(
        lake, str(tmp_path / "dv"),
        aggs={"turns": "count(*)", "max_turn": "max(turn_idx)"},
    )
    lake.apply_changes(_split(ch, 0, 4000), epoch_id="e1", change_feed=True)
    res = view.refresh()
    assert [r["epoch_id"] for r in res] == ["e1"]
    _check(view, lake)

    lake.apply_changes(_split(ch, 4000, 8000), epoch_id="e2", change_feed=True)
    res2 = view.refresh()
    assert [r["epoch_id"] for r in res2] == ["e2"]
    _check(view, lake)

    # idempotent: nothing pending, nothing applied
    assert view.refresh() == []
    assert view.pending_epochs() == []


def test_derived_view_delete_propagation(ray_session, tmp_path):
    lake = LakeTable(str(tmp_path / "src"), num_partitions=2)
    ins = pa.table({
        "lsn": pa.array([0, 1, 2], pa.int64()),
        "op": ["insert"] * 3,
        "conv_id": ["a", "a", "b"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text": ["x", "y", "z"],
    })
    lake.apply_changes(ins, epoch_id="e1", change_feed=True)
    view = DerivedView(lake, str(tmp_path / "dv"), aggs={"turns": "count(*)"})
    view.refresh()
    assert _got(view)["conv_id"].tolist() == ["a", "b"]

    # delete ALL of conv b: the derived row must disappear
    dele = pa.table({
        "lsn": pa.array([3], pa.int64()),
        "op": ["delete"],
        "conv_id": ["b"],
        "turn_idx": pa.array([0], pa.int32()),
        "text": pa.array([None], pa.string()),
    })
    lake.apply_changes(dele, epoch_id="e2", change_feed=True)
    view.refresh()
    g = _got(view)
    assert g["conv_id"].tolist() == ["a"]
    assert g["turns"].tolist() == [2]


def test_derived_view_late_refresh_converges(ray_session, tmp_path):
    # refresh AFTER two source epochs (incl. out-of-lsn-order backfill):
    # per-epoch recompute observes current state and must converge
    ch = gen_changes(6_000, seed=43)
    lake = LakeTable(str(tmp_path / "src"), num_partitions=4)
    odd = ch.filter(pc.equal(pc.bit_wise_and(ch.column("lsn"), 1), 1))
    even = ch.filter(pc.equal(pc.bit_wise_and(ch.column("lsn"), 1), 0))
    lake.apply_changes(odd, epoch_id="odd", change_feed=True)
    lake.apply_changes(even, epoch_id="even", change_feed=True)
    view = DerivedView(
        lake, str(tmp_path / "dv"),
        aggs={"turns": "count(*)", "max_turn": "max(turn_idx)"},
    )
    res = view.refresh()
    assert [r["epoch_id"] for r in res] == ["odd", "even"]
    _check(view, lake)


def test_derived_view_survives_source_lineage_truncation(
        ray_session, tmp_path):
    """Refreshes after source.truncate_lineage() must still LWW-win over
    rows written before the truncation (absolute apply-seq, not the
    shrinking lineage index)."""
    lake = LakeTable(str(tmp_path / "src"), num_partitions=2)
    view = DerivedView(
        lake, str(tmp_path / "dv"),
        aggs={"turns": "count(*)", "max_turn": "max(turn_idx)"},
    )
    ch = gen_changes(6_000, seed=7)
    for i, (lo, hi) in enumerate([(0, 2000), (2000, 4000)]):
        lake.apply_changes(_split(ch, lo, hi), epoch_id=f"e{i}",
                           change_feed=True)
    view.refresh()
    _check(view, lake)
    lake.truncate_lineage(keep_epochs=1)
    lake.apply_changes(_split(ch, 4000, 6000), epoch_id="e2",
                       change_feed=True)
    view.refresh()
    _check(view, lake)  # fails if the new refresh lost LWW to old rows


def test_derived_view_nonkey_group_requires_preimages(ray_session, tmp_path):
    """A payload group_col with a postimage-only feed cannot see the OLD
    group of a moved/deleted row — refuse loudly instead of silently
    keeping stale aggregates."""
    lake = LakeTable(str(tmp_path / "src"), num_partitions=2)
    view = DerivedView(lake, str(tmp_path / "dv"),
                       aggs={"n": "count(*)"}, group_col="role")
    ch = gen_changes(500, seed=9)
    lake.apply_changes(ch, epoch_id="e1", change_feed=True)
    with pytest.raises(ValueError, match="preimages"):
        view.refresh()
    # with the preimage feed the same view refreshes fine
    lake2 = LakeTable(str(tmp_path / "src2"), num_partitions=2)
    view2 = DerivedView(lake2, str(tmp_path / "dv2"),
                        aggs={"n": "count(*)"}, group_col="role")
    lake2.apply_changes(ch, epoch_id="e1", change_feed="preimages")
    view2.refresh()
    live = lake2.final_table().to_pandas()
    want = live.groupby("role").size()
    got = view2.final_table().to_pandas().set_index("role")["n"]
    assert dict(got) == dict(want)


def test_derived_view_empty_final_table(ray_session, tmp_path):
    lake = LakeTable(str(tmp_path / "src"), num_partitions=2)
    view = DerivedView(lake, str(tmp_path / "dv"),
                       aggs={"turns": "count(*)"})
    t = view.final_table()
    assert t.num_rows == 0 and "conv_id" in t.column_names
