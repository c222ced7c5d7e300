"""Randomized snapshot_diff semantics vs an independent pandas model.

Hypothesis drives random two-epoch change histories through the real
lake + snapshot_diff and re-derives the expected diff with plain pandas
set algebra — catching classification, null-equality, and LWW edges."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_KEYS = [("c%d" % c, t) for c in range(3) for t in range(3)]

_row = st.tuples(
    st.sampled_from(range(len(_KEYS))),
    st.sampled_from(["insert", "update", "delete"]),
    st.sampled_from(["x", "y", None]),
)
_epoch = st.lists(_row, min_size=0, max_size=8,
                  unique_by=lambda r: r[0])


def _state(epochs: "list[list]") -> pd.DataFrame:
    """LWW replay in plain pandas: later epochs win per key."""
    live: dict = {}
    for ep in epochs:
        for ki, op, text in ep:
            if op == "delete":
                live.pop(ki, None)
            else:
                live[ki] = text
    rows = [{"conv_id": _KEYS[k][0], "turn_idx": _KEYS[k][1], "text": v}
            for k, v in live.items()]
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])


def _model_diff(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
    ka = {(r.conv_id, r.turn_idx): r.text for r in a.itertuples()}
    kb = {(r.conv_id, r.turn_idx): r.text for r in b.itertuples()}
    rows = []
    for k in sorted(set(ka) | set(kb)):
        if k not in ka:
            rows.append((*k, "insert", kb[k]))
        elif k not in kb:
            rows.append((*k, "delete", ka[k]))
        elif not (ka[k] == kb[k] or (pd.isna(ka[k]) and pd.isna(kb[k]))):
            rows.append((*k, "update", kb[k]))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "change",
                                       "text"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(e1=_epoch, e2=_epoch)
def test_snapshot_diff_matches_model(ray_session, tmp_path_factory, e1, e2):
    from tenzir_ray.cdc import LakeTable
    from tenzir_ray.cdc.history import snapshot_diff

    root = str(tmp_path_factory.mktemp("sdprop") / "lake")
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=2)

    def _tbl(ep, lsn0):
        return pa.table({
            "lsn": pa.array([lsn0 + i for i in range(len(ep))], pa.int64()),
            "op": pa.array([op for _, op, _ in ep]),
            "conv_id": pa.array([_KEYS[k][0] for k, _, _ in ep]),
            "turn_idx": pa.array([_KEYS[k][1] for k, _, _ in ep],
                                 pa.int32()),
            "text": pa.array([t for _, _, t in ep]),
        })

    lake.apply_changes(_tbl(e1, 0), epoch_id="e1")
    lake.apply_changes(_tbl(e2, 100), epoch_id="e2")

    want = _model_diff(_state([e1]), _state([e1, e2]))
    got = snapshot_diff(lake, "e1").to_pandas()
    if len(got) == 0 and len(want) == 0:
        return
    got = got.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    want = want.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert got[["conv_id", "turn_idx", "change"]].values.tolist() == \
        want[["conv_id", "turn_idx", "change"]].values.tolist()
    gt = got["text"].where(got["text"].notna(), None).tolist()
    wt = want["text"].where(want["text"].notna(), None).tolist()
    assert gt == wt
