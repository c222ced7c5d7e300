"""Randomized MERGE INTO semantics vs an independent pandas model.

Hypothesis drives random (base, source, action) triples through
LakeTable.merge and re-derives the expected final state with plain
pandas set algebra — catching classification, condition, and LWW edges
the hand-written cases miss. Few examples (each runs a real Ray
pipeline), wide shrink space.
"""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_KEYS = [("c%d" % c, t) for c in range(4) for t in range(4)]

_base_keys = st.lists(st.sampled_from(range(len(_KEYS))),
                      min_size=0, max_size=10, unique=True)
_src_keys = st.lists(st.sampled_from(range(len(_KEYS))),
                     min_size=1, max_size=8, unique=True)
_matched = st.sampled_from(["update", "delete", "ignore"])
_unmatched = st.sampled_from(["insert", "ignore"])
_cond = st.sampled_from([None, "turn_idx >= 2", "conv_id == 'c1'"])


def _model(base: pd.DataFrame, src: pd.DataFrame, when_matched,
           cond, when_not_matched) -> pd.DataFrame:
    """Reference semantics in pandas."""
    bk = set(zip(base.conv_id, base.turn_idx))
    out = base.copy()
    for _, r in src.iterrows():
        key = (r.conv_id, r.turn_idx)
        matched = key in bk
        if matched:
            if cond == "turn_idx >= 2" and not r.turn_idx >= 2:
                continue
            if cond == "conv_id == 'c1'" and r.conv_id != "c1":
                continue
            m = (out.conv_id == r.conv_id) & (out.turn_idx == r.turn_idx)
            if when_matched == "update":
                out.loc[m, "text"] = r.text
            elif when_matched == "delete":
                out = out[~m]
        else:
            if when_not_matched == "insert":
                out = pd.concat(
                    [out, pd.DataFrame([r])], ignore_index=True)
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(bk=_base_keys, sk=_src_keys, wm=_matched, cond=_cond,
       wn=_unmatched)
def test_merge_matches_pandas_model(tmp_path_factory, bk, sk, wm, cond, wn):
    import ray.data

    from tenzir_ray.cdc import LakeTable

    root = str(tmp_path_factory.mktemp("mergeprop") / "lake")
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=3)
    base = pd.DataFrame({
        "conv_id": [_KEYS[i][0] for i in bk],
        "turn_idx": np.array([_KEYS[i][1] for i in bk], np.int32),
        "text": [f"base{i}" for i in bk],
    })
    if len(base):
        tbl = pa.table({
            "lsn": pa.array(range(len(base)), pa.int64()),
            "op": pa.array(["insert"] * len(base)),
            "conv_id": pa.array(base.conv_id),
            "turn_idx": pa.array(base.turn_idx, pa.int32()),
            "text": pa.array(base.text),
        })
        lake.apply_changes(tbl, epoch_id="base")
    src = pd.DataFrame({
        "conv_id": [_KEYS[i][0] for i in sk],
        "turn_idx": np.array([_KEYS[i][1] for i in sk], np.int32),
        "text": [f"src{i}" for i in sk],
    })
    lake.merge(
        ray.data.from_arrow(pa.table({
            "conv_id": pa.array(src.conv_id),
            "turn_idx": pa.array(src.turn_idx, pa.int32()),
            "text": pa.array(src.text),
        })),
        "m1", when_matched=wm, matched_condition=cond,
        when_not_matched=wn)
    got = lake.final_table().to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    want = _model(base, src, wm, cond, wn)
    assert len(got) == len(want), (got, want)
    if len(want):
        assert (got["conv_id"].to_numpy() == want["conv_id"].to_numpy()).all()
        assert (got["turn_idx"].to_numpy()
                == want["turn_idx"].to_numpy().astype(got["turn_idx"].dtype)).all()
        assert (got["text"].to_numpy() == want["text"].to_numpy()).all()
