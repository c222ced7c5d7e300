"""Chat-format JSONL export tests."""

from __future__ import annotations

import json
import os

import pyarrow as pa


def _convs():
    return pa.table({
        "conv_id": ["a", "a", "a", "b"],
        "turn_idx": [0, 1, 2, 0],
        "role": ["user", "assistant", "user", "user"],
        "text": ["hi", "hello", "bye", "solo"],
    })


def test_render_chat_orders_turns(ray_session):
    import ray.data

    from tenzir_ray.stages.transcripts import render_chat

    out = (render_chat(ray.data.from_arrow(_convs()).repartition(3))
           .to_pandas().sort_values("conv_id", ignore_index=True))
    assert out["n_turns"].tolist() == [3, 1]
    a = out.loc[0, "messages"]
    assert [m["role"] for m in a] == ["user", "assistant", "user"]
    assert [m["content"] for m in a] == ["hi", "hello", "bye"]


def test_write_sft_jsonl_roundtrip(ray_session, tmp_path):
    import ray.data

    from tenzir_ray.stages.transcripts import write_sft_jsonl

    dest = str(tmp_path / "sft")
    stats = write_sft_jsonl(ray.data.from_arrow(_convs()), dest)
    assert stats["rows"].sum() == 2  # one line per conversation
    recs = []
    for fn in os.listdir(dest):
        assert fn.endswith(".jsonl")
        with open(os.path.join(dest, fn)) as f:
            recs += [json.loads(line) for line in f]
    recs.sort(key=lambda r: r["conv_id"])
    assert recs[0]["messages"] == [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "bye"},
    ]
    assert recs[1] == {"conv_id": "b", "n_turns": 1,
                       "messages": [{"role": "user", "content": "solo"}]}


def test_collate_packed_shapes(ray_session):
    import numpy as np
    import ray.data

    from tenzir_ray.stages.chunk import collate_packed

    tbl = pa.table({
        "i": [0, 1, 2, 3],
        "seq_id": [0, 0, 1, 1],
        "ids": [[1, 2, 3], [4, 5], [6], []],
    })
    out = (collate_packed(ray.data.from_arrow(tbl).repartition(2),
                          "i", "ids", seq_len=4)
           .to_pandas().sort_values("seq_id", ignore_index=True))
    s0 = np.asarray(out.loc[0, "input_ids"])
    assert s0.tolist() == [1, 2, 3, 4]  # truncated at seq_len
    assert out.loc[0, "n_tokens"] == 5 and out.loc[0, "n_kept"] == 4
    s1 = np.asarray(out.loc[1, "input_ids"])
    assert s1.tolist() == [6, 0, 0, 0]  # padded
    assert out.loc[1, "n_docs"] == 2 and out.loc[1, "n_kept"] == 1


def test_collate_string_seq_keys_and_null_conv(ray_session, tmp_path):
    import numpy as np
    import ray.data

    from tenzir_ray.stages.chunk import collate_packed
    from tenzir_ray.stages.transcripts import write_sft_jsonl

    tbl = pa.table({"i": [0, 1], "seq_id": ["s0", "s0"],
                    "ids": [[1], [2]]})
    out = (collate_packed(ray.data.from_arrow(tbl), "i", "ids", seq_len=3)
           .to_pandas())
    assert out["seq_id"].tolist() == ["s0"]
    assert np.asarray(out.loc[0, "input_ids"]).tolist() == [1, 2, 0]

    convs = pa.table({
        "conv_id": pa.array(["a", None], pa.string()),
        "turn_idx": [0, 0],
        "role": ["user", "user"],
        "text": ["x", "orphan"],
    })
    dest = str(tmp_path / "nullconv")
    stats = write_sft_jsonl(ray.data.from_arrow(convs), dest)
    # null conv_id is still a group (SQL GROUP BY), not silent data loss
    assert stats["rows"].sum() == 2
    recs = []
    for fn in os.listdir(dest):
        with open(os.path.join(dest, fn)) as f:
            recs += [json.loads(line) for line in f]
    contents = sorted(m["content"] for r in recs for m in r["messages"])
    assert contents == ["orphan", "x"]
