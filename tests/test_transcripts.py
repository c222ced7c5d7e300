"""Conversation-level operators over transcript tables
(tenzir_ray/stages/transcripts.py) — per-conversation stats, tool-call
chains, whole-conversation filtering, conversation-boundary packing, and
role-alternation profiles, all against hand-computed expectations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _transcripts(ray, n_convs=6, turns=8):
    rows = []
    for c in range(n_convs):
        for t in range(turns):
            if c >= 4:  # tool-free conversations (all-mode filter fodder)
                role = ["user", "assistant"][t % 2]
            else:
                role = ["user", "assistant", "tool"][(c + t) % 3]
            rows.append({
                "conv_id": f"c{c}",
                "turn_idx": np.int32(t),
                "role": role,
                "text": f"w{t} " * (1 + (c + t) % 3),
                "tool": f"tool_{c % 3}" if role == "tool" else None,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=c * 100 + t),
            })
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    return ray.data.from_arrow(tbl.replace_schema_metadata(None)).repartition(4), rows


def test_conversation_stats(ray_session):
    from tenzir_ray.stages.transcripts import conversation_stats

    ds, rows = _transcripts(ray_session)
    out = conversation_stats(ds).to_pandas().set_index("conv_id").sort_index()
    df = pd.DataFrame(rows)
    for c, g in df.groupby("conv_id"):
        r = out.loc[c]
        assert r["n_turns"] == len(g)
        assert r["n_tool_calls"] == g["tool"].notna().sum()
        assert r["total_chars"] == g["text"].str.len().sum()
        assert r["first_ts"] == g["ts"].min()
        assert r["last_ts"] == g["ts"].max()
        assert r["max_turn"] == g["turn_idx"].max()


def test_tool_sequences_ordered(ray_session):
    from tenzir_ray.stages.transcripts import tool_sequences

    ds, rows = _transcripts(ray_session)
    out = tool_sequences(ds).to_pandas().set_index("conv_id")
    df = pd.DataFrame(rows)
    tool_turns = df[df["tool"].notna()]
    assert set(out.index) == set(tool_turns["conv_id"])
    for c, g in tool_turns.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert out.loc[c, "tool_chain"] == "->".join(g["tool"])
        assert out.loc[c, "n_calls"] == len(g)


@pytest.mark.parametrize("mode,keep", [("any", True), ("any", False),
                                       ("all", True), ("all", False)])
def test_filter_conversations_modes(ray_session, mode, keep):
    from tenzir_ray.stages.transcripts import filter_conversations

    ds, rows = _transcripts(ray_session)
    df = pd.DataFrame(rows)
    # any-mode predicate flags some-but-not-all convs (tool names are
    # conv-keyed); all-mode predicate holds on every turn of exactly the
    # tool-free conversations
    if mode == "any":
        pred, match = "tool == 'tool_1'", df["tool"] == "tool_1"
    else:
        pred, match = "role != 'tool'", df["role"] != "tool"
    per_conv = match.groupby(df["conv_id"]).agg(["any", "all"])
    sel = per_conv["any"] if mode == "any" else per_conv["all"]
    want = set(sel[sel].index) if keep else set(sel[~sel].index)
    assert want and want != set(df["conv_id"]), "fixture must split convs"
    out = filter_conversations(ds, pred, mode=mode, keep=keep).to_pandas()
    got = set(out["conv_id"]) if len(out) else set()
    assert got == want
    # surviving conversations keep EVERY turn
    n_per = df.groupby("conv_id").size()
    assert len(out) == sum(n_per[c] for c in want)


def test_filter_conversations_all_mode_null_is_counterexample(ray_session):
    import ray

    from tenzir_ray.stages.transcripts import filter_conversations

    # conv "a": every turn has tool='x'; conv "b": one NULL tool turn.
    # SQL WHERE semantics: NULL is non-matching, so "all turns match"
    # must REJECT conv b (not-pred with null-dropping would keep it).
    tbl = pa.table({
        "conv_id": ["a", "a", "b", "b"],
        "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
        "tool": ["x", "x", "x", None],
    })
    out = filter_conversations(ray.data.from_arrow(tbl), "tool == 'x'",
                               mode="all", keep=True).to_pandas()
    assert set(out["conv_id"]) == {"a"}
    dropped = filter_conversations(ray.data.from_arrow(tbl), "tool == 'x'",
                                   mode="all", keep=False).to_pandas()
    assert set(dropped["conv_id"]) == {"b"}


def test_pack_conversations_rule(ray_session):
    from tenzir_ray.stages.transcripts import pack_conversations

    ds, rows = _transcripts(ray_session)
    df = pd.DataFrame(rows)
    toks = df["text"].str.split().str.len().groupby(df["conv_id"]).sum()
    toks = toks.sort_index()
    target = 15
    before = toks.cumsum().shift(fill_value=0)
    want = (before // target).astype(np.int64)
    out = (pack_conversations(ds, target).to_pandas()
           .set_index("conv_id").sort_index())
    assert list(out["conv_tokens"]) == list(toks)
    assert list(out["seq_id"]) == list(want)


def test_alternation_stats(ray_session):
    from tenzir_ray.stages.transcripts import alternation_stats

    ds, rows = _transcripts(ray_session)
    df = pd.DataFrame(rows)
    out = alternation_stats(ds).to_pandas().set_index("conv_id")
    for c, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        n_alt = int((g["role"] != g["role"].shift()).iloc[1:].sum())
        assert out.loc[c, "n_alt"] == n_alt
        assert out.loc[c, "alt_milli"] == 1000 * n_alt // (len(g) - 1)


def test_alternation_single_turn_null(ray_session):
    import ray

    from tenzir_ray.stages.transcripts import alternation_stats

    tbl = pa.table({
        "conv_id": ["a", "b", "b"],
        "turn_idx": pa.array([0, 0, 1], pa.int32()),
        "role": ["user", "user", "assistant"],
    })
    out = (alternation_stats(ray.data.from_arrow(tbl)).to_pandas()
           .set_index("conv_id"))
    assert pd.isna(out.loc["a", "alt_milli"])
    assert out.loc["b", "alt_milli"] == 1000


def test_pack_by_count_matches_manual(ray_session):
    import ray

    from tenzir_ray.stages.chunk import pack_by_count

    tbl = pa.table({"k": [f"k{i:02d}" for i in range(20)],
                    "n": [(i * 7) % 11 for i in range(20)]})
    out = (pack_by_count(ray.data.from_arrow(tbl).repartition(5), "k", "n", 9)
           .to_pandas().sort_values("k"))
    before = np.r_[0, np.cumsum(out["n"].to_numpy())[:-1]]
    assert list(out["seq_id"]) == list(before // 9)


def test_tql_transcript_ops(ray_session):
    from tenzir_ray.pipelines.tql import run_pipeline

    ds, rows = _transcripts(ray_session)
    df = pd.DataFrame(rows)
    out = run_pipeline("conversation_stats | where n_turns > 1 | sort conv_id",
                       ds=ds).to_pandas()
    assert list(out["conv_id"]) == sorted(df["conv_id"].unique())
    survivors = run_pipeline(
        "filter_conversations predicate=\"tool == 'tool_1'\" keep=false",
        ds=ds).to_pandas()
    flagged = set(df.loc[df["tool"] == "tool_1", "conv_id"])
    assert set(survivors["conv_id"]) == set(df["conv_id"]) - flagged


def test_registry_exposes_transcript_ops():
    from tenzir_ray.pipelines.pipeline import OPERATORS, _register_builtins

    if not OPERATORS:
        _register_builtins()
    ops = OPERATORS
    for name in ("conversation_stats", "tool_sequences",
                 "filter_conversations", "pack_conversations",
                 "alternation_stats", "pack_by_count"):
        assert name in ops


def test_sft_pairs(ray_session):
    from tenzir_ray.stages.transcripts import sft_pairs

    ds, rows = _transcripts(ray_session)
    out = (sft_pairs(ds).to_pandas()
           .sort_values(["conv_id", "turn_idx"], ignore_index=True))
    # reference: walk each conversation, remember last user text
    df = pd.DataFrame(rows).sort_values(["conv_id", "turn_idx"])
    want = []
    for c, g in df.groupby("conv_id"):
        last_user = None
        for _, r in g.iterrows():
            if r["role"] == "assistant":
                want.append((c, int(r["turn_idx"]), last_user, r["text"]))
            if r["role"] == "user":
                last_user = r["text"]
    assert len(out) == len(want)
    for (c, t, p, resp), (_, row) in zip(want, out.iterrows()):
        assert row["conv_id"] == c and row["turn_idx"] == t
        assert (row["prompt"] == p) or (p is None and pd.isna(row["prompt"]))
        assert row["response"] == resp
    # drop_unprompted removes NULL-prompt rows only
    kept = (sft_pairs(ds, drop_unprompted=True).to_pandas())
    assert len(kept) == sum(1 for w in want if w[2] is not None)
    assert not kept["prompt"].isna().any()


def test_turn_latency(ray_session):
    from tenzir_ray.stages.transcripts import turn_latency

    ds, rows = _transcripts(ray_session)
    out = turn_latency(ds).to_pandas().set_index("conv_id").sort_index()
    df = pd.DataFrame(rows)
    for c, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        gaps = g["ts"].diff().dropna().dt.total_seconds() * 1e6
        r = out.loc[c]
        assert r["n_turns"] == len(g)
        assert np.isclose(r["avg_gap_us"], gaps.mean())
        assert r["max_gap_us"] == gaps.max()
    # single-turn conversation: NULL gaps
    one = ray_session.data.from_items([{
        "conv_id": "solo", "turn_idx": np.int32(0),
        "ts": pd.Timestamp("2024-01-01"),
    }])
    o = turn_latency(one).to_pandas()
    assert o["n_turns"].tolist() == [1]
    assert o["avg_gap_us"].isna().all() and o["max_gap_us"].isna().all()


def test_sft_pairs_skips_null_text_user_turns(ray_session):
    """IGNORE NULLS: a user turn with NULL text must not blank out the
    prompt — the closest preceding user turn WITH text wins."""
    import ray.data

    from tenzir_ray.stages.transcripts import sft_pairs

    df = pd.DataFrame({
        "conv_id": ["c"] * 5,
        "turn_idx": [0, 1, 2, 3, 4],
        "role": ["user", "assistant", "user", "assistant", "assistant"],
        "text": ["hello", "hi", None, "resp1", "resp2"],
    })
    out = (sft_pairs(ray.data.from_pandas(df))
           .to_pandas().sort_values("turn_idx", ignore_index=True))
    assert out["prompt"].tolist() == ["hello", "hello", "hello"]
    assert out["response"].tolist() == ["hi", "resp1", "resp2"]

    # drop_unprompted keeps pairs whose earlier non-null prompt exists
    out2 = (sft_pairs(ray.data.from_pandas(df), drop_unprompted=True)
            .to_pandas())
    assert len(out2) == 3


def test_truncate_conversations_budget(ray_session):
    import ray.data

    from tenzir_ray.stages.transcripts import truncate_conversations

    df = pd.DataFrame({
        "conv_id": ["c"] * 4 + ["d"],
        "turn_idx": [0, 1, 2, 3, 0],
        "text": ["one two three", "four five", None, "six", "a b c d e f"],
    })
    # tail sums for c (tokens 3,2,0,1): t0=6 t1=3 t2=1 t3=1 → budget 3
    # keeps turns 1..3; d's only turn (6 tokens) overflows and drops
    out = (truncate_conversations(ray.data.from_pandas(df), max_tokens=3)
           .to_pandas().sort_values(["conv_id", "turn_idx"],
                                    ignore_index=True))
    assert list(zip(out.conv_id, out.turn_idx)) == \
        [("c", 1), ("c", 2), ("c", 3)]

    # count_col override wins over text tokenization
    df2 = df.assign(ntok=[1, 1, 1, 1, 1])
    out2 = (truncate_conversations(ray.data.from_pandas(df2), max_tokens=2,
                                   count_col="ntok")
            .to_pandas().sort_values(["conv_id", "turn_idx"],
                                     ignore_index=True))
    assert list(zip(out2.conv_id, out2.turn_idx)) == \
        [("c", 2), ("c", 3), ("d", 0)]
