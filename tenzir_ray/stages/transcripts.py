"""Conversation-level operators over transcript tables — the payload this
engine's CDC lake ingests (columns ``conv_id, turn_idx, role, text, tool,
ts``; see BASELINE input_hint). The reference's unit of work is the event
and it has no conversation verbs (closest analog: ``summarize`` grouping,
``libtenzir/builtins/operators/summarize.cpp``); these compose the
engine's scale primitives — partial-aggregate summarize, the grouped
exchange, semi/anti hash join, per-group ordered windows — into the
conversation-shaped operations a training-data pipeline over transcripts
runs between ingest and tokenization:

- :func:`conversation_stats` — per-conversation shape/volume profile
  (turn count, tool-call count, char volume, time span). Shuffle-free:
  per-batch derived columns + the combiner-decomposable summarize path.
- :func:`tool_sequences` — the ordered tool-call chain per conversation
  (agent-trace analysis). One grouped exchange on ``conv_id``.
- :func:`filter_conversations` — keep/drop WHOLE conversations by a
  turn-level predicate (any/all semantics): the flagged-turn removal
  shape. Expressed as a semi/anti hash join against the (per-batch
  deduplicated) matching conversation ids, so it never materializes the
  id set on the driver and survives an arbitrarily large match set.
- :func:`pack_conversations` — assign conversations to fixed-token
  training windows WITHOUT splitting a conversation across windows
  (conversation-boundary sequence packing; same deterministic rule as
  :func:`~tenzir_ray.stages.chunk.pack_sequences`).
- :func:`alternation_stats` — per-conversation role-alternation profile
  (dialog-quality heuristic: a healthy multi-turn conversation switches
  speakers; long single-role runs signal scraped or degenerate data).
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value


def conversation_stats(ds, conv_col: str = "conv_id",
                       turn_col: str = "turn_idx", text_col: str = "text",
                       tool_col: str = "tool", ts_col: str = "ts"):
    """Per-conversation profile: ``n_turns``, ``n_tool_calls`` (non-null
    ``tool``), ``total_chars`` (unicode chars of ``text``), ``first_ts``
    / ``last_ts``, ``max_turn``. All aggregates are combiner-decomposable
    so this runs the shuffle-free partial-summarize path: one vectorized
    derive per batch, per-batch combine, tiny final merge."""
    from tenzir_ray.stages.summarize import summarize

    def _derive(t: pa.Table) -> pa.Table:
        chars = pc.fill_null(pc.utf8_length(t.column(text_col)), 0)
        return pa.table({
            conv_col: t.column(conv_col),
            "_turn": t.column(turn_col),
            "_ts": t.column(ts_col),
            "_chars": pc.cast(chars, pa.int64()),
            "_tool": pc.cast(pc.is_valid(t.column(tool_col)), pa.int64()),
        })

    return summarize(
        ds.map_batches(_derive, batch_format="pyarrow"),
        by=conv_col,
        n_turns="count(*)",
        n_tool_calls="sum(_tool)",
        total_chars="sum(_chars)",
        first_ts="min(_ts)",
        last_ts="max(_ts)",
        max_turn="max(_turn)",
    )


def tool_sequences(ds, conv_col: str = "conv_id", turn_col: str = "turn_idx",
                   tool_col: str = "tool", sep: str = "->",
                   buckets: int | None = None):
    """Ordered tool-call chain per conversation: drop non-tool turns,
    then render ``tool_chain`` = the ``tool`` values joined by ``sep``
    in ``turn_col`` order, plus ``n_calls``. Conversations with no tool
    calls are absent (same as a SQL inner GROUP BY after the filter).

    Scale shape: the projection+filter shrinks the exchange payload to
    three columns of tool turns only; one grouped exchange on
    ``conv_col``; per-task vectorized sort + C groupby join."""
    import pandas as pd

    from tenzir_ray.stages.exchange import grouped_apply

    def _prune(t: pa.Table) -> pa.Table:
        t = t.select([conv_col, turn_col, tool_col])
        return t.filter(pc.is_valid(t.column(tool_col)))

    def _render(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values([conv_col, turn_col], kind="mergesort")
        return (
            bucket.groupby(conv_col, as_index=False, sort=False)
            .agg(n_calls=(turn_col, "size"), tool_chain=(tool_col, sep.join))
        )

    pruned = ds.map_batches(_prune, batch_format="pyarrow")
    return grouped_apply(pruned, [conv_col], _render, num_buckets=buckets,
                         tag="toolseq")


def filter_conversations(ds, predicate: str, conv_col: str = "conv_id",
                         mode: str = "any", keep: bool = True, **join_kw):
    """Keep or drop WHOLE conversations by a turn-level predicate
    (expression-language string, same grammar as ``where``).

    ``mode="any", keep=True``  → keep conversations where ANY turn
    matches (semi join); ``keep=False`` drops them (anti join — the
    flagged-turn removal shape). ``mode="all", keep=True`` → keep
    conversations where EVERY turn matches (anti join against the
    conversations owning a counter-example); ``keep=False`` inverts.
    Null predicate results count as non-matching, like SQL WHERE — in
    all-mode a null-predicate turn is therefore a counter-example (the
    complement mask, NOT ``where(not pred)``, which would drop nulls
    from both sides).

    Scale shape: the matching turn stream is projected to ``conv_col``
    and deduplicated per batch, then a semi/anti hash join over the
    packed exchange co-partitions it with the input — the id set never
    lands on the driver, so a 100 TB corpus with a billion flagged
    conversations costs one exchange, not a broadcast."""
    from tenzir_ray.stages.join import hash_join
    from tenzir_ray.stages.transforms import where

    if mode not in ("any", "all"):
        raise ValueError(f"filter_conversations: mode {mode!r} not in any/all")
    semi = keep if mode == "any" else not keep

    def _keys(t: pa.Table) -> pa.Table:
        # per-batch dedup shrinks the exchange; semi/anti joins are
        # correct under duplicate right keys regardless
        return t.select([conv_col]).group_by(conv_col).aggregate([])

    if mode == "any":
        flagged = where(ds, predicate)
    else:
        # counter-examples = rows NOT kept by the predicate, INCLUDING
        # null-predicate rows (SQL WHERE: null is non-matching)
        from tenzir_ray.expr import compile_filter

        compiled = compile_filter(predicate)

        def _counter(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(~compiled.mask(t)))

        flagged = ds.map_batches(_counter, batch_format="pyarrow")
    flagged = flagged.map_batches(_keys, batch_format="pyarrow")
    if flagged.schema() is None:
        # Ray drops the schema of an all-empty pipeline: no turn matched
        # anywhere, so the semi result is empty and the anti result is
        # the input unchanged (cheaper than special-casing the join)
        return ds.limit(0) if semi else ds
    return hash_join(ds, flagged, on=conv_col,
                     how="semi" if semi else "anti", **join_kw)


def pack_conversations(ds, target_tokens: int, conv_col: str = "conv_id",
                       text_col: str = "text", out: str = "seq_id"):
    """Conversation-boundary sequence packing: sum whitespace-token
    counts per conversation, then assign each WHOLE conversation to a
    training window by the sequential packing rule ``seq_id =
    floor(cum_tokens_before / target_tokens)`` over ``conv_col`` order
    (the same deterministic, SQL-reconstructable rule as
    :func:`~tenzir_ray.stages.chunk.pack_sequences`, at conversation
    granularity — a conversation never splits across windows).
    Returns one row per conversation: ``(conv_col, conv_tokens, out)``.

    Scale shape: token counting + per-conv totals run the shuffle-free
    partial-summarize path; the packing pass then operates on the
    one-row-per-conversation table (range sort + per-block prefix sums,
    no driver data pass)."""
    from tenzir_ray.stages.chunk import pack_by_count
    from tenzir_ray.stages.summarize import summarize

    def _tokens(t: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.count_substring_regex(t.column(text_col), r"\S+"), 0)
        return pa.table({conv_col: t.column(conv_col),
                         "_tok": pc.cast(n, pa.int64())})

    per = summarize(ds.map_batches(_tokens, batch_format="pyarrow"),
                    by=conv_col, conv_tokens="sum(_tok)")
    return pack_by_count(per, order_by=conv_col, count_col="conv_tokens",
                         target=target_tokens, out=out)


def alternation_stats(ds, conv_col: str = "conv_id",
                      turn_col: str = "turn_idx", role_col: str = "role"):
    """Per-conversation role-alternation profile: ``n_turns``, ``n_alt``
    (turns whose role differs from the previous turn's, in ``turn_col``
    order), and ``alt_milli`` = ``floor(1000 * n_alt / (n_turns - 1))``
    (null for single-turn conversations) — the dialog-quality heuristic
    that separates real multi-turn exchanges from single-role dumps.

    Scale shape: one per-group ordered lag (grouped exchange via
    ``window_shift``), a vectorized compare, then the shuffle-free
    partial-summarize merge."""
    from tenzir_ray.stages.summarize import summarize
    from tenzir_ray.stages.window import window_shift

    sel = ds.select_columns([conv_col, turn_col, role_col])
    sh = window_shift(sel, by=conv_col, order_by=turn_col, column=role_col,
                      periods=1, out="_prev")

    def _alt(t: pa.Table) -> pa.Table:
        alt = pc.and_kleene(pc.is_valid(t.column("_prev")),
                            pc.not_equal(t.column(role_col), t.column("_prev")))
        return pa.table({
            conv_col: t.column(conv_col),
            "_alt": pc.cast(pc.fill_null(alt, False), pa.int64()),
        })

    agg = summarize(sh.map_batches(_alt, batch_format="pyarrow"),
                    by=conv_col, n_turns="count(*)", n_alt="sum(_alt)")

    def _ratio(t: pa.Table) -> pa.Table:
        n = t.column("n_turns")
        a = pc.cast(t.column("n_alt"), pa.int64())
        denom = pc.max_element_wise(pc.subtract(pc.cast(n, pa.int64()), 1),
                                    pa.scalar(1, pa.int64()))
        milli = pc.divide(pc.multiply(a, 1000), denom)
        milli = pc.if_else(pc.greater(n, 1), milli, pa.scalar(None, pa.int64()))
        return t.append_column("alt_milli", milli)

    return agg.map_batches(_ratio, batch_format="pyarrow")


def context_windows(ds, k: int = 3, sep: str = "\n",
                    conv_col: str = "conv_id", turn_col: str = "turn_idx",
                    text_col: str = "text", out: str = "context",
                    buckets: int | None = None):
    """SFT context assembly: attach to every turn the concatenation of
    its previous ``k`` turns' texts (within the conversation, in
    ``turn_col`` order, ``sep``-joined) — the sliding context window a
    supervised-fine-tuning pipeline feeds next to each target turn.
    Turns with no predecessors get NULL (SQL ``string_agg OVER (ROWS k
    PRECEDING AND 1 PRECEDING)`` semantics, oracle-verified).

    Scale shape: one grouped exchange on ``conv_col`` (conversations
    stay whole per task), then k vectorized group-shifts — no per-row
    Python, no driver pass."""
    import pandas as pd

    if k < 1:
        raise ValueError("context_windows: k must be >= 1")

    def _ctx(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[out] = pd.Series([], dtype=object)
            return df
        df = df.sort_values([conv_col, turn_col], kind="mergesort")
        g = df.groupby(conv_col, sort=False)
        acc = pd.Series("", index=df.index, dtype=object)
        started = np.zeros(len(df), dtype=bool)
        for j in range(k, 0, -1):
            s = g[text_col].shift(j)
            have = s.notna().to_numpy()
            joined = np.where(started & have,
                              (acc + sep).to_numpy(dtype=object), acc)
            acc = pd.Series(joined, index=df.index, dtype=object)
            acc = acc.where(~have, acc + s.fillna(""))
            started |= have
        df[out] = acc.where(started, None)
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, [conv_col], _ctx, num_buckets=buckets,
                         tag="ctxwin")


def sft_pairs(ds, conv_col: str = "conv_id", turn_col: str = "turn_idx",
              role_col: str = "role", text_col: str = "text",
              user_role: str = "user", assistant_role: str = "assistant",
              drop_unprompted: bool = False, buckets: int | None = None):
    """(prompt, response) pair extraction for SFT: one row per
    ``assistant_role`` turn, with ``prompt`` = the text of the CLOSEST
    PRECEDING ``user_role`` turn in the conversation (tool/system turns
    in between are skipped) and ``response`` = the assistant text.
    Assistant turns with no preceding user turn get a NULL prompt
    (SQL ``last_value(... IGNORE NULLS) OVER (ROWS ... 1 PRECEDING)``
    semantics) unless ``drop_unprompted=True`` drops them.

    Scale shape: projection to four columns, one grouped exchange on
    ``conv_col``, then a vectorized prev-user pointer pass
    (``np.maximum.accumulate`` with per-conversation resets) — no
    per-row Python."""
    import pandas as pd

    def _prune(t: pa.Table) -> pa.Table:
        return t.select([conv_col, turn_col, role_col, text_col])

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = [conv_col, turn_col, "prompt", "response"]
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in out_cols})
        df = df.sort_values([conv_col, turn_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        gid = df.groupby(conv_col, sort=False).ngroup().to_numpy()
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        row_start = np.repeat(starts, np.diff(np.append(starts, n)))
        # IGNORE NULLS: a user turn with null text is skipped, the
        # pointer keeps the last user turn that HAS text
        is_user = ((df[role_col] == user_role)
                   & df[text_col].notna()).to_numpy()
        src = np.maximum.accumulate(np.where(is_user, np.arange(n), -1))
        has_prompt = src >= row_start
        text = df[text_col].to_numpy(dtype=object)
        prompt = np.where(has_prompt, text[np.maximum(src, 0)], None)
        take = (df[role_col] == assistant_role).to_numpy()
        if drop_unprompted:
            take &= has_prompt
        out = pd.DataFrame({
            conv_col: df[conv_col].to_numpy()[take],
            turn_col: df[turn_col].to_numpy()[take],
            "prompt": prompt[take],
            "response": text[take],
        })
        return out

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds.map_batches(_prune, batch_format="pyarrow"),
                         [conv_col], _pairs, num_buckets=buckets,
                         tag="sftpairs")


def turn_latency(ds, conv_col: str = "conv_id", turn_col: str = "turn_idx",
                 ts_col: str = "ts", buckets: int | None = None):
    """Per-conversation inter-turn latency profile: the gap between
    consecutive turns (by ``turn_col`` order) in EXACT microseconds,
    aggregated to ``n_turns, avg_gap_us, max_gap_us`` per conversation —
    the agent-responsiveness / scrape-cadence signal a transcript
    curation pipeline filters on. Single-turn conversations get NULL
    gaps (count 0 → SQL avg/max NULL).

    Composes the engine's own primitives: one grouped exchange for the
    ordered lag (:func:`~tenzir_ray.stages.window.window_shift`), a
    stateless Arrow timestamp subtraction, then the
    combiner-decomposable summarize — exact int64 microseconds end to
    end, so results hash-match SQL ``date_diff`` oracles."""
    from tenzir_ray.stages.summarize import summarize
    from tenzir_ray.stages.window import window_shift

    def _prune(t: pa.Table) -> pa.Table:
        return t.select([conv_col, turn_col, ts_col])

    sh = window_shift(ds.map_batches(_prune, batch_format="pyarrow"),
                      by=conv_col, order_by=turn_col, column=ts_col,
                      periods=1, out="_prev_ts", buckets=buckets)

    def _gap(t: pa.Table) -> pa.Table:
        us = pc.cast(
            pc.subtract(pc.cast(t.column(ts_col), pa.timestamp("us")),
                        pc.cast(t.column("_prev_ts"), pa.timestamp("us"))),
            pa.int64())
        return t.append_column("_gap_us", us)

    gaps = sh.map_batches(_gap, batch_format="pyarrow")
    return summarize(gaps, by=conv_col, n_turns="count(*)",
                     avg_gap_us="mean(_gap_us)", max_gap_us="max(_gap_us)")


def truncate_conversations(ds, max_tokens: int,
                           conv_col: str = "conv_id",
                           turn_col: str = "turn_idx",
                           text_col: str = "text",
                           count_col: str | None = None,
                           buckets: int | None = None):
    """Context-window fitting: per conversation, keep the MOST RECENT
    turns whose cumulative token count fits ``max_tokens`` — the
    standard SFT-prep truncation (drop the oldest turns first, never
    split a turn). A turn is kept iff the token sum from it THROUGH the
    conversation's end is ≤ the budget, so a single over-budget final
    turn drops too (strict rule; pre-chunk with ``chunk_documents`` if
    that matters). Tokens default to RE2-``\\s``-delimited words of
    ``text_col`` (null text counts 0, matching a ``coalesce(len(...),
    0)`` SQL oracle); pass ``count_col`` to reuse a precomputed count
    (e.g. the ``token_count`` stage or a BPE length).

    Scale shape: one grouped exchange on ``conv_col``, per task a sort
    + reversed ``np.cumsum`` — no per-row Python."""
    import pandas as pd

    from tenzir_ray.stages.exchange import grouped_apply

    def _t(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values([conv_col, turn_col],
                            kind="mergesort").reset_index(drop=True)
        if count_col is not None:
            n = df[count_col].fillna(0).to_numpy(dtype=np.int64)
        else:
            n = (df[text_col].fillna("")
                 .str.count(r"[^ \t\n\f\r]+")
                 .to_numpy(dtype=np.int64))
        gid = df.groupby(conv_col, sort=False).ngroup().to_numpy()
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        # reverse cumulative sum with per-conversation resets: total
        # from each row through its conversation's end
        ends = np.append(starts[1:], len(df))
        total = np.add.reduceat(n, starts)
        csum = np.cumsum(n) - n  # sum strictly before each row
        before_conv = np.repeat(np.cumsum(np.r_[0, total[:-1]]),
                                ends - starts)
        tail_sum = np.repeat(total, ends - starts) - (csum - before_conv)
        return df.loc[tail_sum <= max_tokens].reset_index(drop=True)

    return grouped_apply(ds, [conv_col], _t, num_buckets=buckets,
                         tag="truncconv")


def render_chat(ds, conv_col: str = "conv_id", turn_col: str = "turn_idx",
                role_col: str = "role", text_col: str = "text",
                buckets: int | None = None):
    """ChatML-shaped assembly: one row per conversation with
    ``messages = [{"role": r, "content": c}, ...]`` in turn order —
    the standard SFT exchange format. Same grouped-exchange shape as
    :func:`~tenzir_ray.stages.chunk.assemble_conversations`; the
    per-row dict build is the unavoidable JSON-boundary cost and is
    bounded by conversation length per task."""
    import pandas as pd

    from tenzir_ray.stages.exchange import grouped_apply

    def _render(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values([conv_col, turn_col], kind="mergesort")
        roles = bucket[role_col].fillna("").to_numpy(dtype=object)
        texts = bucket[text_col].fillna("").to_numpy(dtype=object)
        bucket = bucket.assign(
            _m=[{"role": r, "content": c} for r, c in zip(roles, texts)])
        # dropna=False: a null conversation id is still a group (SQL
        # GROUP BY semantics) — silently losing those turns from an
        # export would be invisible data loss
        return (bucket.groupby(conv_col, as_index=False, sort=False,
                               dropna=False)
                .agg(n_turns=(turn_col, "size"), messages=("_m", list)))

    return grouped_apply(ds, [conv_col], _render, num_buckets=buckets,
                         tag="chat")


def render_chat_text(ds, conv_col: str = "conv_id",
                     turn_col: str = "turn_idx", role_col: str = "role",
                     text_col: str = "text",
                     mask_role: str = "assistant",
                     buckets: int | None = None):
    """Flat-text SFT rendering WITH loss spans: one row per
    conversation with ``text`` = the ChatML-style concatenation
    ``<|im_start|>{role}\\n{content}<|im_end|>\\n`` per turn (turn
    order) and ``span_starts``/``span_ends`` = the 0-based codepoint
    ranges of every ``mask_role`` turn's CONTENT — the regions an
    assistant-only loss masks in. Offsets are pure length arithmetic
    over the turn texts, so they are partitioning-independent and
    SQL-reproducible (window sums). Null role/text render as empty
    strings (null-role turns never match ``mask_role``).

    Shape: one grouped exchange on ``conv_col``; per-task work is a
    vectorized length/cumsum pass + one join per conversation."""
    import pandas as pd

    from tenzir_ray.stages.exchange import grouped_apply

    def _render(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values([conv_col, turn_col], kind="mergesort",
                               ignore_index=True)
        if not len(b):
            return pd.DataFrame({
                conv_col: bucket[conv_col],
                "n_turns": pd.Series([], dtype=np.int64),
                "text": pd.Series([], dtype=object),
                "span_starts": pd.Series([], dtype=object),
                "span_ends": pd.Series([], dtype=object),
            })
        roles = b[role_col].astype(object).where(
            b[role_col].notna(), "").astype(str)
        texts = b[text_col].astype(object).where(
            b[text_col].notna(), "").astype(str)
        seg = "<|im_start|>" + roles + "\n" + texts + "<|im_end|>\n"
        seglen = seg.str.len().to_numpy(np.int64)
        gid = (b.groupby(conv_col, dropna=False, sort=False).ngroup()
               .to_numpy())
        # rendered-prefix length BEFORE each turn, within conversation
        cs = np.cumsum(seglen)
        first = np.r_[True, gid[1:] != gid[:-1]]
        counts = np.diff(np.r_[np.flatnonzero(first), len(gid)])
        grp_base = np.repeat(cs[first] - seglen[first], counts)
        before = cs - seglen - grp_base
        starts = before + 13 + roles.str.len().to_numpy(np.int64)
        ends = starts + texts.str.len().to_numpy(np.int64)
        is_mask = (b[role_col] == mask_role).fillna(False).to_numpy(bool)

        firsts = np.flatnonzero(first)
        conv_vals = b[conv_col].to_numpy(dtype=object)[firsts]
        segs = seg.to_numpy(dtype=object)
        out_text, out_ss, out_ee = [], [], []
        for g0, cnt in zip(firsts, counts):
            sl = slice(g0, g0 + cnt)
            out_text.append("".join(segs[sl]))
            m = is_mask[sl]
            out_ss.append(starts[sl][m].tolist())
            out_ee.append(ends[sl][m].tolist())
        return pd.DataFrame({
            conv_col: pd.Series(conv_vals, dtype=bucket[conv_col].dtype),
            "n_turns": pd.Series(counts, dtype=np.int64),
            "text": out_text,
            "span_starts": out_ss,
            "span_ends": out_ee,
        })

    return grouped_apply(ds, [conv_col], _render, num_buckets=buckets,
                         tag="chat_text")


class _JsonlWriter:
    """One JSONL part file per block (temp-write + rename, like the
    parquet/warc sinks)."""

    def __init__(self, path: str, columns: "list[str] | None"):
        self.path = path
        self.columns = columns

    __name__ = "_JsonlWriter"

    def __call__(self, batch):
        import json
        import os
        import uuid

        import pandas as pd
        import pyarrow as pa

        df = batch if isinstance(batch, pd.DataFrame) else batch.to_pandas()
        if self.columns:
            df = df[self.columns]
        rel = f"part-{uuid.uuid4().hex[:12]}.jsonl"
        tmp = os.path.join(self.path, rel + ".tmp")

        def _jsonable(v):
            # numpy containers arrive when a block crossed a pandas →
            # Arrow conversion; anything else unexpected must FAIL, not
            # silently stringify into the training data
            import numpy as _np

            if isinstance(v, _np.ndarray):
                return [_jsonable(x) for x in v.tolist()]
            if isinstance(v, _np.generic):
                return _jsonable(v.item())
            if isinstance(v, dict):
                return {k: _jsonable(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [_jsonable(x) for x in v]
            if isinstance(v, float):
                # json.dumps would emit bare NaN/Infinity — not valid
                # JSON, rejected by strict parsers downstream
                import math as _math

                return v if _math.isfinite(v) else None
            if v is None or isinstance(v, (str, int, bool)):
                return v
            if pd.isna(v):
                return None
            raise TypeError(
                f"write_sft_jsonl: cell of type {type(v).__name__} is "
                "not JSON-representable")

        with open(tmp, "w", encoding="utf-8") as f:
            for rec in df.to_dict("records"):
                f.write(json.dumps({k: _jsonable(v)
                                    for k, v in rec.items()},
                                   ensure_ascii=False) + "\n")
        os.replace(tmp, os.path.join(self.path, rel))
        return pa.table({"path": pa.array([rel]),
                         "rows": pa.array([len(df)], pa.int64())})


def write_sft_jsonl(ds, path: str, conv_col: str = "conv_id",
                    turn_col: str = "turn_idx", role_col: str = "role",
                    text_col: str = "text",
                    batch_size: int | None = None):
    """Conversations → chat-format JSONL (one ``{"conv_id", "n_turns",
    "messages": [{role, content}, ...]}`` object per line) — the
    hand-off format SFT trainers ingest. Renders via
    :func:`render_chat`, then one part file per block (resumable sink
    layout). Returns per-file stats."""
    import os

    os.makedirs(path, exist_ok=True)
    rendered = render_chat(ds, conv_col, turn_col, role_col, text_col)
    return rendered.map_batches(
        _JsonlWriter(path, [conv_col, "n_turns", "messages"]),
        batch_format="pandas", batch_size=batch_size).to_pandas()


ship_by_value(sys.modules[__name__])
