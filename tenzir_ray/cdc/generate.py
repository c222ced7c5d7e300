"""Deterministic synthetic transcript + change-log generators (FIXTURES.md).

Pure functions of ``(seed, scale)``; all randomness through a seeded
``numpy.random.Generator`` and fully vectorized — no external data.

Table shape per BASELINE.json ``input_hint``:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[ns])``.

Change log (the synthetic binlog/WAL):
``(lsn: int64, op: string{insert,update,delete}, conv_id, turn_idx,
role, text, tool, ts, schema_ver: int32)``; op mix ≈ 70/20/10;
updates/deletes only target previously inserted keys; conversation
popularity is Zipf-distributed so a few conversations are hot (skew).
The rows in the emitted table are SHUFFLED (arrival order ≠ lsn order);
apply order must be decided by ``lsn``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_NS = 1_700_000_000 * 1_000_000_000  # fixed epoch (2023-11-14T22:13:20Z)

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "bash", "edit", "read", "fetch"])
_WORDS = np.array(
    (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
        "lima mike november oscar papa quebec romeo sierra tango uniform "
        "victor whiskey xray yankee zulu data stream batch arrow shuffle "
        "actor lake parquet commit manifest checkpoint lineage schema turn "
        "agent transcript tool query filter sort merge upsert binlog"
    ).split()
)
_LANGS = np.array(["en", "de", "fr", "es", "pt", "nl"])


def _texts(rng: np.random.Generator, n: int, min_words: int = 3, max_words: int = 24) -> pa.Array:
    """n deterministic pseudo-sentences, byte-stable across runs.

    Fully vectorized: the Arrow string array is assembled straight from an
    offsets buffer + one byte blob (no per-row Python join) — ~20x faster
    than a join loop, which matters for 10^7-event bench logs."""
    vocab = pa.array([w + " " for w in _WORDS], pa.string())

    def chunk(m: int) -> pa.Array:
        lens = rng.integers(min_words, max_words + 1, size=m)
        total = int(lens.sum())
        word_idx = rng.integers(0, len(_WORDS), size=total)
        flat = vocab.take(pa.array(word_idx, pa.int32()))  # C take
        row_off = np.zeros(m + 1, dtype=np.int32)
        np.cumsum(lens, out=row_off[1:])
        lists = pa.ListArray.from_arrays(pa.array(row_off, pa.int32()), flat)
        return pa.compute.binary_join(lists, "")  # vectorized join

    # chunk so byte offsets stay within int32 (string arrays cap at 2 GiB)
    step = 2_000_000
    if n <= step:
        return chunk(n)
    return pa.chunked_array(
        [chunk(min(step, n - s)) for s in range(0, n, step)]
    )


def _conv_ids(idx: np.ndarray) -> np.ndarray:
    return np.char.add("conv-", np.char.zfill(idx.astype("U8"), 8))


def gen_transcripts(n_convs: int = 100, seed: int = 42, mean_turns: int = 8) -> pa.Table:
    """Base lake table of multi-turn transcripts, ordered by (conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)
    turns = rng.integers(1, 2 * mean_turns, size=n_convs)
    conv_idx = np.repeat(np.arange(n_convs), turns)
    turn_idx = np.concatenate([np.arange(t) for t in turns]).astype(np.int32)
    n = len(conv_idx)
    roles = _ROLES[turn_idx % 3]
    tool = np.where(roles == "tool", _TOOLS[rng.integers(0, len(_TOOLS), size=n)], None)
    ts = EPOCH_NS + conv_idx * 3_600_000_000_000 + turn_idx.astype(np.int64) * 30_000_000_000
    return pa.table(
        {
            "conv_id": pa.array(_conv_ids(conv_idx), pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": _texts(rng, n),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("ns")),
        }
    )


def gen_changes(
    n_events: int = 10_000,
    seed: int = 42,
    n_convs: int | None = None,
    schema_evolution: bool = False,
    evolution_frac: float = 0.5,
    zipf_a: float = 1.3,
) -> pa.Table:
    """A shuffled change log of ``n_events`` insert/update/delete events.

    Generation order defines ``lsn`` (dense 0..n-1): first all inserts in
    (conv, turn) creation order, then updates/deletes over the inserted
    keys with Zipf-hot conversations. The returned table's ROW ORDER is a
    seeded permutation of lsn order.

    With ``schema_evolution=True``, events with
    ``lsn >= evolution_frac * n_events`` carry ``schema_ver=2`` plus an
    additive column ``lang`` (v1 rows → null); the engine's registry must
    also widen ``turn_idx`` int32→int64 (the v2 payload semantics).
    """
    rng = np.random.default_rng(seed + 1)
    n_ins = max(1, int(n_events * 0.7))
    n_upd = int(n_events * 0.2)
    n_del = n_events - n_ins - n_upd
    if n_convs is None:
        n_convs = max(1, n_ins // 10)

    # --- inserts: keys are (conv, turn) with turns dealt round-robin-ish ---
    conv_of_ins = rng.integers(0, n_convs, size=n_ins)
    # turn_idx = running count of prior inserts in the same conversation
    order = np.argsort(conv_of_ins, kind="stable")
    grp_start = np.zeros(n_ins, dtype=bool)
    grp_start[0] = True
    sorted_conv = conv_of_ins[order]
    grp_start[1:] = sorted_conv[1:] != sorted_conv[:-1]
    idx_in_grp = np.arange(n_ins) - np.maximum.accumulate(np.where(grp_start, np.arange(n_ins), 0))
    turn_of_ins = np.empty(n_ins, dtype=np.int64)
    turn_of_ins[order] = idx_in_grp

    # --- updates/deletes target inserted keys; Zipf-hot conversations ---
    n_mut = n_upd + n_del
    zipf_w = 1.0 / np.power(np.arange(1, n_convs + 1, dtype=np.float64), zipf_a)
    zipf_w /= zipf_w.sum()
    # hot conv ranks are a seeded permutation of conv ids
    hot_perm = rng.permutation(n_convs)
    conv_of_mut = hot_perm[rng.choice(n_convs, size=n_mut, p=zipf_w)]
    # pick an existing turn for that conversation: random in [0, n_turns(conv))
    turns_per_conv = np.bincount(conv_of_ins, minlength=n_convs)
    tpc = np.maximum(turns_per_conv[conv_of_mut], 1)
    turn_of_mut = (rng.random(n_mut) * tpc).astype(np.int64)
    # conversations with zero inserts: retarget to conv 0 turn 0 (rare)
    none_mask = turns_per_conv[conv_of_mut] == 0
    conv_of_mut[none_mask] = conv_of_ins[0]
    turn_of_mut[none_mask] = 0

    conv = np.concatenate([conv_of_ins, conv_of_mut])
    turn = np.concatenate([turn_of_ins, turn_of_mut])
    op = np.concatenate(
        [
            np.repeat("insert", n_ins),
            np.repeat("update", n_upd),
            np.repeat("delete", n_del),
        ]
    )
    # shuffle the mutation tail so updates/deletes interleave (lsn order)
    mut_perm = rng.permutation(n_mut)
    conv[n_ins:] = conv[n_ins:][mut_perm]
    turn[n_ins:] = turn[n_ins:][mut_perm]
    op[n_ins:] = op[n_ins:][mut_perm]

    n = n_events
    # arrival order is shuffled; lsn decides apply order. Permute the key
    # arrays BEFORE building payload columns — permuting ints is free,
    # while a full-table take over big string columns is superlinear.
    arrival = rng.permutation(n)
    lsn = arrival.astype(np.int64)  # row i carries lsn = arrival[i]
    conv = conv[arrival]
    turn = turn[arrival]
    op = op[arrival]
    is_del = op == "delete"
    roles = _ROLES[turn % 3]
    tool = np.where(roles == "tool", _TOOLS[rng.integers(0, len(_TOOLS), size=n)], None)
    text = _texts(rng, n)
    ts = EPOCH_NS + conv * 3_600_000_000_000 + turn * 30_000_000_000 + lsn
    # deletes carry null payloads
    del_mask = pa.array(is_del)
    roles = np.where(is_del, None, roles)
    text_arr = pa.compute.if_else(del_mask, pa.scalar(None, pa.string()), text)
    tool = np.where(is_del, None, tool)
    ts_arr = pa.compute.if_else(
        del_mask, pa.scalar(None, pa.timestamp("ns")), pa.array(ts, pa.timestamp("ns"))
    )

    cols: dict[str, pa.Array] = {
        "lsn": pa.array(lsn, pa.int64()),
        "op": pa.array(op, pa.string()),
        "conv_id": pa.array(_conv_ids(conv), pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": text_arr,
        "tool": pa.array(tool, pa.string()),
        "ts": ts_arr,
        "schema_ver": pa.array(np.ones(n, dtype=np.int32), pa.int32()),
    }
    tbl = pa.table(cols)

    if schema_evolution:
        cut = int(evolution_frac * n_events)
        v2 = lsn >= cut
        lang = np.where(v2 & ~is_del, _LANGS[rng.integers(0, len(_LANGS), size=n)], None)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("schema_ver"),
            "schema_ver",
            pa.array(np.where(v2, 2, 1).astype(np.int32), pa.int32()),
        )
        tbl = tbl.set_column(
            tbl.schema.get_field_index("turn_idx"), "turn_idx", tbl["turn_idx"].cast(pa.int64())
        )
        tbl = tbl.append_column("lang", pa.array(lang, pa.string()))

    return tbl
