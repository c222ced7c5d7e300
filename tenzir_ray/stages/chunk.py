"""Document chunking and sequence packing — the two shaping stages a
training-data pipeline runs between cleaning/dedup and tokenization.
Beyond the reference's operator surface (its unit is the event, never a
token window); both use deterministic, SQL-reconstructable rules so the
DuckDB oracle can verify them exactly.

- :func:`chunk_documents` — fixed-size sliding character windows with
  overlap: chunk ``i`` of a document is ``text[i*stride : i*stride+size]``
  with ``stride = size - overlap`` and
  ``n_chunks = max(1, ceil((len - overlap) / stride))`` (SQL:
  ``substr(text, i*stride+1, size)`` × ``generate_series``). The explode
  bookkeeping (repeat + within-group arange) is vectorized; the chunk
  extraction itself is one C-level slice per chunk — the memcpy IS the
  work, there is no batch kernel that beats it.

- :func:`pack_sequences` — assign documents to fixed-token-budget
  training sequences by GLOBAL cumulative token count over a total
  order: ``seq_id = floor(cum_tokens_before / target)`` (the sequential
  packing rule; SQL window ``sum() OVER (ORDER BY … 1 PRECEDING)``).
  Exact two-pass range-bucket cumsum, no global sort — the same shape as
  ``enumerate_global`` (transforms.py) with per-bucket SUMS instead of
  counts: bucket offsets broadcast from the driver, each bucket then
  sorts only its own rows.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value


from tenzir_ray.nputil import within_group_arange as _within


def chunk_documents(ds, column: str = "text", size: int = 512,
                    overlap: int = 64, out_index: str = "chunk_idx",
                    batch_size: int | None = 2048):
    """Explode each document into overlapping character windows: the
    ``column`` value is replaced by the chunk text and ``out_index``
    (0-based) is appended; all other columns repeat per chunk. Every
    document yields ≥1 chunk (an empty/short text is one short chunk),
    so no rows silently vanish."""
    if not 0 <= overlap < size:
        raise ValueError("chunk_documents: need 0 <= overlap < size")
    stride = size - overlap

    def _chunk(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        if n_rows == 0:
            out = batch.append_column(out_index, pa.array([], pa.int64()))
            return out
        lens = pc.fill_null(pc.utf8_length(batch.column(column)), 0)
        lens = lens.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.maximum(1, np.ceil((lens - overlap) / stride)).astype(np.int64)
        rep = np.repeat(np.arange(n_rows, dtype=np.int64), n)
        ci = _within(n)
        starts = ci * stride
        col_i = batch.schema.get_field_index(column)
        # repeat only the NON-text columns; slicing chunks straight from
        # the un-repeated texts keeps memory at output size — a
        # batch.take on the text column would copy each FULL document
        # once per chunk (O(len²/stride) for one long document)
        others = batch.remove_column(col_i).take(pa.array(rep))
        texts = batch.column(column).to_pylist()  # once per doc
        chunks = pa.array(
            [None if texts[r] is None else texts[r][s:s + size]
             for r, s in zip(rep, starts)],
            pa.string(),
        )
        out = others.add_column(min(col_i, others.num_columns), column,
                                chunks)
        return out.append_column(out_index, pa.array(ci))

    return ds.map_batches(_chunk, batch_format="pyarrow",
                          batch_size=batch_size)


def pack_sequences(ds, order_by: str, target_tokens: int,
                   column: str = "text", out: str = "seq_id"):
    """Append ``out`` = training-sequence id under the sequential packing
    rule ``seq_id = floor(cum_tokens_before / target_tokens)``, where
    token counts are whitespace tokens of ``column`` (the same rule as
    ``token_count``'s ``ws_tokens``) and the cumulative sum runs over
    the total order given by the numeric ``order_by`` key.

    Scale shape: one range sort (Ray's distributed sort — the sequence
    order has to exist physically anyway for downstream tokenization),
    then a tiny per-block token-sum pass (one row per block to the
    driver), a driver-side block prefix sum, and a final per-block
    vectorized cumsum + broadcast offset. The order key must be UNIQUE
    (the same contract SQL row_number relies on)."""

    def _tok(df: pd.DataFrame) -> np.ndarray:
        return (df[column].fillna("").str.split().str.len().fillna(0)
                .to_numpy().astype(np.int64))

    return _pack_by_counts(ds, order_by, target_tokens, _tok, out)


def pack_by_count(ds, order_by: str, count_col: str, target: int,
                  out: str = "seq_id"):
    """:func:`pack_sequences` with a precomputed integer cost column
    instead of whitespace tokenization: ``out = floor(cum(count_col)
    before this row / target)`` over ``order_by`` order. Used by
    conversation-boundary packing, where the unit being packed is an
    already-aggregated row (one per conversation)."""

    def _counts(df: pd.DataFrame) -> np.ndarray:
        return df[count_col].fillna(0).to_numpy().astype(np.int64)

    return _pack_by_counts(ds, order_by, target, _counts, out)


def _pack_by_counts(ds, order_by: str, target_tokens: int, counts_fn,
                    out: str):
    _tok = counts_fn
    # materialize the sorted layout so both the block-sum pass and the
    # assign pass see the IDENTICAL block boundaries
    sorted_ds = ds.sort(order_by).materialize()

    def _blocksum(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k0": [df[order_by].iloc[0] if len(df) else None],
            "t": [int(_tok(df).sum())],
            "n": [len(df)],
        })

    blocks = sorted_ds.map_batches(
        _blocksum, batch_format="pandas", batch_size=None
    ).to_pandas()
    if "k0" not in blocks.columns:
        # zero-block input (schema dropped by to_pandas, exchange.py's
        # documented trap): emit the empty result with the seq column
        return sorted_ds.map_batches(
            lambda df: df.assign(**{out: np.zeros(len(df), np.int64)}),
            batch_format="pandas",
        )
    blocks = blocks.dropna(subset=["k0"]).sort_values("k0").reset_index(drop=True)
    # block-prefix offsets keyed by the block's FIRST order value: ties
    # across block boundaries cannot occur for a unique order key (the
    # packing contract, same uniqueness SQL row_number relies on)
    block_first = blocks["k0"].to_numpy()
    block_prefix = np.r_[0, np.cumsum(blocks["t"].to_numpy())[:-1]]

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(**{out: np.zeros(0, dtype=np.int64)})
        df = df.sort_values(order_by, kind="mergesort")
        t = _tok(df)
        first = df[order_by].iloc[0]
        bi = np.searchsorted(block_first, first, side="left")
        base = int(block_prefix[min(bi, len(block_prefix) - 1)])
        cum_before = base + np.r_[0, np.cumsum(t)[:-1]]
        return df.assign(**{out: (cum_before // target_tokens).astype(np.int64)})

    return sorted_ds.map_batches(_assign, batch_format="pandas",
                                 batch_size=None)


def assemble_conversations(ds, conv_col: str = "conv_id",
                           turn_col: str = "turn_idx",
                           text_col: str = "text",
                           role_col: str | None = None,
                           sep: str = "\n", buckets: int | None = None):
    """Render each conversation's turns into ONE ordered document — the
    transcripts-native inverse of :func:`chunk_documents`: turns sorted
    by ``turn_col`` within ``conv_col`` and joined with ``sep``
    (prefixed ``role: `` when ``role_col`` is given). Emits
    ``(conv_col, n_turns, transcript)``.

    Scale shape: one exchange-backed :func:`grouped_apply` hash-
    partitioned by conversation (fine buckets, byte-coalesced tasks), a
    vectorized per-bucket sort + C groupby; per-group join cost is the
    conversation length, never the corpus."""
    import pandas as pd

    from tenzir_ray.stages.exchange import grouped_apply

    def _render(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values([conv_col, turn_col], kind="mergesort")
        txt = bucket[text_col].fillna("")
        if role_col is not None:
            txt = bucket[role_col].fillna("") + ": " + txt
        return (
            bucket.assign(_t=txt)
            .groupby(conv_col, as_index=False, sort=False)
            .agg(n_turns=(turn_col, "size"), transcript=("_t", sep.join))
        )

    return grouped_apply(ds, [conv_col], _render, num_buckets=buckets,
                         tag="assemble")


def collate_packed(ds, order_by: str, tokens_col: str, seq_len: int,
                   seq_col: str = "seq_id", pad_id: int = 0,
                   segment_ids: bool = False,
                   buckets: int | None = None):
    """The last mile to the trainer: rows carrying token-id lists
    (``tokens_col``, e.g. ``bpe_encode``'s output) already assigned to
    training sequences (``seq_col``, from :func:`pack_sequences` /
    :func:`pack_by_count`) → ONE row per sequence with a fixed-shape
    ``input_ids`` int32 list: member docs concatenated in ``order_by``
    order, truncated to ``seq_len``, right-padded with ``pad_id``.
    Also emits ``n_docs``, ``n_tokens`` (pre-truncation) and
    ``n_kept``. ``segment_ids=True`` adds a parallel int32 list: the
    1-based CONTRIBUTING-doc index owning each position (0 on padding)
    — the block-diagonal attention mask input packed training needs.
    Members with null/empty token lists contribute no positions and no
    index (segments number densely over docs that actually emitted
    tokens; ``n_docs`` still counts every member).
    Shape: one grouped exchange on ``seq_col``; per-task
    cost is bounded by sequence length × sequences per bucket, never
    the corpus. Feed the result to ``iter_batches``/``to_numpy_refs``
    for the training loop."""
    import pandas as pd

    from tenzir_ray.stages.exchange import grouped_apply

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def _collate(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values([seq_col, order_by], kind="mergesort")
        out_ids, out_seq, out_docs, out_tok, out_kept = [], [], [], [], []
        out_seg: list = []
        for sid, grp in bucket.groupby(seq_col, sort=False):
            parts = []
            for t in grp[tokens_col]:
                if t is None:
                    continue
                # list cells may arrive as numpy arrays, python lists or
                # Ray tensor-extension elements — np.asarray handles all
                a = np.asarray(t, dtype=np.int32).ravel()
                if a.size:
                    parts.append(a)
            flat = (np.concatenate(parts) if parts
                    else np.empty(0, np.int32))
            kept = flat[:seq_len]
            ids = np.full(seq_len, pad_id, np.int32)
            ids[: len(kept)] = kept
            out_ids.append(ids)
            if segment_ids:
                seg_flat = np.repeat(
                    np.arange(1, len(parts) + 1, dtype=np.int32),
                    [len(p) for p in parts]) if parts else \
                    np.empty(0, np.int32)
                seg = np.zeros(seq_len, np.int32)
                seg[: len(kept)] = seg_flat[:seq_len]
                out_seg.append(seg)
            out_seq.append(sid)
            out_docs.append(len(grp))
            out_tok.append(len(flat))
            out_kept.append(len(kept))
        cols = {
            # keep the caller's key dtype (string conversation keys are
            # as valid as integer seq ids; the bucket dtype also pins
            # empty buckets to the same schema)
            seq_col: pd.Series(out_seq, dtype=bucket[seq_col].dtype),
            "n_docs": pd.Series(out_docs, dtype=np.int64),
            "n_tokens": pd.Series(out_tok, dtype=np.int64),
            "n_kept": pd.Series(out_kept, dtype=np.int64),
            "input_ids": out_ids,
        }
        if segment_ids:
            cols["segment_ids"] = out_seg
        return pd.DataFrame(cols)

    return grouped_apply(ds, [seq_col], _collate, num_buckets=buckets,
                         tag="collate")


def iter_training_batches(collated, batch_size: int,
                          columns: "list[str] | None" = None):
    """The LAST mile: stream a :func:`collate_packed` output as numpy
    trainer batches — yields dicts of stacked ``(batch, seq_len)``
    int32 arrays for the list columns (``input_ids`` and, when present,
    ``segment_ids``) plus 1-D arrays for the scalar columns. A thin
    generator over ``iter_batches`` — blocks stream with backpressure,
    nothing materializes beyond one batch (feed it straight to the
    training loop, or shard with ``streaming_split`` for multi-worker
    loaders)."""
    import numpy as np

    cols = columns
    is_list: dict = {}  # sticky per-column decision across batches
    for b in collated.iter_batches(batch_size=batch_size,
                                   batch_format="pandas"):
        if not len(b):
            continue
        use = cols or list(b.columns)
        out = {}
        for c in use:
            v = b[c]
            if c not in is_list:
                is_list[c] = any(
                    isinstance(x, (list, np.ndarray)) for x in v)
            if is_list[c]:
                try:
                    out[c] = np.stack([np.asarray(x) for x in v])
                except (ValueError, TypeError) as exc:
                    raise ValueError(
                        f"iter_training_batches: column {c!r} has "
                        "null or ragged list cells — collate upstream "
                        "to a fixed shape first") from exc
            else:
                out[c] = v.to_numpy()
        yield out


ship_by_value(sys.modules[__name__])
