"""DSIR-style data selection via hashed n-gram importance weights
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling", arXiv:2302.03169).

The estimator: hash every token (or n-gram) into ``B`` buckets, fit
bag-of-buckets unigram models for the TARGET distribution (rows matching
a filter expression — e.g. a high-quality slice) and the RAW distribution
(all rows), and score each document by the summed per-token importance:

    logratio(doc) = Σ_t  log p̂_target[b(t)] − log p̂_raw[b(t)]

Two passes, both shuffle-free:

1. **Count pass** — ONE streaming ``Dataset.aggregate`` whose
   accumulator is a tiny (2, B) int64 matrix (raw and target bucket
   counts); per-block work is a vectorized Arrow regex split plus an
   md5 per *unique* token (memoized per worker — Zipf token
   distributions make the memo hit rate high).
2. **Score pass** — broadcast the (B,) weight vector(s) via ``ray.put``
   and attach per-doc sums with one ``np.add.at`` per batch.

Both the float log-ratio (the paper's estimator, add-α smoothed) and an
integer ``affinity`` variant (Σ (ct[b]·SCALE) // cr[b], exact across
engines — the hash-oracle gate uses it) are attached. The token hash is
md5 (lower 8 bytes, little-endian) so DuckDB's ``md5_number_lower`` can
replicate bucketing bit-for-bit in oracle SQL.

State is O(B) everywhere — no shuffle, no driver data pass — so the
same code holds at 100 TB; B (default 1024, the paper uses 10^4) trades
collision bias for memory.
"""

from __future__ import annotations

import hashlib
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value
from tenzir_ray.expr import compile_filter

# per-worker memo: token → full 64-bit md5-lower value (mod applied per
# call so differing bucket counts share the cache). Pure cache — values
# are deterministic, so worker reuse cannot change results.
_MD5_MEMO: dict[str, int] = {}
_MEMO_CAP = 2_000_000


def _md5_lower(tok: str) -> int:
    v = _MD5_MEMO.get(tok)
    if v is None:
        v = int.from_bytes(hashlib.md5(tok.encode()).digest()[8:], "little")
        if len(_MD5_MEMO) < _MEMO_CAP:
            _MD5_MEMO[tok] = v
    return v


def _block_tokens(block: pa.Table, column: str, ngram: int = 1):
    """(tokens: object ndarray, doc_idx: int64 ndarray) for one block.
    Tokenization = regex whitespace split, empty tokens dropped — the
    exact ``regexp_split_to_array(text, '\\s+') ... WHERE t <> ''``
    DuckDB form, so oracles can reproduce it."""
    col = block.column(column)
    toks = pc.split_pattern_regex(col, pattern=r"\s+")
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lens = pc.list_value_length(la).fill_null(0)
    lens_np = lens.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = la.flatten()
    tokens = flat.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(la), dtype=np.int64), lens_np)
    keep = tokens != ""
    tokens, doc_idx = tokens[keep], doc_idx[keep]
    if ngram > 1 and len(tokens):
        # join adjacent tokens within a doc with single spaces
        parts = [tokens[i: len(tokens) - (ngram - 1 - i)]
                 for i in range(ngram)]
        same_doc = doc_idx[: len(tokens) - (ngram - 1)] == \
            doc_idx[ngram - 1:]
        joined = parts[0].copy()
        for p in parts[1:]:
            joined = np.array([a + " " + b for a, b in zip(joined, p)],
                              dtype=object)
        tokens = joined[same_doc]
        doc_idx = doc_idx[: len(same_doc)][same_doc]
    return tokens, doc_idx


def _bucketize(tokens: np.ndarray, buckets: int) -> np.ndarray:
    if not len(tokens):
        return np.empty(0, np.int64)
    uniq, inv = np.unique(tokens, return_inverse=True)
    ub = np.fromiter((_md5_lower(t) % buckets for t in uniq),
                     np.int64, count=len(uniq))
    return ub[inv]


def md5_token_id_lists(df, column: str = "text",
                       buckets: int = 50021, out: str = "ids"):
    """pandas batch → per-row int32 token-id LISTS via the md5 bucket
    scheme (``md5_number_lower(token) % buckets`` — SQL-reproducible).
    The tokenizer-shaped front of a packing/collate pipeline when no
    trained tokenizer is in play; empty batches keep the output schema.
    """
    import pandas as pd
    import pyarrow as pa

    df = df.reset_index(drop=True)
    if not len(df):
        df[out] = pd.Series([], dtype=object)
        return df
    t = pa.Table.from_pandas(df[["doc_id", column]]
                             if "doc_id" in df.columns else df[[column]],
                             preserve_index=False)
    tokens, doc_idx = _block_tokens(t, column)
    b = _bucketize(tokens, buckets)
    counts = np.bincount(doc_idx, minlength=len(df))
    parts = np.split(b, np.cumsum(counts)[:-1])
    df[out] = [arr.astype(np.int32) for arr in parts]
    return df


class _CountAgg:
    """AggregateFn callbacks: accumulator = (2, B) int64 — row 0 raw
    counts, row 1 target counts."""

    def __init__(self, column: str, target_expr: str, buckets: int,
                 ngram: int):
        self.column = column
        self.target_expr = target_expr
        self.buckets = buckets
        self.ngram = ngram
        self._filter = None

    def init(self, _key):
        return np.zeros((2, self.buckets), np.int64)

    def accumulate_block(self, acc, block):
        import pandas as pd

        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return acc
        if self._filter is None:
            self._filter = compile_filter(self.target_expr)
        tokens, doc_idx = _block_tokens(block, self.column, self.ngram)
        if not len(tokens):
            return acc
        b = _bucketize(tokens, self.buckets)
        tmask = self._filter.mask(block)[doc_idx]
        acc = acc.copy()
        np.add.at(acc[0], b, 1)
        np.add.at(acc[1], b[tmask], 1)
        return acc

    @staticmethod
    def merge(a, b):
        return a + b


def dsir_counts(ds, target: str, column: str = "text", *,
                buckets: int = 1024, ngram: int = 1) -> np.ndarray:
    """One streaming pass → (2, B) int64: raw and target bucket counts."""
    from ray.data.aggregate import AggregateFn

    cb = _CountAgg(column, target, buckets, ngram)
    agg = AggregateFn(init=cb.init, merge=_CountAgg.merge,
                      accumulate_block=cb.accumulate_block, name="dsir")
    return ds.aggregate(agg)["dsir"]


class _Scorer:
    """Attach per-doc hashed-ngram scores from broadcast weight vectors."""

    def __init__(self, weights_ref, column: str, buckets: int, ngram: int,
                 names: tuple):
        import ray

        w = ray.get(weights_ref)
        self.logw = np.asarray(w[0], np.float64)
        self.intw = np.asarray(w[1], np.int64)
        self.column = column
        self.buckets = buckets
        self.ngram = ngram
        self.names = names

    def __call__(self, block: pa.Table) -> pa.Table:
        n = block.num_rows
        log_s = np.zeros(n, np.float64)
        int_s = np.zeros(n, np.int64)
        if n:
            tokens, doc_idx = _block_tokens(block, self.column, self.ngram)
            if len(tokens):
                b = _bucketize(tokens, self.buckets)
                np.add.at(log_s, doc_idx, self.logw[b])
                np.add.at(int_s, doc_idx, self.intw[b])
        block = block.append_column(self.names[0],
                                    pa.array(log_s, pa.float64()))
        return block.append_column(self.names[1],
                                   pa.array(int_s, pa.int64()))


def dsir_weights(ds, target: str, column: str = "text", *,
                 buckets: int = 1024, ngram: int = 1, alpha: float = 1.0,
                 scale: int = 1_000_000, concurrency=(1, 4),
                 out: str = "dsir_logratio", out_int: str = "affinity"):
    """Attach DSIR importance scores to every row.

    ``target`` is a filter expression (the engine's expression language,
    e.g. ``"lang == 'en'"``) defining the target slice. Adds:

    - ``out`` — the paper's add-α-smoothed log importance ratio
      Σ_t [log((ct+α)/(Nt+αB)) − log((cr+α)/(Nr+αB))] (float64)
    - ``out_int`` — exact integer affinity Σ_t (ct·scale)//cr, the
      cross-engine-reproducible variant (int64)
    """
    import ray

    counts = dsir_counts(ds, target, column, buckets=buckets, ngram=ngram)
    cr = counts[0].astype(np.float64)
    ct = counts[1].astype(np.float64)
    B = buckets
    logw = (np.log((ct + alpha) / (ct.sum() + alpha * B))
            - np.log((cr + alpha) / (cr.sum() + alpha * B)))
    with np.errstate(divide="ignore", invalid="ignore"):
        intw = np.where(counts[0] > 0,
                        (counts[1] * scale) // np.maximum(counts[0], 1),
                        0).astype(np.int64)
    wref = ray.put((logw, intw))
    return ds.map_batches(
        _Scorer, fn_constructor_args=(wref, column, buckets, ngram,
                                      (out, out_int)),
        batch_format="pyarrow", concurrency=concurrency,
    )


def dsir_select(ds, target: str, n: int, column: str = "text", *,
                id_column: str = "doc_id", buckets: int = 1024,
                ngram: int = 1, **kw):
    """Top-``n`` rows by DSIR log-ratio (deterministic tiebreak on
    ``id_column``) — the selection step of importance resampling. The
    sort runs over (score, id) only at the Ray level; payload columns
    ride along in the same dataset."""
    scored = dsir_weights(ds, target, column, buckets=buckets,
                          ngram=ngram, **kw)
    return scored.sort(["dsir_logratio", id_column],
                       descending=[True, False]).limit(n)


ship_by_value(sys.modules[__name__])
