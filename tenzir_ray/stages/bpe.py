"""Distributed BPE tokenizer training + encoding (engine extension —
the tokenizer step of a training-data pipeline; no reference analog,
the closest constructs are the token-count/fingerprint stages).

Algorithm: Sennrich et al. 2016 (arXiv:1508.07909) byte-pair encoding
over a WORD-frequency table — the classic formulation where merge
statistics come from the distinct-word vocabulary weighted by corpus
frequency, not from a pass over the raw corpus. That factorization is
what makes BPE training tractable at 100 TB:

1. **Word counts** (distributed, one pass): per-batch vectorized
   whitespace split + ``value_counts`` combiner, then one
   exchange-backed grouped sum (same policy as
   :func:`tenzir_ray.stages.text.ngram_counts`). The corpus never
   reaches the driver.
2. **Vocabulary cap** (distributed): keep the ``max_words`` most
   frequent words (deterministic tie-break ``(count desc, word asc)``)
   — the standard practical approximation; rare-word tails contribute
   nothing to early merges.
3. **Merge loop** (driver, O(vocab) state): incremental pair-count
   maintenance (pair→words index) so each merge touches only the words
   that contain it. Driver state is vocabulary-sized (bounded by
   ``max_words``), independent of corpus size.

Encoding is an actor-pool stage: merge ranks broadcast once via
``ray.put``, per-actor word→tokens cache (Zipf makes the cache hit
rate extreme), per-batch distinct-word encode + vectorized re-expand.

Determinism: training is a pure function of the word-count table
(ties broken lexicographically), and the word-count table is a pure
function of the corpus — so the learned merges are stable across runs,
partitionings, and cluster sizes (pytest-asserted).
"""

from __future__ import annotations

import sys
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value

#: end-of-word sentinel symbol (never collides with whitespace-split
#: input because tokens cannot contain whitespace or be empty)
EOW = "</w>"


# ------------------------------------------------------------- training


def word_counts(ds, column: str = "text", lowercase: bool = False,
                min_count: int = 1, buckets: int | None = None,
                batch_size: int = 8192):
    """Corpus word-frequency table ``(word, count)`` — whitespace
    tokenization (Python ``str.split`` semantics: runs of unicode
    whitespace, no empties). Fully vectorized: Arrow
    ``utf8_split_whitespace`` → flatten → ``value_counts`` combiner per
    batch, then one exchange-backed grouped sum."""

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if lowercase:
            col = pc.utf8_lower(col)
        toks = pc.list_flatten(pc.utf8_split_whitespace(
            pc.fill_null(col, "")))
        toks = toks.filter(pc.not_equal(toks, ""))
        if not len(toks):
            return pa.table({"word": pa.array([], pa.string()),
                             "count": pa.array([], pa.int64())})
        vc = toks.value_counts()
        return pa.table({"word": vc.field("values"),
                         "count": vc.field("counts").cast(pa.int64())})

    from tenzir_ray.stages.exchange import grouped_apply

    pre = ds.map_batches(_partial, batch_format="pyarrow",
                         batch_size=batch_size)

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", as_index=False, sort=False)["count"].sum()
        if min_count > 1:
            out = out[out["count"] >= min_count]
        return out

    return grouped_apply(pre, ["word"], _sum, num_buckets=buckets,
                         tag="bpewc")


def _apply_merge(syms: tuple, pair: tuple, new_sym: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(new_sym)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_merges(word_count_items, num_merges: int) -> list[tuple]:
    """Classic BPE merge learning over a ``(word, count)`` iterable.
    Deterministic: best pair = highest summed count, ties broken by the
    lexicographically smallest ``(left, right)``. Incremental pair
    bookkeeping — each merge re-scans only the words containing the
    merged pair."""
    words: list[tuple] = []
    counts: list[int] = []
    for w, c in word_count_items:
        if not w:
            continue
        words.append(tuple(w) + (EOW,))
        counts.append(int(c))

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for i, syms in enumerate(words):
        c = counts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words[p].add(i)

    merges: list[tuple] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:  # defensive; counts never go negative
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(pair_words[best]):
            syms, c = words[i], counts[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(i)
            new = _apply_merge(syms, best, new_sym)
            words[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += c
                pair_words[p].add(i)
    return merges


class BpeModel:
    """Learned merge table + encoder. ``merges`` is ordered (rank =
    position); ``encode_word`` is the standard lowest-rank-first loop."""

    def __init__(self, merges: list[tuple], lowercase: bool = False):
        self.merges = [tuple(m) for m in merges]
        self.lowercase = bool(lowercase)
        self.ranks = {m: r for r, m in enumerate(self.merges)}
        self._cache: dict = {}

    def encode_word(self, word: str) -> list[str]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        if not word:
            self._cache[word] = []
            return []
        syms = list(word) + [EOW]
        ranks = self.ranks
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        self._cache[word] = syms
        return syms

    def encode_text(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        for w in text.split():
            out.extend(self.encode_word(w))
        return out

    def decode(self, tokens: list[str]) -> str:
        return "".join(tokens).replace(EOW, " ").strip()

    def to_dict(self) -> dict:
        return {"merges": [list(m) for m in self.merges],
                "lowercase": self.lowercase}

    @classmethod
    def from_dict(cls, d: dict) -> "BpeModel":
        return cls([tuple(m) for m in d["merges"]], d.get("lowercase", False))


def bpe_train(ds, column: str = "text", num_merges: int = 200,
              max_words: int = 1_000_000, lowercase: bool = False,
              min_count: int = 1, buckets: int | None = None) -> BpeModel:
    """Train a BPE tokenizer on a corpus column. The distributed part is
    the word-count table; the merge loop runs on the driver over at most
    ``max_words`` ``(word, count)`` rows — vocabulary-sized state, the
    standard scale factorization (see module docstring)."""
    wc = word_counts(ds, column=column, lowercase=lowercase,
                     min_count=min_count, buckets=buckets)
    # deterministic top-max_words: (count desc, word asc)
    top = wc.sort(["count", "word"], descending=[True, False]).limit(
        max_words).to_pandas()
    merges = train_merges(
        zip(top["word"].tolist(), top["count"].tolist()), num_merges)
    return BpeModel(merges, lowercase=lowercase)


# ------------------------------------------------------------- encoding


class _BpeEncoder:
    """Actor stage: ranks fetched once per actor; per batch encode each
    DISTINCT word once (per-actor cache persists across batches) and
    re-expand vectorized."""

    def __init__(self, model_ref, column: str, out: str, mode: str):
        import ray

        self.model = BpeModel.from_dict(ray.get(model_ref))
        self.column = column
        self.out = out
        self.mode = mode  # "tokens" | "count"

    __name__ = "_BpeEncoder"

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if self.model.lowercase:
            col = pc.utf8_lower(col)
        split = pc.utf8_split_whitespace(pc.fill_null(col, ""))
        words = pc.list_flatten(split)
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        # Arrow emits empty tokens at string edges (unlike str.split);
        # encode_word("") -> [] keeps counts/tokens identical to
        # Python-split semantics while lens stays aligned unfiltered
        wl = words.to_pylist()
        enc = self.model.encode_word
        if self.mode == "count":
            per_word = np.fromiter((len(enc(w)) for w in wl),
                                   dtype=np.int64, count=len(wl))
            # sum token counts back per row
            row_tok = np.zeros(batch.num_rows, dtype=np.int64)
            idx = np.repeat(np.arange(batch.num_rows), lens)
            np.add.at(row_tok, idx, per_word)
            arr = pa.array(row_tok, pa.int64())
        else:
            toks: list = [[] for _ in range(batch.num_rows)]
            idx = np.repeat(np.arange(batch.num_rows), lens)
            for i, w in zip(idx, wl):
                toks[i].extend(enc(w))
            arr = pa.array(toks, pa.list_(pa.string()))
        if self.out in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index(self.out), self.out, arr)
        return batch.append_column(self.out, arr)


def bpe_encode(ds, model: BpeModel, column: str = "text",
               out: str = "bpe_tokens", mode: str = "tokens",
               concurrency=(1, 8), batch_size: int = 2048):
    """Tokenize ``column`` with a trained :class:`BpeModel`. ``mode=
    "tokens"`` emits ``list<string>``; ``mode="count"`` emits the int64
    token count (the budget/packing input). Ranks ship once via
    ``ray.put``; each actor keeps a word→tokens cache."""
    import ray

    if mode not in ("tokens", "count"):
        raise ValueError(f"bpe_encode: unknown mode {mode!r}")
    ref = ray.put(model.to_dict())
    return ds.map_batches(
        _BpeEncoder,
        fn_constructor_args=(ref, column, out, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def bpe_encode_op(ds, merges, column: str = "text", out: str = "bpe_tokens",
                  mode: str = "tokens", lowercase: bool = False, **kw):
    """Registry/TQL adapter: ``merges`` is a list of ``[left, right]``
    pairs (a serialized :class:`BpeModel`)."""
    model = BpeModel([tuple(m) for m in merges], lowercase=lowercase)
    return bpe_encode(ds, model, column=column, out=out, mode=mode, **kw)


ship_by_value(sys.modules[__name__])
