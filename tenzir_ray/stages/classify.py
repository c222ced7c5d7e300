"""Streaming Naive-Bayes text classifier over hashed bag-of-ngrams —
the fastText/CCNet-style quality- and language-classifier slot of a
training-data pipeline (label quality tiers, route languages, filter
machine-generated text). Engine extension; the reference's closest
construct is the lookup-table context.

Training is ONE streaming ``AggregateFn`` pass: per block, tokens hash
into ``B`` buckets (the same md5-bucket scheme as
:mod:`tenzir_ray.stages.dsir`, SQL-reproducible) and accumulate into a
per-class ``(B,)`` int64 count row plus a per-class document count —
O(classes × B) state, never corpus-sized, mergeable across blocks.
Scoring broadcasts the count matrix once via ``ray.put`` and computes
all class log-posteriors vectorized per batch (argmax with
deterministic first-class tie-break over the sorted class list).

Multinomial NB with add-α smoothing:
``score(d, c) = log(n_docs_c / n_docs) + Σ_t log((cnt[c, b_t] + α) /
(N_c + α·B))``.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa

from tenzir_ray._ship import ship_by_value
from tenzir_ray.stages.dsir import _block_tokens, _bucketize


class _NbAgg:
    """Accumulator: {label: [n_docs, (B,) int64 bucket counts]}."""

    def __init__(self, label_col: str, column: str, buckets: int,
                 ngram: int):
        self.label_col = label_col
        self.column = column
        self.buckets = buckets
        self.ngram = ngram

    def init(self, _key):
        return {}

    def accumulate_block(self, acc, block):
        import pandas as pd

        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return acc
        labels = np.asarray(block.column(self.label_col).to_pylist(),
                            dtype=object)
        tokens, doc_idx = _block_tokens(block, self.column, self.ngram)
        b = _bucketize(tokens, self.buckets)
        tok_labels = labels[doc_idx] if len(tokens) else labels[:0]
        acc = {k: [v[0], v[1].copy()] for k, v in acc.items()}
        for lab in pd.unique(labels):
            if lab is None:
                continue
            ent = acc.setdefault(
                lab, [0, np.zeros(self.buckets, np.int64)])
            ent[0] += int((labels == lab).sum())
            if len(b):
                np.add.at(ent[1], b[tok_labels == lab], 1)
        return acc

    @staticmethod
    def merge(a, b):
        out = {k: [v[0], v[1].copy()] for k, v in a.items()}
        for lab, (n, cnt) in b.items():
            if lab in out:
                out[lab][0] += n
                out[lab][1] += cnt
            else:
                out[lab] = [n, cnt.copy()]
        return out


class NbModel:
    """Trained classifier: sorted class list, per-class doc counts and
    ``(C, B)`` bucket counts."""

    def __init__(self, classes: list, doc_counts: np.ndarray,
                 counts: np.ndarray, buckets: int, ngram: int,
                 alpha: float = 1.0):
        self.classes = list(classes)
        self.doc_counts = np.asarray(doc_counts, np.int64)
        self.counts = np.asarray(counts, np.int64)
        self.buckets = int(buckets)
        self.ngram = int(ngram)
        self.alpha = float(alpha)
        totals = self.counts.sum(axis=1, keepdims=True).astype(np.float64)
        self.logw = np.log(
            (self.counts + self.alpha)
            / (totals + self.alpha * self.buckets))
        self.log_prior = np.log(
            self.doc_counts / max(1, self.doc_counts.sum()))

    def to_dict(self) -> dict:
        return {"classes": self.classes,
                "doc_counts": self.doc_counts.tolist(),
                "counts": self.counts.tolist(),
                "buckets": self.buckets, "ngram": self.ngram,
                "alpha": self.alpha}

    @classmethod
    def from_dict(cls, d: dict) -> "NbModel":
        return cls(d["classes"], np.asarray(d["doc_counts"], np.int64),
                   np.asarray(d["counts"], np.int64), d["buckets"],
                   d["ngram"], d["alpha"])

    def class_counts(self, label) -> np.ndarray:
        return self.counts[self.classes.index(label)]


def nb_train(ds, label_col: str, column: str = "text", *,
             buckets: int = 4096, ngram: int = 1,
             alpha: float = 1.0) -> NbModel:
    """Train in one streaming pass; driver state O(classes × buckets)."""
    from ray.data.aggregate import AggregateFn

    cb = _NbAgg(label_col, column, buckets, ngram)
    agg = AggregateFn(init=cb.init, merge=_NbAgg.merge,
                      accumulate_block=cb.accumulate_block, name="nb")
    state = ds.aggregate(agg)["nb"]
    if not state:
        raise ValueError("nb_train: no labeled rows")
    classes = sorted(state)
    doc_counts = np.array([state[c][0] for c in classes], np.int64)
    counts = np.stack([state[c][1] for c in classes])
    return NbModel(classes, doc_counts, counts, buckets, ngram, alpha)


class _NbScorer:
    """Actor stage: model fetched once per actor; per batch all class
    log-posteriors vectorized, argmax → predicted label."""

    def __init__(self, model_ref, column: str, out: str,
                 score_col: "str | None"):
        import ray

        self.model = NbModel.from_dict(ray.get(model_ref))
        self.column = column
        self.out = out
        self.score_col = score_col

    __name__ = "_NbScorer"

    def __call__(self, block: pa.Table) -> pa.Table:
        m = self.model
        n = block.num_rows
        scores = np.tile(m.log_prior, (n, 1))
        if n:
            tokens, doc_idx = _block_tokens(block, self.column, m.ngram)
            if len(tokens):
                b = _bucketize(tokens, m.buckets)
                for ci in range(len(m.classes)):
                    np.add.at(scores[:, ci], doc_idx, m.logw[ci][b])
        best = scores.argmax(axis=1)
        pred = pa.array(np.asarray(m.classes, object)[best], pa.string())
        block = block.append_column(self.out, pred)
        if self.score_col:
            block = block.append_column(
                self.score_col,
                pa.array(scores[np.arange(n), best], pa.float64()))
        return block


def nb_classify(ds, model: NbModel, column: str = "text",
                out: str = "pred", score_col: "str | None" = None,
                concurrency=(1, 8), batch_size: int = 4096):
    import ray

    ref = ray.put(model.to_dict())
    return ds.map_batches(
        _NbScorer, fn_constructor_args=(ref, column, out, score_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def nb_class_counts(ds, label_col: str, label, column: str = "text", *,
                    buckets: int = 1024, ngram: int = 1):
    """Training-count audit view for one class: ``(b, cnt)`` over the
    non-empty hash buckets — bit-reproducible in SQL via
    ``md5_number_lower(t) % buckets`` (the oracle gate for training)."""
    model = nb_train(ds, label_col, column, buckets=buckets, ngram=ngram)
    cnt = model.class_counts(label)
    nz = np.nonzero(cnt)[0]
    return pa.table({"b": pa.array(nz, pa.int64()),
                     "cnt": pa.array(cnt[nz], pa.int64())})


def nb_train_classify(ds, label_col: str, column: str = "text", *,
                      buckets: int = 4096, ngram: int = 1,
                      alpha: float = 1.0, out: str = "pred", **kw):
    """Self-train + classify in one call (registry/TQL convenience)."""
    model = nb_train(ds, label_col, column, buckets=buckets, ngram=ngram,
                     alpha=alpha)
    return nb_classify(ds, model, column=column, out=out, **kw)


ship_by_value(sys.modules[__name__])
