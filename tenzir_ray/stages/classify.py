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
    """Accumulator: ``{"labels": [str], "docs": [int], "counts":
    [(B,) int64]}`` — a struct-of-lists, NOT a dict keyed by label: a
    dict-of-numpy accumulator fails Arrow conversion when the partials
    cross the object store and Ray falls back to pickled-object blocks
    (slow path + a warning per block). This shape converts to
    ``struct<labels: list<string>, docs: list<int64>, counts:
    list<list<int64>>>`` cleanly."""

    def __init__(self, label_col: str, column: str, buckets: int,
                 ngram: int):
        self.label_col = label_col
        self.column = column
        self.buckets = buckets
        self.ngram = ngram

    def init(self, _key):
        return None

    def accumulate_block(self, acc, block):
        import pandas as pd

        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block)
        if acc is None:
            labs, docs, counts = [], [], []
        else:
            labs = list(acc["labels"])
            docs = list(acc["docs"])
            counts = [np.asarray(c, np.int64).copy()
                      for c in acc["counts"]]
        out = {"labels": labs, "docs": docs, "counts": counts}
        if block.num_rows == 0:
            return out
        labels = np.asarray(block.column(self.label_col).to_pylist(),
                            dtype=object)
        tokens, doc_idx = _block_tokens(block, self.column, self.ngram)
        b = _bucketize(tokens, self.buckets)
        tok_labels = labels[doc_idx] if len(tokens) else labels[:0]
        index = {lab: i for i, lab in enumerate(labs)}
        for lab in pd.unique(labels):
            if lab is None:
                continue
            i = index.get(lab)
            if i is None:
                i = index[lab] = len(labs)
                labs.append(lab)
                docs.append(0)
                counts.append(np.zeros(self.buckets, np.int64))
            docs[i] += int((labels == lab).sum())
            if len(b):
                np.add.at(counts[i], b[tok_labels == lab], 1)
        return out

    @staticmethod
    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        labs = list(a["labels"])
        docs = list(a["docs"])
        counts = [np.asarray(c, np.int64).copy() for c in a["counts"]]
        index = {lab: i for i, lab in enumerate(labs)}
        for lab, n, cnt in zip(b["labels"], b["docs"], b["counts"]):
            i = index.get(lab)
            if i is None:
                labs.append(lab)
                docs.append(int(n))
                counts.append(np.asarray(cnt, np.int64).copy())
            else:
                docs[i] += int(n)
                counts[i] = counts[i] + np.asarray(cnt, np.int64)
        return {"labels": labs, "docs": docs, "counts": counts}


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
    if not state or not len(state["labels"]):
        raise ValueError("nb_train: no labeled rows")
    order = sorted(range(len(state["labels"])),
                   key=lambda i: state["labels"][i])
    classes = [state["labels"][i] for i in order]
    doc_counts = np.array([state["docs"][i] for i in order], np.int64)
    counts = np.stack([np.asarray(state["counts"][i], np.int64)
                       for i in order])
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


# ---------------------------------------------------------------------------
# Logistic regression (binary) over the same hashed bag-of-ngrams — the
# trainable quality-filter slot (fastText-style linear classifier).
# Training is synchronous full-batch gradient descent: each iteration is
# ONE streaming AggregateFn pass computing (Σ x·(σ(w·x)−y), Σ(σ−y),
# loss, n) — O(buckets) driver state, corpus never materializes. At
# 100 TB you run the same passes on a stratified sample
# (stages.splits.stratified_sample) and score the full corpus with the
# broadcast model.


class LrModel:
    def __init__(self, weights: np.ndarray, bias: float, buckets: int,
                 ngram: int):
        self.weights = np.asarray(weights, np.float64)
        self.bias = float(bias)
        self.buckets = int(buckets)
        self.ngram = int(ngram)

    def to_dict(self) -> dict:
        return {"weights": self.weights.tolist(), "bias": self.bias,
                "buckets": self.buckets, "ngram": self.ngram}

    @classmethod
    def from_dict(cls, d: dict) -> "LrModel":
        return cls(np.asarray(d["weights"], np.float64), d["bias"],
                   d["buckets"], d["ngram"])


def _lr_labels(block: pa.Table, label_col: str) -> np.ndarray:
    """Labels as float64 0/1 with NaN for nulls (null rows are skipped
    by the gradient, not treated as class 0)."""
    import pandas as pd

    y = pd.to_numeric(
        pd.Series(block.column(label_col).to_pylist(), dtype=object),
        errors="coerce").to_numpy(np.float64)
    bad = ~np.isnan(y) & (y != 0.0) & (y != 1.0)
    if bad.any():
        raise ValueError(
            f"lr_train: label column {label_col!r} must be 0/1/null "
            f"(got {y[bad][0]!r})")
    return y


class _LrGradAgg:
    """Accumulator: ``{"gw": (B,) f64, "gb": f64, "loss": f64,
    "n": int, "tok": (B,) i64}`` — dict-of-uniform-fields so the
    partials convert to a typed Arrow struct when they cross the object
    store (a heterogeneous list falls back to pickled-object blocks)."""

    def __init__(self, label_col: str, column: str, buckets: int,
                 ngram: int, weights: np.ndarray, bias: float):
        self.label_col = label_col
        self.column = column
        self.buckets = buckets
        self.ngram = ngram
        self.weights = np.asarray(weights, np.float64)
        self.bias = float(bias)

    def init(self, _key):
        return None

    def accumulate_block(self, acc, block):
        import pandas as pd

        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block)
        if acc is None:
            acc = {"gw": np.zeros(self.buckets, np.float64), "gb": 0.0,
                   "loss": 0.0, "n": 0,
                   "tok": np.zeros(self.buckets, np.int64)}
        else:
            acc = {"gw": np.asarray(acc["gw"], np.float64).copy(),
                   "gb": float(acc["gb"]), "loss": float(acc["loss"]),
                   "n": int(acc["n"]),
                   "tok": np.asarray(acc["tok"], np.int64).copy()}
        n = block.num_rows
        if n == 0:
            return acc
        y = _lr_labels(block, self.label_col)
        valid = ~np.isnan(y)
        tokens, doc_idx = _block_tokens(block, self.column, self.ngram)
        b = _bucketize(tokens, self.buckets)
        z = np.full(n, self.bias, np.float64)
        if len(b):
            np.add.at(z, doc_idx, self.weights[b])
        # stable σ and log-loss
        p = 1.0 / (1.0 + np.exp(-z))
        err = np.where(valid, p - np.nan_to_num(y), 0.0)
        if len(b):
            np.add.at(acc["gw"], b, err[doc_idx])
            np.add.at(acc["tok"], b, valid[doc_idx].astype(np.int64))
        acc["gb"] += float(err.sum())
        zl = z[valid]
        yl = y[valid]
        acc["loss"] += float(
            np.sum(np.maximum(zl, 0) - zl * yl + np.log1p(np.exp(-np.abs(zl)))))
        acc["n"] += int(valid.sum())
        return acc

    @staticmethod
    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return {"gw": np.asarray(a["gw"], np.float64) + np.asarray(b["gw"], np.float64),
                "gb": float(a["gb"]) + float(b["gb"]),
                "loss": float(a["loss"]) + float(b["loss"]),
                "n": int(a["n"]) + int(b["n"]),
                "tok": np.asarray(a["tok"], np.int64) + np.asarray(b["tok"], np.int64)}


def lr_gradient(ds, label_col: str, column: str = "text", *,
                weights: np.ndarray, bias: float = 0.0,
                buckets: int = 4096, ngram: int = 1):
    """One full-batch pass → ``(gradw, grad_bias, loss, n_docs,
    tokens_per_bucket)`` (sums, not averages)."""
    from ray.data.aggregate import AggregateFn

    cb = _LrGradAgg(label_col, column, buckets, ngram, weights, bias)
    agg = AggregateFn(init=cb.init, merge=_LrGradAgg.merge,
                      accumulate_block=cb.accumulate_block, name="lr")
    state = ds.aggregate(agg)["lr"]
    if state is None or int(state["n"]) == 0:
        raise ValueError("lr_gradient: no labeled rows")
    return (np.asarray(state["gw"], np.float64), float(state["gb"]),
            float(state["loss"]), int(state["n"]),
            np.asarray(state["tok"], np.int64))


def lr_train(ds, label_col: str, column: str = "text", *,
             buckets: int = 4096, ngram: int = 1, iters: int = 20,
             lr: float = 0.5, l2: float = 0.0,
             verbose: bool = False) -> LrModel:
    """Binary logistic regression by full-batch GD: ``iters`` streaming
    passes, driver state O(buckets). Labels must be 0/1 (null rows are
    ignored)."""
    w = np.zeros(buckets, np.float64)
    bias = 0.0
    ds = ds.materialize()  # each iteration re-reads the same blocks
    for it in range(iters):
        gw, gb, loss, n, _ = lr_gradient(
            ds, label_col, column, weights=w, bias=bias,
            buckets=buckets, ngram=ngram)
        w -= lr * (gw / n + l2 * w)
        bias -= lr * gb / n
        if verbose:
            print(f"lr_train iter {it}: loss={loss / n:.6f} n={n}")
    return LrModel(w, bias, buckets, ngram)


class _LrScorer:
    """Actor stage: broadcast model, vectorized σ(w·x) per batch."""

    def __init__(self, model_ref, column: str, out: str,
                 pred_col: "str | None", threshold: float,
                 raw: bool = False):
        import ray

        self.model = LrModel.from_dict(ray.get(model_ref))
        self.column = column
        self.out = out
        self.pred_col = pred_col
        self.threshold = threshold
        self.raw = raw

    __name__ = "_LrScorer"

    def __call__(self, block: pa.Table) -> pa.Table:
        m = self.model
        n = block.num_rows
        z = np.full(n, m.bias, np.float64)
        if n:
            tokens, doc_idx = _block_tokens(block, self.column, m.ngram)
            if len(tokens):
                b = _bucketize(tokens, m.buckets)
                np.add.at(z, doc_idx, m.weights[b])
        if self.raw:
            # logit (margin w·x + b) — with integer weights this is
            # grid-exact, the form an SQL oracle can reproduce
            block = block.append_column(
                self.out, pa.array(z, pa.float64()))
            if self.pred_col:
                block = block.append_column(
                    self.pred_col, pa.array(z > 0.0, pa.bool_()))
            return block
        p = 1.0 / (1.0 + np.exp(-z))
        block = block.append_column(self.out, pa.array(p, pa.float64()))
        if self.pred_col:
            block = block.append_column(
                self.pred_col, pa.array(p >= self.threshold, pa.bool_()))
        return block


def lr_classify(ds, model: LrModel, column: str = "text",
                out: str = "score", pred_col: "str | None" = None,
                threshold: float = 0.5, raw: bool = False,
                concurrency=(1, 8), batch_size: int = 4096):
    """Broadcast LR scorer. ``raw=True`` emits the logit (margin)
    instead of the sigmoid probability; ``pred_col`` then tests
    margin > 0 (≡ p > 0.5)."""
    import ray

    ref = ray.put(model.to_dict())
    return ds.map_batches(
        _LrScorer, fn_constructor_args=(ref, column, out, pred_col,
                                        threshold, raw),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def lr_grad_buckets(ds, label_col: str, column: str = "text", *,
                    buckets: int = 1024, ngram: int = 1):
    """First-iteration gradient audit view, exactly SQL-reproducible:
    from w=0 every σ is 0.5, so 2·grad[b] = Σ_tokens (1 − 2·y) — an
    integer DuckDB reproduces via ``md5_number_lower(t) % buckets``
    (the oracle gate for the LR training machinery). Returns
    ``(b, g2, cnt)`` over buckets with ≥1 labeled token."""
    gw, _, _, _, cnt = lr_gradient(
        ds, label_col, column, weights=np.zeros(buckets, np.float64),
        bias=0.0, buckets=buckets, ngram=ngram)
    nz = np.nonzero(cnt)[0]
    return pa.table({
        "b": pa.array(nz, pa.int64()),
        "g2": pa.array(np.rint(2.0 * gw[nz]).astype(np.int64), pa.int64()),
        "cnt": pa.array(cnt[nz], pa.int64()),
    })


ship_by_value(sys.modules[__name__])
