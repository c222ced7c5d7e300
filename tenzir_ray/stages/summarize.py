"""`summarize` — grouped aggregation (reference builtins/operators/summarize.cpp,
aggregation functions in builtins/aggregation-functions/*.cpp, interface
libtenzir/include/tenzir/aggregation_function.hpp:23-58: incremental
add(array) per block + merge + finish — exactly Ray's AggregateFn contract,
which performs partial aggregation per block before the shuffle).

Supported functions (reference file in aggregation-functions/):
min, max, sum, mean, count, count_distinct (count_distinct.cpp — exact),
distinct (distinct.cpp — sorted unique list), collect (collect.cpp),
sample (sample.cpp — first non-null), any/all (any.cpp/all.cpp),
stddev/variance (stddev_variance.cpp — merged via (n, Σx, Σx²) partials),
median/approximate_median (approximate_median.cpp — t-digest in the
reference; exact-at-small / quantile here), p50/p95/p99/p999
(DDSketch — engine extension, see :func:`_ddsketch`).

`resolution` time-bucketing (summarize.cpp:41-99 — Arrow temporal floor)
is exposed via :func:`time_bucket`.

Output column naming: every aggregate is ``<alias>`` given by the caller
(``sum_qty="sum(l_quantity)"`` style specs) so Ray results and oracle SQL
agree on names.
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import (
    AggregateFn,
    Count,
    Max,
    Mean,
    Min,
    Quantile,
    Std,
    Sum,
)

from tenzir_ray._ship import ship_by_value

#: `func(col)` or `func(col_a, col_b)` (two-column aggregates:
#: arg_min/arg_max/corr/covar_*)
_SPEC_RE = re.compile(
    r"^\s*(\w+)\s*\(\s*([\w.*]*(?:\s*,\s*[\w.*]+)?)\s*\)\s*$")


# NOTE: accumulators round-trip through Arrow blocks between the partial
# (per-block) and merge stages, so they must be Arrow-representable values
# (lists/tuples/scalars) — not Python sets.

def _col(block, col: str):
    """Column accessor that works for both Arrow and pandas blocks (Ray
    hands AggregateFn whatever block format the upstream produced)."""
    if isinstance(block, pa.Table):
        return block.column(col)
    return pa.Array.from_pandas(block[col])




# Exact distinct-set accumulators hold every unique value of a group in
# one Python list crossing the block boundary (semantics match the
# reference — its count_distinct is exact too). A skewed group with 10^8
# uniques would materialize the whole set in one merge, so the
# accumulators hard-stop at this bound with a pointer to the HLL path
# (`approx_count_distinct`) — a loud early error beats an OOM-killed
# worker deep in a 100 TB job.
DISTINCT_LIMIT = 5_000_000


def _guard_distinct(s: "list") -> "list":
    if len(s) > DISTINCT_LIMIT:
        raise ValueError(
            f"distinct/count_distinct: a group exceeded {DISTINCT_LIMIT:,} "
            "unique values — use approx_count_distinct (HLL) for "
            "high-cardinality groups, or raise summarize.DISTINCT_LIMIT"
        )
    return s


def _count_distinct(col: str, alias: str) -> AggregateFn:
    return AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda s, block: _guard_distinct(sorted(
            set(s) | set(pc.drop_null(_col(block, col)).unique().to_pylist())
        )),
        merge=lambda a, b: _guard_distinct(sorted(set(a) | set(b))),
        finalize=lambda s: len(s),
        name=alias,
    )


def _distinct(col: str, alias: str) -> AggregateFn:
    return AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda s, block: _guard_distinct(sorted(
            set(s) | set(pc.drop_null(_col(block, col)).unique().to_pylist())
        )),
        merge=lambda a, b: _guard_distinct(sorted(set(a) | set(b))),
        finalize=lambda s: list(s),
        name=alias,
    )


def _collect(col: str, alias: str) -> AggregateFn:
    return AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda acc, block: _guard_distinct(
            acc + pc.drop_null(_col(block, col)).to_pylist()
        ),
        merge=lambda a, b: _guard_distinct(a + b),
        finalize=lambda acc: acc,
        name=alias,
    )


def _sample(col: str, alias: str) -> AggregateFn:
    """First non-null value per group (sample.cpp:77)."""

    def _acc(acc, block):
        if acc is not None:
            return acc
        valid = pc.drop_null(_col(block, col))
        return valid[0].as_py() if len(valid) else None

    return AggregateFn(
        init=lambda k: None,
        accumulate_block=_acc,
        merge=lambda a, b: a if a is not None else b,
        finalize=lambda a: a,
        name=alias,
    )


def _any(col: str, alias: str) -> AggregateFn:
    return AggregateFn(
        init=lambda k: False,
        accumulate_block=lambda acc, block: acc
        or bool(pc.any(_col(block, col)).as_py()),
        merge=lambda a, b: a or b,
        finalize=bool,
        name=alias,
    )


def _all(col: str, alias: str) -> AggregateFn:
    return AggregateFn(
        init=lambda k: True,
        accumulate_block=lambda acc, block: acc
        and bool(pc.all(_col(block, col)).as_py()),
        merge=lambda a, b: a and b,
        finalize=bool,
        name=alias,
    )


def _variance(col: str, alias: str, ddof: int = 0) -> AggregateFn:
    """Merged via (n, Σx, Σx²) partials — the classic combiner form."""

    def _acc(acc, block):
        arr = pc.drop_null(_col(block, col)).to_numpy(zero_copy_only=False)
        return (acc[0] + len(arr), acc[1] + float(arr.sum()), acc[2] + float((arr * arr).sum()))

    def _fin(acc):
        n, s, ss = acc
        if n - ddof <= 0:
            return None
        return (ss - s * s / n) / (n - ddof)

    return AggregateFn(
        init=lambda k: (0, 0.0, 0.0),
        accumulate_block=_acc,
        merge=lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
        finalize=_fin,
        name=alias,
    )


def _stddev(col: str, alias: str, ddof: int = 0) -> AggregateFn:
    v = _variance(col, alias, ddof)
    fin = v.finalize

    def _sqrt(acc):
        var = fin(acc)
        return None if var is None else float(np.sqrt(var))

    return AggregateFn(
        init=v.init,
        accumulate_block=v.accumulate_block,
        merge=v.merge,
        finalize=_sqrt,
        name=alias,
    )




def _arg_extreme(cols: str, alias: str, is_min: bool) -> AggregateFn:
    """``arg_min(val, key)`` / ``arg_max(val, key)`` (DuckDB argument
    order): the value of ``val`` on the row where ``key`` is minimal /
    maximal. Rows where EITHER column is NULL are skipped (DuckDB
    rule). Ties break toward the side already held — deterministic only
    for unique keys, same as SQL. Accumulator: one (key, val) pair."""
    val_col, key_col = _two_cols(cols, "arg_min/arg_max")

    def _acc(acc, block):
        keys = _col(block, key_col)
        vals = _col(block, val_col)
        mask = pc.and_(pc.is_valid(keys), pc.is_valid(vals))
        if not pc.any(mask).as_py():
            return acc
        keys = keys.filter(mask)
        vals = vals.filter(mask)
        idx = (pc.index(keys, pc.min(keys)) if is_min
               else pc.index(keys, pc.max(keys))).as_py()
        k, v = keys[idx].as_py(), vals[idx].as_py()
        if acc is None or acc[0] is None:
            return [k, v]
        if (k < acc[0]) if is_min else (k > acc[0]):
            return [k, v]
        return acc

    def _merge(a, b):
        if a is None or a[0] is None:
            return b
        if b is None or b[0] is None:
            return a
        better = (b[0] < a[0]) if is_min else (b[0] > a[0])
        return b if better else a

    return AggregateFn(
        init=lambda k: None,
        accumulate_block=_acc,
        merge=_merge,
        finalize=lambda a: None if a is None else a[1],
        name=alias,
    )


def _two_cols(cols: str, what: str) -> tuple[str, str]:
    parts = [c.strip() for c in cols.split(",")]
    if len(parts) != 2 or not all(parts):
        raise ValueError(f"{what} takes exactly two columns, got {cols!r}")
    return parts[0], parts[1]


def _product(col: str, alias: str) -> AggregateFn:
    """DuckDB-style ``product()``: double product over non-null values;
    all-null group → NULL. Partials multiply — fully mergeable."""

    def _acc(acc, block):
        arr = pc.drop_null(_col(block, col)).to_numpy(zero_copy_only=False)
        if not len(arr):
            return acc
        p = float(np.prod(arr.astype(np.float64)))
        return [acc[0] + len(arr), acc[1] * p]

    return AggregateFn(
        init=lambda k: [0, 1.0],
        accumulate_block=_acc,
        merge=lambda a, b: [a[0] + b[0], a[1] * b[1]],
        finalize=lambda a: a[1] if a[0] else None,
        name=alias,
    )


def _bit_agg(col: str, alias: str, op: str) -> AggregateFn:
    """``bit_and`` / ``bit_or`` / ``bit_xor`` over non-null integers
    (all-null group → NULL). Mergeable by the same bit op."""
    fns = {"and": (lambda a, b: a & b, np.bitwise_and),
           "or": (lambda a, b: a | b, np.bitwise_or),
           "xor": (lambda a, b: a ^ b, np.bitwise_xor)}
    pyop, npop = fns[op]

    def _acc(acc, block):
        arr = pc.drop_null(_col(block, col)).to_numpy(zero_copy_only=False)
        if not len(arr):
            return acc
        v = int(npop.reduce(arr.astype(np.int64)))
        return v if acc is None else pyop(acc, v)

    return AggregateFn(
        init=lambda k: None,
        accumulate_block=_acc,
        merge=lambda a, b: (b if a is None
                            else a if b is None else pyop(a, b)),
        finalize=lambda a: a,
        name=alias,
    )


#: value-count accumulators (mode/entropy) hold one counter per unique
#: value of a group — same bound rationale as DISTINCT_LIMIT. The
#: counter dict crosses block boundaries as pickle bytes (an
#: Arrow-representable scalar; mixed-type nested lists are not).
def _value_counts_agg(col: str):
    import pickle

    def _load(acc) -> dict:
        return pickle.loads(acc) if acc else {}

    def _acc(acc, block):
        vc = pc.value_counts(pc.drop_null(_col(block, col)))
        if not len(vc):
            return acc
        merged = _load(acc)
        for item in vc.to_pylist():
            v = item["values"]
            merged[v] = merged.get(v, 0) + item["counts"]
        _guard_distinct(list(merged))
        return pickle.dumps(merged)

    def _merge(a, b):
        if not a:
            return b
        if not b:
            return a
        merged = _load(a)
        for v, c in _load(b).items():
            merged[v] = merged.get(v, 0) + c
        _guard_distinct(list(merged))
        return pickle.dumps(merged)

    return _load, _acc, _merge


def _mode(col: str, alias: str) -> AggregateFn:
    """Exact mode: the most frequent non-null value; ties break to the
    SMALLEST value (deterministic, unlike DuckDB's arbitrary pick —
    write oracles as `min value among max counts`). Bounded by
    DISTINCT_LIMIT per group."""
    _load, _acc, _merge = _value_counts_agg(col)

    def _fin(acc):
        counts = _load(acc)
        if not counts:
            return None
        best = max(counts.values())
        return min(v for v, c in counts.items() if c == best)

    return AggregateFn(init=lambda k: b"", accumulate_block=_acc,
                       merge=_merge, finalize=_fin, name=alias)


def _weighted_cont_quantile(vals, w, q):
    """Continuous (interpolated) quantile of a weighted value list —
    ``vals`` ascending, ``w`` positive int counts. Equals quantile_cont
    over the expanded multiset without expanding it."""
    n = int(w.sum())
    if n == 0:
        return None
    pos = q * (n - 1)
    lo, hi = int(np.floor(pos)), int(np.ceil(pos))
    cw = np.cumsum(w)
    vlo = float(vals[np.searchsorted(cw, lo, side="right")])
    vhi = float(vals[np.searchsorted(cw, hi, side="right")])
    return vlo + (vhi - vlo) * (pos - lo)


def _mad(col: str, alias: str) -> AggregateFn:
    """Exact median absolute deviation — DuckDB's ``mad(x)``:
    ``median(|x − median(x)|)`` with the continuous (interpolated)
    median on both passes. One distributed pass: blocks accumulate a
    value-count map (bounded by DISTINCT_LIMIT like mode/entropy), the
    finalizer computes both weighted medians without expanding."""
    _load, _acc, _merge = _value_counts_agg(col)

    def _fin(acc):
        counts = _load(acc)
        if not counts:
            return None
        vals = np.asarray(sorted(counts), dtype=np.float64)
        w = np.asarray([counts[v] for v in sorted(counts)], dtype=np.int64)
        med = _weighted_cont_quantile(vals, w, 0.5)
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        return _weighted_cont_quantile(dev[order], w[order], 0.5)

    return AggregateFn(init=lambda k: b"", accumulate_block=_acc,
                       merge=_merge, finalize=_fin, name=alias)


def _entropy(col: str, alias: str) -> AggregateFn:
    """Shannon entropy (log base 2) of the value distribution over
    non-null values — DuckDB's ``entropy()``. Empty group → 0.0."""
    _load, _acc, _merge = _value_counts_agg(col)

    def _fin(acc):
        counts = np.asarray(list(_load(acc).values()), dtype=np.float64)
        if not len(counts):
            return 0.0
        p = counts / counts.sum()
        return float(-(p * np.log2(p)).sum())

    return AggregateFn(init=lambda k: b"", accumulate_block=_acc,
                       merge=_merge, finalize=_fin, name=alias)


def _moments(col: str, alias: str, kind: str) -> AggregateFn:
    """Higher central moments from mergeable raw power sums
    (n, Σx, Σx², Σx³, Σx⁴):

    - ``skewness``: DuckDB/Excel sample skewness
      g1·√(n(n−1))/(n−2) with g1 = m3/m2^1.5 (needs n ≥ 3 and m2 > 0).
    - ``kurtosis``: DuckDB/Excel sample excess kurtosis
      ((n+1)·g2 + 6)·(n−1)/((n−2)(n−3)) with g2 = m4/m2² − 3
      (needs n ≥ 4 and m2 > 0).
    - ``skewness_pop`` / ``kurtosis_pop``: the population forms
      m3/m2^1.5 and m4/m2² − 3 (oracle-friendly closed SQL)."""

    def _acc(acc, block):
        x = pc.drop_null(_col(block, col)).to_numpy(
            zero_copy_only=False).astype(np.float64)
        if not len(x):
            return acc
        return [acc[0] + len(x), acc[1] + float(x.sum()),
                acc[2] + float((x ** 2).sum()),
                acc[3] + float((x ** 3).sum()),
                acc[4] + float((x ** 4).sum())]

    def _fin(acc):
        n, s1, s2, s3, s4 = acc
        if n == 0:
            return None
        mu = s1 / n
        m2 = s2 / n - mu * mu
        m3 = s3 / n - 3 * mu * s2 / n + 2 * mu ** 3
        m4 = (s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n
              - 3 * mu ** 4)
        if kind == "skewness_pop":
            return m3 / m2 ** 1.5 if m2 > 0 else None
        if kind == "kurtosis_pop":
            return m4 / (m2 * m2) - 3.0 if m2 > 0 else None
        if kind == "skewness":
            if n < 3 or m2 <= 0:
                return None
            g1 = m3 / m2 ** 1.5
            return g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0)
        # kurtosis (sample excess)
        if n < 4 or m2 <= 0:
            return None
        g2 = m4 / (m2 * m2) - 3.0
        return ((n + 1.0) * g2 + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))

    return AggregateFn(
        init=lambda k: [0, 0.0, 0.0, 0.0, 0.0],
        accumulate_block=_acc,
        merge=lambda a, b: [a[i] + b[i] for i in range(5)],
        finalize=_fin,
        name=alias,
    )


def _covar(cols: str, alias: str, kind: str) -> AggregateFn:
    """``covar_pop(y, x)`` / ``covar_samp`` / ``corr`` and the SQL
    linear-regression family ``regr_slope/intercept/r2/count/avgx/avgy/
    sxx/syy/sxy(y, x)`` — all from the same mergeable co-moment sums
    (n, Σx, Σy, Σxy, Σx², Σy²) over rows where BOTH columns are
    non-null (the SQL pairwise rule; PostgreSQL ordered-set aggregate
    definitions, matched by DuckDB)."""
    ycol, xcol = _two_cols(cols, "corr/covar")

    def _acc(acc, block):
        ya = _col(block, ycol)
        xa = _col(block, xcol)
        mask = pc.and_(pc.is_valid(ya), pc.is_valid(xa))
        y = ya.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
        x = xa.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
        if not len(x):
            return acc
        return [acc[0] + len(x), acc[1] + float(x.sum()),
                acc[2] + float(y.sum()), acc[3] + float((x * y).sum()),
                acc[4] + float((x * x).sum()),
                acc[5] + float((y * y).sum())]

    def _fin(acc):
        n, sx, sy, sxy, sxx, syy = acc
        if kind == "regr_count":
            return int(n)
        if n == 0 or (kind == "covar_samp" and n < 2):
            return None
        cov = sxy / n - (sx / n) * (sy / n)
        if kind == "covar_pop":
            return cov
        if kind == "covar_samp":
            return cov * n / (n - 1.0)
        if kind == "regr_avgx":
            return sx / n
        if kind == "regr_avgy":
            return sy / n
        # centered sums (Sxx = Σ(x-x̄)², Syy, Sxy) — clamp tiny negative
        # float residue so a constant column is exactly zero-variance
        cxx = max(sxx - sx * sx / n, 0.0)
        cyy = max(syy - sy * sy / n, 0.0)
        cxy = sxy - sx * sy / n
        if kind == "regr_sxx":
            return cxx
        if kind == "regr_syy":
            return cyy
        if kind == "regr_sxy":
            return cxy
        if kind == "regr_slope":
            return cxy / cxx if cxx > 0 else None
        if kind == "regr_intercept":
            if cxx <= 0:
                return None
            return sy / n - (cxy / cxx) * (sx / n)
        if kind == "regr_r2":
            # PostgreSQL rule: NULL when Sxx = 0; 1.0 when Syy = 0
            if cxx <= 0:
                return None
            if cyy <= 0:
                return 1.0
            return (cxy * cxy) / (cxx * cyy)
        vx = sxx / n - (sx / n) ** 2
        vy = syy / n - (sy / n) ** 2
        if vx <= 0 or vy <= 0:
            return None
        return cov / float(np.sqrt(vx * vy))

    return AggregateFn(
        init=lambda k: [0, 0.0, 0.0, 0.0, 0.0, 0.0],
        accumulate_block=_acc,
        merge=lambda a, b: [a[i] + b[i] for i in range(6)],
        finalize=_fin,
        name=alias,
    )


def _string_agg(col: str, alias: str, sep: str = ",") -> AggregateFn:
    """Ordered ``string_agg(col, ',' ORDER BY col)``: collect non-null
    values, sort, join — the only deterministic form on a parallel
    engine (arrival-order string_agg is not reproducible). Bounded by
    DISTINCT_LIMIT like collect."""

    def _acc(acc, block):
        return _guard_distinct(
            acc + [str(v) for v in
                   pc.drop_null(_col(block, col)).to_pylist()])

    return AggregateFn(
        init=lambda k: [],
        accumulate_block=_acc,
        merge=lambda a, b: _guard_distinct(a + b),
        finalize=lambda acc: sep.join(sorted(acc)) if acc else None,
        name=alias,
    )


def _hll(col: str, alias: str, p: int = 12) -> AggregateFn:
    """HyperLogLog approximate count-distinct (Flajolet et al. 2007) —
    the mergeable-sketch path for distinct counts at 10^10 scale where
    the exact set-union accumulator would not fit. Registers travel as a
    bytes accumulator (Arrow-representable); merge = elementwise max.
    Standard error ≈ 1.04/sqrt(2^p) (~1.6% at p=12)."""
    m = 1 << p

    def _acc(acc: bytes, block) -> bytes:
        import pandas as pd_mod

        regs = np.frombuffer(acc, dtype=np.uint8).copy()
        vals = pc.drop_null(_col(block, col)).unique()
        if len(vals) == 0:
            return regs.tobytes()
        h = pd_mod.util.hash_array(
            np.asarray(vals.to_pylist(), dtype=object)
        ).astype(np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        rank = np.ones(len(h), dtype=np.uint8)
        mask_bit = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        for _ in range(64 - p):
            zero = (rest_work & mask_bit) == 0
            if not zero.any():
                break
            rank[zero] += 1
            rest_work = rest_work << np.uint64(1)
            rest_work[~zero] = mask_bit  # freeze finished rows
        np.maximum.at(regs, idx, rank)
        return regs.tobytes()

    def _merge(a: bytes, b: bytes) -> bytes:
        return np.maximum(
            np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    def _fin(acc: bytes) -> int:
        regs = np.frombuffer(acc, dtype=np.uint8).astype(np.float64)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -regs))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        return int(round(est))

    return AggregateFn(
        init=lambda k: bytes(m),
        accumulate_block=_acc,
        merge=_merge,
        finalize=_fin,
        name=alias,
    )


def _dds_reduce(idx: np.ndarray, cnt: np.ndarray):
    """Collapse duplicate bucket indices (sorted unique + summed counts)."""
    if len(idx) == 0:
        return idx.astype(np.int32), cnt.astype(np.int64)
    u, inv = np.unique(idx, return_inverse=True)
    c = np.bincount(inv, weights=cnt.astype(np.float64)).astype(np.int64)
    return u.astype(np.int32), c


def _ddsketch(col: str, alias: str, q: float, alpha: float = 0.01) -> AggregateFn:
    """DDSketch approximate quantile (Masson, Rim & Lee, VLDB 2019 —
    public algorithm): log-γ bucketed counts with γ=(1+α)/(1-α) give a
    RELATIVE-error guarantee |est/true - 1| ≤ α for any quantile, and the
    sketch merges by adding bucket counts — the mergeable path for
    p95/p99-style aggregates at 10^10 rows where exact quantiles would
    shuffle every value. Three-part store (negative mirror, zero count,
    positive), packed to bytes so accumulators stay Arrow-representable
    across block boundaries (same discipline as the HLL registers above).
    Reference analog: approximate_median.cpp (t-digest)."""
    import struct

    gamma = (1.0 + alpha) / (1.0 - alpha)
    inv_lg = 1.0 / np.log(gamma)
    coef = 2.0 * gamma / (gamma + 1.0)  # bucket midpoint = coef * γ^(i-1)

    def _enc(nidx, ncnt, zero, pidx, pcnt) -> bytes:
        return (struct.pack("<qqq", len(nidx), len(pidx), int(zero))
                + nidx.astype(np.int32).tobytes()
                + ncnt.astype(np.int64).tobytes()
                + pidx.astype(np.int32).tobytes()
                + pcnt.astype(np.int64).tobytes())

    def _dec(b: bytes):
        nn, npos, zero = struct.unpack_from("<qqq", b, 0)
        off = 24
        nidx = np.frombuffer(b, np.int32, nn, off); off += 4 * nn
        ncnt = np.frombuffer(b, np.int64, nn, off); off += 8 * nn
        pidx = np.frombuffer(b, np.int32, npos, off); off += 4 * npos
        pcnt = np.frombuffer(b, np.int64, npos, off)
        return nidx, ncnt, zero, pidx, pcnt

    def _acc(acc: bytes, block) -> bytes:
        arr = pc.drop_null(_col(block, col))
        if len(arr) == 0:
            return acc
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        nidx0, ncnt0, zero, pidx0, pcnt0 = _dec(acc)
        pos, neg = v > 0, v < 0
        zero += int(len(v) - pos.sum() - neg.sum())
        pidx1 = np.ceil(np.log(v[pos]) * inv_lg).astype(np.int32)
        nidx1 = np.ceil(np.log(-v[neg]) * inv_lg).astype(np.int32)
        pu, pc_ = _dds_reduce(np.concatenate([pidx0, pidx1]),
                              np.concatenate([pcnt0, np.ones(len(pidx1), np.int64)]))
        nu, nc_ = _dds_reduce(np.concatenate([nidx0, nidx1]),
                              np.concatenate([ncnt0, np.ones(len(nidx1), np.int64)]))
        return _enc(nu, nc_, zero, pu, pc_)

    def _merge(a: bytes, b: bytes) -> bytes:
        na, ca, za, pa_, cpa = _dec(a)
        nb, cb, zb, pb, cpb = _dec(b)
        nu, nc_ = _dds_reduce(np.concatenate([na, nb]), np.concatenate([ca, cb]))
        pu, pc_ = _dds_reduce(np.concatenate([pa_, pb]), np.concatenate([cpa, cpb]))
        return _enc(nu, nc_, za + zb, pu, pc_)

    def _fin(acc: bytes) -> "float | None":
        nidx, ncnt, zero, pidx, pcnt = _dec(acc)
        total = int(zero + ncnt.sum() + pcnt.sum())
        if total == 0:
            return None
        # ascending value order: negatives (idx desc → most negative
        # first), the zero bucket, positives (idx asc)
        vals = np.concatenate([
            -coef * np.power(gamma, nidx[::-1].astype(np.float64) - 1.0),
            np.zeros(1 if zero else 0),
            coef * np.power(gamma, pidx.astype(np.float64) - 1.0),
        ])
        cnts = np.concatenate([
            ncnt[::-1].astype(np.float64),
            np.full(1 if zero else 0, float(zero)),
            pcnt.astype(np.float64),
        ])
        rank = q * (total - 1)
        j = int(np.searchsorted(np.cumsum(cnts), rank, side="right"))
        return float(vals[min(j, len(vals) - 1)])

    return AggregateFn(
        init=lambda k: _enc(np.zeros(0, np.int32), np.zeros(0, np.int64), 0,
                            np.zeros(0, np.int32), np.zeros(0, np.int64)),
        accumulate_block=_acc,
        merge=_merge,
        finalize=_fin,
        name=alias,
    )


def _heavy_hitters(col: str, alias: str, k_top: int = 10,
                   capacity: int = 256) -> AggregateFn:
    """Misra-Gries heavy-hitters sketch (Misra & Gries 1982; merge rule
    from Agarwal et al., "Mergeable Summaries", PODS 2012 — both
    public): at most ``capacity`` counters survive any accumulate/merge,
    so a group with 10^9 distinct values costs O(capacity) memory while
    every value with true frequency > N/(capacity+1) is guaranteed to
    surface. Complements the exact `top`/`rare` operators (which
    pre-aggregate but still shuffle every distinct key) the same way
    HLL complements count_distinct. Finalize returns the estimated
    top-``k_top`` values, ordered by estimated count desc (value asc on
    ties, so output is deterministic). Accumulator = parallel
    values/counts lists (Arrow-representable)."""

    def _combine(vals_a, cnts_a, vals_b, cnts_b):
        v = np.concatenate([np.asarray(vals_a, dtype=object),
                            np.asarray(vals_b, dtype=object)])
        c = np.concatenate([np.asarray(cnts_a, dtype=np.int64),
                            np.asarray(cnts_b, dtype=np.int64)])
        if len(v) == 0:
            return [], []
        u, inv = np.unique(v.astype(str), return_inverse=True)
        cc = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
        if len(u) > capacity:
            # MG decrement: subtract the (capacity+1)-th largest count,
            # drop non-positive — the mergeable-summaries trim
            cut = np.partition(cc, -capacity - 1)[-capacity - 1]
            keep = cc > cut
            u, cc = u[keep], cc[keep] - cut
        return u.tolist(), cc.tolist()

    def _acc(acc, block):
        arr = pc.drop_null(_col(block, col))
        if len(arr) == 0:
            return acc
        vc = arr.cast(pa.string()).value_counts()
        return dict(zip(("v", "c"), _combine(
            acc["v"], acc["c"],
            vc.field("values").to_pylist(),
            vc.field("counts").to_pylist(),
        )))

    def _merge(a, b):
        return dict(zip(("v", "c"), _combine(a["v"], a["c"], b["v"], b["c"])))

    def _fin(acc):
        v = np.asarray(acc["v"], dtype=object)
        c = np.asarray(acc["c"], dtype=np.int64)
        order = np.lexsort((v.astype(str), -c))
        return [str(x) for x in v[order][:k_top]]

    return AggregateFn(
        init=lambda k: {"v": [], "c": []},
        accumulate_block=_acc,
        merge=_merge,
        finalize=_fin,
        name=alias,
    )


_PCTL_RE = re.compile(r"^p(\d{1,3})$")


def make_agg(func: str, col: str, alias: str):
    """Build one aggregate from (function-name, column, output alias)."""
    func = func.lower()
    if func == "min":
        return Min(col, alias_name=alias)
    if func == "max":
        return Max(col, alias_name=alias)
    if func == "sum":
        return Sum(col, alias_name=alias)
    if func == "mean" or func == "avg":
        return Mean(col, alias_name=alias)
    if func == "count":
        if col in ("", "*", "."):
            return Count(alias_name=alias)
        # SQL count(col) skips nulls; Ray's default ignore_nulls=False
        # counts them (matches the pandas partial path, oracle-checked)
        return Count(col, ignore_nulls=True, alias_name=alias)
    if func == "count_distinct":
        return _count_distinct(col, alias)
    if func in ("approx_count_distinct", "hll"):
        return _hll(col, alias)
    if func == "distinct":
        return _distinct(col, alias)
    if func == "collect":
        return _collect(col, alias)
    if func == "sample":
        return _sample(col, alias)
    if func == "any":
        return _any(col, alias)
    if func == "all":
        return _all(col, alias)
    if func in ("variance", "var_pop"):
        return _variance(col, alias, ddof=0)
    if func in ("stddev", "stddev_pop"):
        return _stddev(col, alias, ddof=0)
    if func in ("stddev_samp",):
        return _stddev(col, alias, ddof=1)
    if func in ("median", "approximate_median"):
        return Quantile(col, q=0.5, alias_name=alias)
    if func == "quantile":
        return Quantile(col, alias_name=alias)
    if func in ("heavy_hitters", "top_values"):
        return _heavy_hitters(col, alias)
    if func in ("arg_min", "min_by"):
        return _arg_extreme(col, alias, is_min=True)
    if func in ("arg_max", "max_by"):
        return _arg_extreme(col, alias, is_min=False)
    if func == "product":
        return _product(col, alias)
    if func in ("bit_and", "bit_or", "bit_xor"):
        return _bit_agg(col, alias, func[4:])
    if func == "mode":
        return _mode(col, alias)
    if func == "entropy":
        return _entropy(col, alias)
    if func in ("mad", "median_absolute_deviation"):
        return _mad(col, alias)
    if func in ("skewness", "kurtosis", "skewness_pop", "kurtosis_pop"):
        return _moments(col, alias, func)
    if func in ("corr", "covar_pop", "covar_samp", "regr_slope",
                "regr_intercept", "regr_r2", "regr_count", "regr_avgx",
                "regr_avgy", "regr_sxx", "regr_syy", "regr_sxy"):
        return _covar(col, alias, func)
    if func == "string_agg":
        return _string_agg(col, alias)
    if func in ("bool_and",):
        return _all(col, alias)
    if func in ("bool_or",):
        return _any(col, alias)
    m = _PCTL_RE.match(func)
    if m:  # p50 / p95 / p99 / p999 → DDSketch approximate percentile
        d = m.group(1)  # 1-2 digits = percent; 3 digits = per-mille
        if d == "100":  # p100 is the max, not the 100th per-mille
            q = 1.0
        elif len(d) <= 2:
            q = int(d) / 100
        elif int(d) > 990:
            q = int(d) / 1000  # p999 / p995-style tail quantiles
        else:
            raise ValueError(
                f"ambiguous percentile spec {func!r}: use p0-p99, p100, "
                "or a 3-digit tail per-mille like p999"
            )
        return _ddsketch(col, alias, q=q)
    raise ValueError(f"unknown aggregation function: {func}")


# aggregates decomposable into fixed-width per-batch partials (the
# combiner set): partial spec = (partial kind, finalizer)
_PARTIAL_FNS = {
    "sum", "count", "min", "max", "mean", "avg", "any", "all",
    "variance", "var_pop", "stddev", "stddev_pop",
}


def _partial_plan(keys: list[str], parsed: list[tuple[str, str, str]]):
    """Per-batch partial-aggregation plan for the decomposable
    functions: pcol → (source column, pandas aggfunc)."""
    partial_aggs: dict[str, tuple[str, str]] = {}
    for alias, fn, col in parsed:
        if fn in ("sum",):
            partial_aggs[f"{alias}__s"] = (col, "sum")
        elif fn == "count":
            if col in ("", "*", "."):
                partial_aggs[f"{alias}__n"] = (keys[0], "size")
            else:
                partial_aggs[f"{alias}__n"] = (col, "count")
        elif fn in ("min",):
            partial_aggs[f"{alias}__mn"] = (col, "min")
        elif fn in ("max",):
            partial_aggs[f"{alias}__mx"] = (col, "max")
        elif fn in ("mean", "avg"):
            partial_aggs[f"{alias}__s"] = (col, "sum")
            partial_aggs[f"{alias}__c"] = (col, "count")
        elif fn == "any":
            partial_aggs[f"{alias}__mx"] = (col, "max")
        elif fn == "all":
            partial_aggs[f"{alias}__mn"] = (col, "min")
        elif fn in ("variance", "var_pop", "stddev", "stddev_pop"):
            partial_aggs[f"{alias}__c"] = (col, "count")
            partial_aggs[f"{alias}__s"] = (col, "sum")
            partial_aggs[f"{alias}__q"] = (f"_sq_{col}", "sum")
    sq_cols = sorted(
        {c[4:] for c, _f in partial_aggs.values() if c.startswith("_sq_")}
    )
    return partial_aggs, sq_cols


_PARTIAL_MERGE = {"sum": "sum", "count": "sum", "size": "sum",
                  "min": "min", "max": "max"}


def _merge_partials(parts, keys: list[str], partial_aggs: dict):
    """Re-aggregate partial rows by ``keys`` (``[]`` = global). Partials
    are algebraic, so this is valid at ANY coarser grouping — the basis
    of the rollup/cube single-pass optimization."""
    named = {p: pd.NamedAgg(column=p, aggfunc=_PARTIAL_MERGE[f])
             for p, (_c, f) in partial_aggs.items()}
    if keys:
        return parts.groupby(keys, as_index=False, sort=False,
                             dropna=False).agg(**named)
    return pd.DataFrame({
        p: [getattr(parts[p], _PARTIAL_MERGE[f])()]
        for p, (_c, f) in partial_aggs.items()
    })


def _finalize_partials(merged, out, parsed: list[tuple[str, str, str]]):
    for alias, fn, col in parsed:
        if fn == "sum":
            out[alias] = merged[f"{alias}__s"]
        elif fn == "count":
            out[alias] = merged[f"{alias}__n"].astype(np.int64)
        elif fn == "min":
            out[alias] = merged[f"{alias}__mn"]
        elif fn == "max":
            out[alias] = merged[f"{alias}__mx"]
        elif fn in ("mean", "avg"):
            out[alias] = merged[f"{alias}__s"] / merged[f"{alias}__c"]
        elif fn == "any":
            # all-null group: max partial is NaN and astype(bool) maps
            # NaN→True; fill to match the Arrow-native path (any→False)
            mx = merged[f"{alias}__mx"]
            out[alias] = mx.notna() & mx.where(mx.notna(), False).astype(bool)
        elif fn == "all":
            mn = merged[f"{alias}__mn"]
            out[alias] = mn.isna() | mn.where(mn.notna(), True).astype(bool)
        elif fn in ("variance", "var_pop", "stddev", "stddev_pop"):
            n = merged[f"{alias}__c"].astype(np.float64)
            s = merged[f"{alias}__s"].astype(np.float64)
            q = merged[f"{alias}__q"].astype(np.float64)
            var = (q - s * s / n) / n
            out[alias] = np.sqrt(var) if fn.startswith("stddev") else var
    return out


def _run_partials(ds, keys: list[str], partial_aggs: dict, sq_cols: list):
    """Stream per-batch partial rows to the driver (blocks × |groups|
    rows — never the corpus)."""
    named = {p: pd.NamedAgg(column=c, aggfunc=f)
             for p, (c, f) in partial_aggs.items()}

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        for c in sq_cols:
            df = df.assign(**{f"_sq_{c}": df[c].astype(np.float64) ** 2})
        return df.groupby(keys, as_index=False, sort=False,
                          dropna=False).agg(**named)

    return ds.map_batches(_partial, batch_format="pandas").to_pandas()


def _partial_summarize(ds, keys: list[str], parsed: list[tuple[str, str, str]]):
    """Shuffle-free grouped aggregation for decomposable functions:
    every batch pre-aggregates to ≤|groups| partial rows inside
    ``map_batches`` (C pandas groupby), the tiny partials stream to the
    driver, and one final vectorized merge finishes. No groupby shuffle
    at all — the right shape for low-cardinality keys (the driver holds
    blocks × |groups| partial rows; use :func:`summarize_hash` for
    millions of groups)."""
    import ray.data

    partial_aggs, sq_cols = _partial_plan(keys, parsed)
    parts = _run_partials(ds, keys, partial_aggs, sq_cols)
    if not len(parts):
        cols = {k: [] for k in keys}
        cols.update({alias: [] for alias, _, _ in parsed})
        return ray.data.from_arrow(pa.table(cols))
    merged = _merge_partials(parts, keys, partial_aggs)
    out = _finalize_partials(merged, merged[keys].copy(), parsed)
    return ray.data.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


def grouping_sets(ds, sets: list[list[str]], grouping_id: str | None = None,
                  **aggs: str):
    """SQL ``GROUP BY GROUPING SETS`` (:func:`rollup` / :func:`cube` are
    the standard sugar): aggregate the same input at several
    granularities in ONE pass over the data.

    The classic optimization: per-batch partials are computed once at
    the union-of-all-keys granularity inside ``map_batches``; every
    requested set is then a re-aggregation of those algebraic partials
    (sum/count re-sum, min/max re-extremize, mean/variance recombine
    from (s, c, q)) — the corpus is never re-read per level. Keys absent
    from a set come back NULL, exactly like SQL; ``grouping_id`` adds
    DuckDB's ``GROUPING_ID(union...)`` bitmask (MSB = first union key)
    to disambiguate rollup-NULLs from data-NULLs.

    Driver state is O(blocks × |finest groups|) partial rows — the
    :func:`summarize` low-cardinality contract. For million-group
    dimensions run :func:`summarize_hash` per level instead.

    Supported aggregates: the decomposable set (sum/count/min/max/mean/
    avg/any/all/variance/stddev)."""
    import ray.data

    parsed: list[tuple[str, str, str]] = []
    for alias, spec in aggs.items():
        m = _SPEC_RE.match(spec)
        if not m:
            raise ValueError(f"bad aggregate spec {spec!r} (want 'func(col)')")
        parsed.append((alias, m.group(1).lower(), m.group(2)))
    bad = [fn for _, fn, _ in parsed if fn not in _PARTIAL_FNS]
    if bad:
        raise ValueError(
            f"grouping_sets supports decomposable aggregates only, got "
            f"{bad}; run summarize() once per grouping set for holistic "
            "functions")
    sets = [list(s) for s in sets]
    ukeys: list[str] = []
    for s in sets:
        for k in s:
            if k not in ukeys:
                ukeys.append(k)
    if not ukeys:
        raise ValueError("grouping_sets: at least one non-empty set")

    partial_aggs, sq_cols = _partial_plan(ukeys, parsed)
    parts = _run_partials(ds, ukeys, partial_aggs, sq_cols)
    if not len(parts):
        cols = {k: [] for k in ukeys}
        if grouping_id:
            cols[grouping_id] = []
        cols.update({alias: [] for alias, _, _ in parsed})
        return ray.data.from_arrow(pa.table(cols))
    key_types = {
        k: pa.Table.from_pandas(parts[[k]], preserve_index=False)
             .schema.field(k).type
        for k in ukeys
    }

    levels = []
    for s in sets:
        merged = _merge_partials(parts, s, partial_aggs)
        base = merged[s].copy() if s else pd.DataFrame(index=merged.index)
        out = _finalize_partials(merged, base, parsed)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        arrays, names = [], []
        for k in ukeys:
            if k in s:
                arrays.append(tbl.column(k).cast(key_types[k]))
            else:
                arrays.append(pa.nulls(len(tbl), key_types[k]))
            names.append(k)
        if grouping_id:
            gid = sum(1 << (len(ukeys) - 1 - i)
                      for i, k in enumerate(ukeys) if k not in s)
            arrays.append(pa.array([gid] * len(tbl), pa.int64()))
            names.append(grouping_id)
        for alias, _fn, _col in parsed:
            arrays.append(tbl.column(alias))
            names.append(alias)
        levels.append(pa.table(dict(zip(names, arrays))))
    # unify aggregate dtypes across levels (e.g. int min at one level,
    # null-free float at another) against the finest level's schema
    widest = max(levels, key=lambda t: t.num_rows)
    levels = [t.cast(widest.schema) for t in levels]
    return ray.data.from_arrow(pa.concat_tables(levels))


def rollup(ds, by: list[str], grouping_id: str | None = None, **aggs: str):
    """``GROUP BY ROLLUP(by...)``: every prefix of ``by`` plus the grand
    total, in one pass (see :func:`grouping_sets`)."""
    by = [by] if isinstance(by, str) else list(by)
    sets = [by[:i] for i in range(len(by), -1, -1)]
    return grouping_sets(ds, sets, grouping_id=grouping_id, **aggs)


def cube(ds, by: list[str], grouping_id: str | None = None, **aggs: str):
    """``GROUP BY CUBE(by...)``: all 2^n subsets, one pass."""
    by = [by] if isinstance(by, str) else list(by)
    sets = [[k for j, k in enumerate(by) if mask & (1 << j)]
            for mask in range((1 << len(by)) - 1, -1, -1)]
    return grouping_sets(ds, sets, grouping_id=grouping_id, **aggs)


def group_quantiles(ds, by: str | list[str], column: str,
                    quantiles: dict[str, float],
                    buckets: int | None = None,
                    interpolation: str = "disc"):
    """EXACT per-group quantiles. ``interpolation="disc"`` (default) is
    SQL ``quantile_disc``: the element at index ``ceil(q·n) − 1`` of the
    sorted non-null values — an actual data value, so results are
    bit-equal across engines; ``interpolation="linear"`` is SQL
    ``quantile_cont`` / PostgreSQL ``percentile_cont``: linear
    interpolation at position ``q·(n−1)`` (numeric columns only) —
    both verified against DuckDB. One output row per group, one column
    per ``quantiles`` entry (alias → q).

    Complements the streaming sketches (`approximate_median`, DDSketch
    percentiles): those are one-pass and corpus-scale but approximate;
    this is exact and costs one grouped exchange — per task a single
    vectorized sort over its groups' values. Use it when groups fit a
    worker (the grouped-apply contract); sketches when they don't."""
    keys = [by] if isinstance(by, str) else list(by)
    if interpolation not in ("disc", "linear"):
        raise ValueError(
            f"interpolation must be 'disc' or 'linear', got {interpolation!r}")
    linear = interpolation == "linear"
    for alias, q in quantiles.items():
        if not 0.0 <= float(q) <= 1.0:
            raise ValueError(f"group_quantiles: {alias}={q} outside [0,1]")

    def _q(g: pd.DataFrame) -> pd.DataFrame:
        # nulls sort last WITHIN each group, so the first ns values of a
        # group are its sorted non-null values; an all-null group still
        # emits a row (NULL quantiles), matching SQL GROUP BY
        g = g.sort_values(keys + [column], kind="mergesort",
                          na_position="last")
        gid = g.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        starts = np.unique(gid, return_index=True)[1]
        starts.sort()
        ends = np.append(starts[1:], len(g))
        vals = g[column].to_numpy()
        nn = (~pd.isna(vals)).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(nn)])
        ns = cum[ends] - cum[starts]
        out = g[keys].iloc[starts].reset_index(drop=True)
        for alias, q in quantiles.items():
            if linear:
                pos = float(q) * np.maximum(ns - 1, 0).astype(np.float64)
                lo = np.floor(pos).astype(np.int64)
                hi = np.minimum(lo + 1, np.maximum(ns - 1, 0))
                frac = pos - lo
                vlo = vals[starts + lo].astype(np.float64)
                vhi = vals[starts + hi].astype(np.float64)
                col = pd.Series(vlo + (vhi - vlo) * frac)
                col[ns == 0] = np.nan
                out[alias] = col.to_numpy()
                continue
            idx = np.ceil(float(q) * ns).astype(np.int64) - 1
            idx = np.clip(idx, 0, np.maximum(ns - 1, 0))
            col = pd.Series(vals[starts + idx])
            col[ns == 0] = None
            out[alias] = col.to_numpy()
        return out

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, keys, _q, num_buckets=buckets, tag="gq")


def summarize(ds, by: str | list[str] | None = None, **aggs: str):
    """``summarize(ds, by=["k"], total="sum(x)", n="count(*)")``.

    Each kwarg is ``alias="func(column)"``; output columns are the group
    keys + aliases (names chosen by the caller → SQL-comparable).

    When every aggregate is combiner-decomposable (sum/count/min/max/
    mean/any/all/variance/stddev) and ``by`` is given, the shuffle-free
    partial-aggregation path runs (pre-aggregate per batch → tiny final
    merge); otherwise Ray's native groupby().aggregate() handles the
    holistic functions (median, distinct, collect, count_distinct, …).
    """
    parsed: list[tuple[str, str, str]] = []
    for alias, spec in aggs.items():
        m = _SPEC_RE.match(spec)
        if not m:
            raise ValueError(f"bad aggregate spec {spec!r} (want 'func(col)')")
        parsed.append((alias, m.group(1).lower(), m.group(2)))
    if by is not None and all(fn in _PARTIAL_FNS for _, fn, _ in parsed):
        keys = [by] if isinstance(by, str) else list(by)
        return _partial_summarize(ds, keys, parsed)
    if by is None:
        # Ray 2.49's column-less Count() yields 0 on a GLOBAL aggregate
        # (fine under groupby) — star-counts go through an explicit
        # row-counting AggregateFn here instead
        def _rows(alias):
            return AggregateFn(
                init=lambda k: 0,
                accumulate_block=lambda a, block: a + (
                    block.num_rows if hasattr(block, "num_rows") else len(block)
                ),
                merge=lambda a, b: a + b,
                finalize=lambda a: a,
                name=alias,
            )

        specs = [
            _rows(alias) if fn == "count" and col in ("", "*", ".")
            else make_agg(fn, col, alias)
            for alias, fn, col in parsed
        ]
        result = ds.aggregate(*specs)  # global aggregate → dict
        return pa.table({k: [v] for k, v in result.items()})
    specs = [make_agg(fn, col, alias) for alias, fn, col in parsed]
    keys = [by] if isinstance(by, str) else by
    return ds.groupby(keys).aggregate(*specs)


_PANDAS_FN = {
    "sum": "sum",
    "min": "min",
    "max": "max",
    "mean": "mean",
    "avg": "mean",
    "median": "median",
    "count_distinct": "nunique",
    "any": "any",
    "all": "all",
    "sample": "first",
}


def summarize_hash(ds, by: str | list[str], buckets: int | None = None,
                   **aggs: str):
    """High-cardinality grouped aggregation.

    Ray's native ``groupby().aggregate()`` pays per-group Python overhead
    (measured ~4ms/group); with many groups that dominates. This path
    hash-partitions the keys over the packed exchange (fine buckets,
    8x cluster CPUs; reduce tasks coalesced by measured bytes) and runs
    ONE vectorized pandas groupby per reduce task — task-count Python
    calls total, C inside. Partitioning by key hash keeps groups
    intact, so results are exact.

    Supports the C-fast subset: sum/min/max/mean/avg/median/count/
    count(*)/count_distinct/any/all/sample. Use :func:`summarize` for
    variance/stddev/collect/distinct or low-cardinality keys.
    """
    import pandas as pd

    keys = [by] if isinstance(by, str) else list(by)
    named: dict[str, tuple] = {}
    count_aliases: list[str] = []
    for alias, spec in aggs.items():
        m = _SPEC_RE.match(spec)
        if not m:
            raise ValueError(f"bad aggregate spec {spec!r}")
        fn, col = m.group(1).lower(), m.group(2)
        if fn == "count" and col in ("", "*", "."):
            count_aliases.append(alias)
        elif fn in _PANDAS_FN:
            named[alias] = (col, _PANDAS_FN[fn])
        else:
            raise ValueError(
                f"{fn} not supported by summarize_hash; use summarize()"
            )

    def _agg(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, as_index=False, sort=False)
        out = gb.agg(**named) if named else gb.size().drop(columns=["size"])
        for alias in count_aliases:
            out[alias] = gb.size()["size"].to_numpy()
        return out

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, keys, _agg, num_buckets=buckets)


def time_bucket(ds, column: str, resolution: str, out: str | None = None):
    """Add a floored time-bucket column (reference summarize.cpp:41-99
    `resolution`): resolution like '1h', '15m', '1d'."""
    m = re.match(r"^(\d+)\s*(s|m|min|h|d)$", resolution)
    if not m:
        raise ValueError(f"bad resolution {resolution!r}")
    mult = {"s": 1, "m": 60, "min": 60, "h": 3600, "d": 86400}[m.group(2)]
    width_s = int(m.group(1)) * mult
    out = out or f"{column}_bucket"

    def _bucket(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        unit = col.type.unit if pa.types.is_timestamp(col.type) else "ns"
        per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        ints = col.cast(pa.int64())
        width = width_s * per_s
        floored = pc.multiply(pc.floor(pc.divide(pc.cast(ints, pa.float64()), width)).cast(pa.int64()), width)
        return batch.append_column(out, floored.cast(col.type))

    return ds.map_batches(_bucket, batch_format="pyarrow")


ship_by_value(sys.modules[__name__])
