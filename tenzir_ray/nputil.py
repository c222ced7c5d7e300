"""Shared numpy micro-kernels used across stages (single source for
fixes — e.g. dtype/overflow tweaks — instead of per-module copies)."""

from __future__ import annotations

import sys

import numpy as np

from tenzir_ray._ship import ship_by_value


def within_group_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated — the standard grouped-arange
    used by every vectorized explode (chunks per doc, intervals per
    segment, salts per partition)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


ship_by_value(sys.modules[__name__])
