"""Stream-shaped stateful operators.

Ray Data is a batch engine with unordered blocks; the reference's
stream operators (deduplicate with copy limits / distance / timeout,
adjacent-`unique`) assume a totally ordered event stream. We provide
them as actor stages with EXPLICIT ordering contracts:

- ordered mode (``concurrency=1`` + ``preserve_order``): exact reference
  semantics over the stream order;
- sharded mode (pool > 1): per-key-shard ordering only — each key's
  events are processed by one actor in arrival order per shard, the
  cross-shard interleaving is arbitrary (the distributed relaxation;
  ordering caveat follows the reference's explicit event_order tracking,
  libtenzir/include/tenzir/pipeline.hpp:151).

Reference: builtins/operators/deduplicate.cpp:102-185 (per-key emit at
most `limit` copies; forget a key after `distance` intervening events or
`timeout` idle), builtins/operators/unique.cpp (adjacent duplicates).
"""

from __future__ import annotations

import sys
import time
from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value


class StreamingDeduplicate:
    """Per-key copy-limited dedup with distance/timeout forgetting.

    State per actor: key → (copies_emitted, last_seen_event_no,
    last_seen_wallclock). Keys expire after ``distance`` intervening
    events or ``timeout`` seconds idle (reference deduplicate.cpp flags
    --limit/--distance/--timeout).
    """

    def __init__(self, by: list[str], limit: int = 1,
                 distance: int | None = None, timeout_s: float | None = None):
        self.by = by
        self.limit = limit
        self.distance = distance
        self.timeout_s = timeout_s
        self.state: OrderedDict[tuple, list] = OrderedDict()
        self.event_no = 0

    def _expire(self) -> None:
        now = time.monotonic()
        drop = [
            k
            for k, (_, ev, ts) in self.state.items()
            if (self.distance is not None and self.event_no - ev > self.distance)
            or (self.timeout_s is not None and now - ts > self.timeout_s)
        ]
        for k in drop:
            del self.state[k]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keep = np.zeros(len(batch), dtype=bool)
        keys = list(zip(*(batch[c] for c in self.by))) if len(batch) else []
        now = time.monotonic()
        for i, key in enumerate(keys):
            self.event_no += 1
            ent = self.state.get(key)
            if ent is None:
                self.state[key] = [1, self.event_no, now]
                keep[i] = True
            else:
                if (
                    (self.distance is not None and self.event_no - ent[1] > self.distance)
                    or (self.timeout_s is not None and now - ent[2] > self.timeout_s)
                ):
                    ent[0] = 0  # forgotten → key is fresh again
                ent[1], ent[2] = self.event_no, now
                if ent[0] < self.limit:
                    ent[0] += 1
                    keep[i] = True
        if self.distance is not None or self.timeout_s is not None:
            self._expire()
        return batch.loc[keep]


def streaming_deduplicate(ds, by: list[str], limit: int = 1,
                          distance: int | None = None,
                          timeout_s: float | None = None,
                          concurrency: int = 1, batch_size: int = 8192):
    """Apply streaming dedup. concurrency=1 → exact stream semantics
    (single actor sees every event); >1 relaxes to per-actor state."""
    return ds.map_batches(
        StreamingDeduplicate,
        fn_constructor_args=(by, limit, distance, timeout_s),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AdjacentUnique:
    """Suppress adjacent duplicate rows across batch boundaries
    (reference unique.cpp — stream semantics; concurrency must be 1)."""

    def __init__(self, by: list[str] | None = None):
        self.by = by
        self.last_key: tuple | None = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        cols = self.by or list(batch.columns)
        # vectorized adjacent-dup mask: row equals previous row on cols
        as_str = batch[cols].astype(str)
        eq_prev = (as_str == as_str.shift(1)).all(axis=1)
        keep = ~eq_prev.to_numpy()
        first_key = tuple(batch.iloc[0][cols].astype(str))
        if self.last_key is not None and first_key == self.last_key:
            keep[0] = False
        self.last_key = tuple(batch.iloc[-1][cols].astype(str))
        return batch.loc[keep]


def adjacent_unique(ds, by: list[str] | None = None, batch_size: int = 8192):
    """Adjacent-duplicate suppression (single ordered actor)."""
    from ray.data import DataContext

    DataContext.get_current().execution_options.preserve_order = True
    return ds.map_batches(
        AdjacentUnique,
        fn_constructor_args=(by,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=1,
    )


class Measure:
    """Replace data with per-batch count/byte metrics (reference
    measure.cpp:163)."""

    def __init__(self):
        self.t0 = time.monotonic()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "events": pa.array([batch.num_rows], pa.int64()),
                "bytes": pa.array([batch.nbytes], pa.int64()),
                "elapsed_s": pa.array([time.monotonic() - self.t0], pa.float64()),
            }
        )


def measure(ds, batch_size: int = 65536):
    return ds.map_batches(Measure, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=1)


ship_by_value(sys.modules[__name__])
