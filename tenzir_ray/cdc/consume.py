"""Generic streaming consumer → exactly-once lake epochs.

The broker connectors the reference ships (kafka/amqp/zmq/sqs plugins)
all reduce to the same loop: poll a source for new messages, cut them
into bounded chunks, apply each chunk exactly once, remember the offset.
This module is that loop with the source abstracted to a ``drain_fn`` —
plug in ``TcpLineListener.drain``, a kafka-python ``poll()`` wrapper, an
SQS receive loop, or anything else that returns "new messages since the
last call".

Exactly-once comes from the lake: epoch ids are sequential
(``<prefix>-000042``), the manifest's committed-epoch set is the
consumer's resume checkpoint, and re-applying a committed id is a no-op
— so a crashed consumer restarts at ``next_epoch_index`` and an
at-least-once source (redelivered messages within one epoch) collapses
under the per-key LWW merge.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable


def next_epoch_index(lake, epoch_prefix: str) -> int:
    """Resume point: one past the highest committed ``<prefix>-NNNNNN``."""
    best = -1
    for eid in lake.manifest.committed_epoch_ids():
        if eid.startswith(epoch_prefix + "-"):
            tail = eid.rsplit("-", 1)[-1]
            if tail.isdigit():
                best = max(best, int(tail))
    return best + 1


def consume_stream(
    lake,
    drain_fn: Callable[[], list],
    parse_fn: Callable[[list], "pa.Table"],
    epoch_prefix: str = "stream",
    min_batch: int = 10_000,
    max_wait_s: float = 5.0,
    idle_limit: int | None = None,
    poll_s: float = 0.25,
    sleep=None,
    clock=None,
) -> list[dict]:
    """Pump ``drain_fn`` into the lake as exactly-once epochs.

    Messages accumulate until ``min_batch`` rows or ``max_wait_s`` since
    the first pending message, then apply as one epoch. ``parse_fn``
    turns the raw message list into a change table (lsn/op/conv_id/...).
    Stops after ``idle_limit`` consecutive empty polls (None = forever).
    ``sleep``/``clock`` are injectable for tests. Returns the epoch
    results."""
    sleep = sleep or _time.sleep
    clock = clock or _time.monotonic
    results: list[dict] = []
    pending: list = []
    first_pending_t: float | None = None
    idx = next_epoch_index(lake, epoch_prefix)
    idle = 0

    def _flush():
        nonlocal pending, first_pending_t, idx
        if not pending:
            return
        tbl = parse_fn(pending)
        res = lake.apply_changes(tbl, epoch_id=f"{epoch_prefix}-{idx:06d}")
        results.append(res)
        idx += 1
        pending = []
        first_pending_t = None

    while True:
        msgs = drain_fn()
        if msgs:
            idle = 0
            if first_pending_t is None:
                first_pending_t = clock()
            pending.extend(msgs)
            if len(pending) >= min_batch:
                _flush()
                continue
        else:
            idle += 1
            if idle_limit is not None and idle >= idle_limit:
                _flush()
                return results
        if first_pending_t is not None and clock() - first_pending_t >= max_wait_s:
            _flush()
            continue
        sleep(poll_s)
