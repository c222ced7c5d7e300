"""Scheduled re-execution — the reference's `every`/`cron` operators
(builtins/operators/every_cron.cpp:53-87, croncpp at :11) as documented
driver loops: a Ray Data pipeline is a bounded job, so periodic
re-execution is a driver concern, not an in-dataset operator (the same
conclusion the reference reaches by wrapping the sub-pipeline in a
scheduler actor).

``clock``/``sleep`` are injectable so tests run on a simulated clock.
"""

from __future__ import annotations

import time as _time
from datetime import datetime, timedelta


def every(interval_s: float, fn, runs: int | None = None,
          clock=_time.monotonic, sleep=_time.sleep) -> list:
    """Run ``fn()`` every ``interval_s`` seconds, ``runs`` times (None =
    forever). Fixed-rate schedule: the next fire time advances by the
    interval regardless of how long ``fn`` took (reference `every`
    semantics — a slow run does not shift the schedule)."""
    results = []
    i = 0
    next_t = clock()
    while runs is None or i < runs:
        results.append(fn())
        i += 1
        if runs is not None and i >= runs:
            break
        next_t += interval_s
        delay = next_t - clock()
        if delay > 0:
            sleep(delay)
    return results


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = int(part)
            end = hi if step > 1 else start  # "5/10" = from 5, step 10
        out.update(range(start, end + 1, step))
    return {v for v in out if lo <= v <= hi}


def _cron_sets(spec: str):
    fields = spec.split()
    if len(fields) != 5:
        raise ValueError(f"cron spec needs 5 fields, got {spec!r}")
    minute = _parse_field(fields[0], 0, 59)
    hour = _parse_field(fields[1], 0, 23)
    dom = _parse_field(fields[2], 1, 31)
    month = _parse_field(fields[3], 1, 12)
    # STANDARD cron day-of-week: 0 (or 7) = Sunday, 1 = Monday … 6 =
    # Saturday; convert to python weekday numbers (0 = Monday)
    dow_cron = _parse_field(fields[4], 0, 7)
    dow = {(v - 1) % 7 for v in dow_cron}
    # POSIX/Vixie rule: when BOTH day-of-month and day-of-week are
    # restricted (neither field is '*'), a timestamp fires if EITHER
    # matches — '0 0 13 * 5' means the 13th OR any Friday, not only
    # Friday-the-13th (croncpp, which the reference's cron uses, agrees)
    dom_star = fields[2].lstrip().startswith("*")
    dow_star = fields[4].lstrip().startswith("*")
    day_is_or = not dom_star and not dow_star
    return minute, hour, dom, month, dow, day_is_or


def cron_next(spec: str, after: datetime) -> datetime:
    """The first fire time strictly after ``after`` for a 5-field cron
    spec (minute hour day-of-month month day-of-week; supports ``*``,
    ``*/n``, ``a-b``, ``a,b,c``). Minute-resolution scan, bounded to 4
    years."""
    minute, hour, dom, month, dow, day_is_or = _cron_sets(spec)
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    limit = after + timedelta(days=4 * 366)
    while t <= limit:
        if day_is_or:
            day_ok = t.day in dom or t.weekday() in dow
        else:
            day_ok = t.day in dom and t.weekday() in dow
        if (
            t.minute in minute
            and t.hour in hour
            and day_ok
            and t.month in month
        ):
            return t
        t += timedelta(minutes=1)
    raise ValueError(f"cron spec {spec!r} never fires")


def cron(spec: str, fn, runs: int, now=datetime.now, sleep=_time.sleep) -> list:
    """Run ``fn()`` at each cron fire time, ``runs`` times."""
    results = []
    for _ in range(runs):
        nxt = cron_next(spec, now())
        delay = (nxt - now()).total_seconds()
        if delay > 0:
            sleep(delay)
        results.append(fn())
    return results
