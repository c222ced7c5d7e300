"""Kafka-shape partitioned-log broker + exactly-once group consumption.

The reference's kafka/amqp/sqs plugins (plugins/kafka/src/plugin.cpp:374,
plugins/amqp) wrap a client library around the same engine problem: a
topic is a set of append-only partitions, each message has a (partition,
offset) position, consumers in a group split partitions among
themselves, and progress is a per-partition committed offset. This
module implements that engine logic over a file-backed log — the part
that is NOT librdkafka — so the offset/rebalance/exactly-once machinery
is real and testable in-sandbox; a networked broker slots in by
replacing :class:`FileBroker` with a client of the same four methods.

Log layout (segmented, Kafka-style, so a seek never scans the whole
partition)::

    root/<topic>/p<partition>/
        segment-<base_offset>.log   # length-prefixed records
        meta.json                   # {"next_offset": N}
    root/_groups/<group>/<topic>/
        members/<consumer_id>       # liveness marker (mtime heartbeat)
        offsets/p<partition>        # committed offset cache (see below)

Record framing: ``[u32 klen][key][u32 vlen][value]`` little-endian;
klen ``0xFFFFFFFF`` = null key (same shape as the bitz writer,
sources/writers.py).

**Exactly-once into the lake** (:func:`consume_partitioned`): the
consumed offset range rides in the lake epoch's lineage record
(``epoch_meta``) and therefore commits in the SAME atomic manifest
write as the data — the Kafka-Connect "store offsets in the sink
transaction" pattern. Resume reads the manifest (source of truth)
mirrored by the broker-side offset cache (survives
``truncate_lineage``); the epoch id embeds (topic, group, partition,
start_offset), so a replayed chunk after a crash-before-commit applies
fresh, and a chunk whose commit DID land is skipped by id. Kill the
consumer at any instant and restart: zero loss, zero duplication.

Scale shape: one lake epoch per (partition, chunk) keeps consumers
embarrassingly parallel across partitions — on a cluster, one consumer
process per node, partitions range-assigned, every epoch apply is
itself a distributed ``map_batches`` pipeline.
"""

from __future__ import annotations

import json
import os
import struct
import threading
import time
from typing import Any, Callable

_NULL = 0xFFFFFFFF
_U32 = struct.Struct("<I")


def _part_dir(root: str, topic: str, partition: int) -> str:
    return os.path.join(root, topic, f"p{partition:05d}")


def _atomic_json(path: str, obj: Any) -> None:
    tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class FileBroker:
    """File-backed topic/partition/offset log (single writer per
    partition, like a Kafka broker owns its partitions)."""

    def __init__(self, root: str, segment_records: int = 8192):
        self.root = root
        self.segment_records = segment_records
        self._lock = threading.Lock()
        os.makedirs(root, exist_ok=True)

    # -- admin ---------------------------------------------------------
    def create_topic(self, topic: str, partitions: int = 4) -> None:
        for p in range(partitions):
            d = _part_dir(self.root, topic, p)
            os.makedirs(d, exist_ok=True)
            meta = os.path.join(d, "meta.json")
            if not os.path.exists(meta):
                _atomic_json(meta, {"next_offset": 0})

    def partitions(self, topic: str) -> list[int]:
        d = os.path.join(self.root, topic)
        if not os.path.isdir(d):
            raise KeyError(f"unknown topic {topic!r}")
        return sorted(
            int(n[1:]) for n in os.listdir(d) if n.startswith("p")
        )

    def end_offsets(self, topic: str) -> dict[int, int]:
        out = {}
        for p in self.partitions(topic):
            meta = os.path.join(_part_dir(self.root, topic, p), "meta.json")
            with open(meta) as f:
                out[p] = json.load(f)["next_offset"]
        return out

    # -- produce -------------------------------------------------------
    def produce_many(
        self,
        topic: str,
        values: list[bytes],
        keys: list[bytes | None] | None = None,
        partition_of: Callable[[int], int] | None = None,
    ) -> dict[int, int]:
        """Append messages; partition = crc32(key) % P (keyed), round-robin
        (unkeyed), or explicit via ``partition_of(i)``. Returns the new
        end offset per touched partition. One directory scan + one open
        file per touched partition — the append itself is a sequential
        write (the whole point of a log)."""
        import zlib

        parts = self.partitions(topic)
        np_ = len(parts)
        by_part: dict[int, list[tuple[bytes | None, bytes]]] = {}
        for i, v in enumerate(values):
            k = keys[i] if keys else None
            if partition_of is not None:
                p = partition_of(i) % np_
            elif k is not None:
                p = zlib.crc32(k) % np_
            else:
                p = i % np_
            by_part.setdefault(parts[p], []).append((k, v))
        ends: dict[int, int] = {}
        with self._lock:
            for p, msgs in by_part.items():
                ends[p] = self._append(topic, p, msgs)
        return ends

    def produce(self, topic: str, value: bytes, key: bytes | None = None,
                partition: int | None = None) -> tuple[int, int]:
        pf = (lambda i: partition) if partition is not None else None
        ends = self.produce_many(topic, [value], [key], partition_of=pf)
        ((p, end),) = ends.items()
        return p, end - 1

    @staticmethod
    def _committed_bytes(seg: str, nrecs: int) -> int:
        """Byte length of the first ``nrecs`` committed records in a
        segment (walks the framing once — only needed when meta.json
        predates the tail cache or after a crash)."""
        if nrecs <= 0 or not os.path.exists(seg):
            return 0
        with open(seg, "rb") as f:
            data = f.read()
        pos = 0
        for _ in range(nrecs):
            if pos + 4 > len(data):
                break
            (klen,) = _U32.unpack_from(data, pos)
            pos += 4 + (0 if klen == _NULL else klen)
            if pos + 4 > len(data):
                break
            (vlen,) = _U32.unpack_from(data, pos)
            pos += 4 + vlen
        return min(pos, len(data))

    def _append(self, topic: str, p: int, msgs) -> int:
        d = _part_dir(self.root, topic, p)
        meta_path = os.path.join(d, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        next_off = meta["next_offset"]
        tail_seg, tail_bytes = meta.get("tail_seg"), meta.get("tail_bytes")
        while msgs:
            base = (next_off // self.segment_records) * self.segment_records
            seg = os.path.join(d, f"segment-{base:012d}.log")
            room = base + self.segment_records - next_off
            chunk, msgs = msgs[:room], msgs[room:]
            buf = bytearray()
            for k, v in chunk:
                if k is None:
                    buf += _U32.pack(_NULL)
                else:
                    buf += _U32.pack(len(k)) + k
                buf += _U32.pack(len(v)) + v
            # torn-tail recovery: a producer killed mid-write leaves
            # partial record bytes past the committed end (meta.json
            # never advanced, so readers were safe) — truncate to the
            # committed length before appending so the framing stays
            # intact for every later record.
            if base == tail_seg and tail_bytes is not None:
                committed = tail_bytes
            else:
                committed = self._committed_bytes(seg, next_off - base)
            with open(seg, "r+b" if os.path.exists(seg) else "wb") as f:
                f.truncate(committed)
                f.seek(committed)
                f.write(buf)
                f.flush()
                os.fsync(f.fileno())
            next_off += len(chunk)
            tail_seg, tail_bytes = base, committed + len(buf)
        _atomic_json(meta_path, {"next_offset": next_off,
                                 "tail_seg": tail_seg,
                                 "tail_bytes": tail_bytes})
        return next_off

    # -- fetch ---------------------------------------------------------
    def read(self, topic: str, partition: int, offset: int,
             max_records: int = 10_000) -> list[tuple[int, bytes | None, bytes]]:
        """Sequential scan from ``offset``: pick the segment whose base
        covers it, skip records up to the offset, then stream. Returns
        ``[(offset, key, value), ...]`` — at most ``max_records``, empty
        at end-of-log. Only committed (fsynced) data is visible because
        ``meta.json`` advances after the segment write."""
        end = self.end_offsets(topic).get(partition, 0)
        offset = max(0, offset)
        if offset >= end:
            return []
        d = _part_dir(self.root, topic, partition)
        out: list[tuple[int, bytes | None, bytes]] = []
        off = offset
        while off < end and len(out) < max_records:
            base = (off // self.segment_records) * self.segment_records
            seg = os.path.join(d, f"segment-{base:012d}.log")
            with open(seg, "rb") as f:
                data = f.read()
            pos, rec_off = 0, base
            while pos < len(data) and len(out) < max_records and rec_off < end:
                (klen,) = _U32.unpack_from(data, pos)
                pos += 4
                if klen == _NULL:
                    k = None
                else:
                    k = data[pos:pos + klen]
                    pos += klen
                (vlen,) = _U32.unpack_from(data, pos)
                pos += 4
                v = data[pos:pos + vlen]
                pos += vlen
                if rec_off >= off:
                    out.append((rec_off, k, v))
                rec_off += 1
            off = rec_off
        return out


# ---------------------------------------------------------------------------
# consumer groups


def _group_dir(root: str, group: str, topic: str) -> str:
    return os.path.join(root, "_groups", group, topic)


class GroupConsumer:
    """One member of a consumer group: registers itself, computes its
    range assignment over the live membership, polls its partitions,
    and checkpoints offsets.

    Membership is file-based: each member touches
    ``members/<consumer_id>`` as a heartbeat; members silent for
    ``session_timeout_s`` are treated as dead at the next
    :meth:`rebalance` (every member derives the same assignment from the
    same sorted live-member list — the deterministic range assignor, no
    coordinator needed for a static-ish group)."""

    def __init__(self, broker: FileBroker, topic: str, group: str,
                 consumer_id: str, session_timeout_s: float = 30.0,
                 clock: Callable[[], float] = time.time):
        self.broker = broker
        self.topic = topic
        self.group = group
        self.consumer_id = consumer_id
        self.session_timeout_s = session_timeout_s
        self.clock = clock
        g = _group_dir(broker.root, group, topic)
        os.makedirs(os.path.join(g, "members"), exist_ok=True)
        os.makedirs(os.path.join(g, "offsets"), exist_ok=True)
        self.positions: dict[int, int] = {}
        self.assignment: list[int] = []
        self.heartbeat()
        self.rebalance()

    # -- membership ----------------------------------------------------
    def heartbeat(self) -> None:
        me = os.path.join(_group_dir(self.broker.root, self.group, self.topic),
                          "members", self.consumer_id)
        with open(me, "w") as f:
            f.write(str(self.clock()))

    def leave(self) -> None:
        me = os.path.join(_group_dir(self.broker.root, self.group, self.topic),
                          "members", self.consumer_id)
        try:
            os.unlink(me)
        except FileNotFoundError:
            pass

    def _live_members(self) -> list[str]:
        d = os.path.join(_group_dir(self.broker.root, self.group, self.topic),
                         "members")
        now = self.clock()
        live = []
        for name in os.listdir(d):
            try:
                with open(os.path.join(d, name)) as f:
                    t = float(f.read().strip() or 0)
            except (OSError, ValueError):
                continue
            if now - t <= self.session_timeout_s:
                live.append(name)
        return sorted(live)

    def rebalance(self) -> list[int]:
        """Recompute this member's partitions (range assignment over the
        sorted live membership). Positions for partitions we lost are
        dropped; newly gained partitions resume from the committed
        offset on first poll."""
        members = self._live_members()
        parts = self.broker.partitions(self.topic)
        if self.consumer_id not in members:
            self.heartbeat()
            members = self._live_members()
        idx = members.index(self.consumer_id)
        n, m = len(parts), len(members)
        per, extra = divmod(n, m)
        start = idx * per + min(idx, extra)
        count = per + (1 if idx < extra else 0)
        mine = parts[start:start + count]
        self.positions = {p: o for p, o in self.positions.items() if p in mine}
        self.assignment = mine
        return mine

    # -- offsets -------------------------------------------------------
    def _offset_path(self, p: int) -> str:
        return os.path.join(_group_dir(self.broker.root, self.group, self.topic),
                            "offsets", f"p{p:05d}")

    def committed(self, p: int) -> int:
        try:
            with open(self._offset_path(p)) as f:
                return json.load(f)["offset"]
        except (OSError, ValueError, KeyError):
            return 0

    def commit(self, p: int, offset: int) -> None:
        """Advance the committed offset (monotone — a stale writer can
        never move it backwards)."""
        if offset > self.committed(p):
            _atomic_json(self._offset_path(p), {"offset": offset})

    # -- poll ----------------------------------------------------------
    def poll(self, max_records: int = 10_000
             ) -> dict[int, list[tuple[int, bytes | None, bytes]]]:
        """Fetch new records from assigned partitions, starting each at
        its in-session position (or committed offset on first contact).
        Advances in-session positions; call :meth:`commit` (or use the
        lake path, which commits transactionally) to persist."""
        self.heartbeat()
        out: dict[int, list] = {}
        for p in self.assignment:
            pos = self.positions.get(p)
            if pos is None:
                pos = self.committed(p)
            recs = self.broker.read(self.topic, p, pos, max_records)
            if recs:
                out[p] = recs
                self.positions[p] = recs[-1][0] + 1
        return out


# ---------------------------------------------------------------------------
# exactly-once partitioned-log → lake


def _resume_offsets(lake, consumer: GroupConsumer) -> dict[int, int]:
    """Committed offset per partition: max over (a) lake-manifest epoch
    metadata — the transactional source of truth — and (b) the
    broker-side offset cache (survives manifest lineage truncation)."""
    out = {p: consumer.committed(p) for p in consumer.assignment}
    for e in lake.manifest.epochs:
        m = e.get("meta") or {}
        if (m.get("topic") == consumer.topic
                and m.get("group") == consumer.group):
            p = m.get("partition")
            if p in out:
                out[p] = max(out[p], m.get("next", 0))
    return out


def consume_partitioned(
    lake,
    consumer: GroupConsumer,
    parse_fn: Callable[[list[tuple[int, bytes | None, bytes]]], "pa.Table"],
    max_records: int = 100_000,
    idle_limit: int | None = 3,
    poll_s: float = 0.25,
    sleep=time.sleep,
    max_chunks: int | None = None,
) -> list[dict]:
    """Pump a partitioned log into the lake, exactly once.

    Per (partition, chunk): epoch id ``k-<topic>-<group>-p<P>-o<start>``,
    ``epoch_meta={"topic","group","partition","start","next"}`` committed
    atomically with the data; then the broker-side offset cache is
    advanced (best-effort mirror — the manifest already holds the
    truth). Crash at ANY point and restart: offsets re-derive from the
    manifest, an uncommitted chunk replays fresh (its id never landed),
    a committed one is skipped by id. Stops after ``idle_limit``
    consecutive empty polls (None = run forever) or ``max_chunks``
    applied chunks (test hook for mid-stream kills)."""
    results: list[dict] = []
    idle = 0
    applied = 0
    consumer.positions.update(_resume_offsets(lake, consumer))
    while True:
        batches = consumer.poll(max_records)
        if not batches:
            idle += 1
            if idle_limit is not None and idle >= idle_limit:
                return results
            sleep(poll_s)
            continue
        idle = 0
        for p, recs in sorted(batches.items()):
            start, nxt = recs[0][0], recs[-1][0] + 1
            eid = (f"k-{consumer.topic}-{consumer.group}-"
                   f"p{p:05d}-o{start:012d}")
            res = lake.apply_changes(
                parse_fn(recs), epoch_id=eid,
                epoch_meta={"topic": consumer.topic, "group": consumer.group,
                            "partition": p, "start": start, "next": nxt},
            )
            if res.get("skipped"):
                # zombie fencing: another member already committed a chunk
                # starting at this offset (rebalance race). Our chunk may
                # cover a DIFFERENT range — advancing past it would lose
                # records — so resync this partition from the manifest.
                consumer.positions[p] = _resume_offsets(lake, consumer)[p]
                continue
            consumer.commit(p, nxt)
            results.append(res)
            applied += 1
            if max_chunks is not None and applied >= max_chunks:
                return results


import sys as _sys

from tenzir_ray._ship import ship_by_value as _ship

_ship(_sys.modules[__name__])
