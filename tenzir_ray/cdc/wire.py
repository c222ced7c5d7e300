"""Typed wire-protocol broker adapters (kafka / SQS) behind the
:class:`tenzir_ray.cdc.broker.FileBroker` data-plane interface.

The sandbox has no network and no client libraries, so these adapters
are TYPED BUT UNTESTED against a real endpoint (VERDICT r3 #7 ships
them deliberately in that state): imports are guarded, construction
fails fast with an actionable error when the client library is absent,
and the method surface is conformance-checked against FileBroker in
tests/test_round4_ops.py so the engine half (consume_partitioned's
offsets-in-manifest exactly-once, rebalance, resume) slots onto a real
broker without code changes.

Data-plane contract (duck-typed; what :func:`...broker.consume_partitioned`
and :class:`...broker.GroupConsumer` call on a broker):

- ``create_topic(topic, partitions)``
- ``partitions(topic) -> list[int]``
- ``end_offsets(topic) -> dict[int, int]``
- ``produce_many(topic, values, keys=None, partition_of=None)
  -> dict[int, int]``
- ``produce(topic, value, key=None, partition=None) -> (partition,
  offset)``
- ``read(topic, partition, offset, max_records) -> [(offset, key,
  value), ...]``

Group COORDINATION is a separate concern: FileBroker pairs with the
file-based :class:`GroupConsumer`; a real Kafka deployment should let
librdkafka's native consumer groups do membership/rebalance and keep
using the lake's offsets-in-manifest pattern for exactly-once (the
committed offset in Kafka is then only a hint, exactly as the
broker-side offset cache is for FileBroker).

Reference analogs: plugins/kafka/src/plugin.cpp:374 (librdkafka
consumer/producer wiring), plugins/sqs (queue poll loop).
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable


@runtime_checkable
class BrokerProtocol(Protocol):
    """The data-plane surface every broker (file or wire) exposes."""

    def create_topic(self, topic: str, partitions: int = 4) -> None: ...

    def partitions(self, topic: str) -> list[int]: ...

    def end_offsets(self, topic: str) -> dict[int, int]: ...

    def produce_many(
        self,
        topic: str,
        values: list[bytes],
        keys: list[bytes | None] | None = None,
        partition_of: Callable[[int], int] | None = None,
    ) -> dict[int, int]: ...

    def produce(self, topic: str, value: bytes, key: bytes | None = None,
                partition: int | None = None) -> tuple[int, int]: ...

    def read(self, topic: str, partition: int, offset: int,
             max_records: int = 10_000
             ) -> list[tuple[int, bytes | None, bytes]]: ...


class KafkaBroker:
    """librdkafka-shaped adapter (``confluent_kafka``). Each method maps
    1:1 onto client calls; no engine logic lives here — exactly-once is
    the lake's offsets-in-manifest commit, not Kafka's.

    UNTESTED in-sandbox (no network, no librdkafka); constructor fails
    fast when the client library is missing."""

    def __init__(self, bootstrap_servers: str, *,
                 client_config: dict | None = None,
                 consumer_timeout_s: float = 5.0):
        try:
            import confluent_kafka  # noqa: F401
            import confluent_kafka.admin  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent in sandbox
            raise RuntimeError(
                "KafkaBroker needs the confluent_kafka (librdkafka) "
                "package; pip install confluent-kafka on a networked "
                "deployment"
            ) from e
        self._ck = confluent_kafka
        cfg = {"bootstrap.servers": bootstrap_servers,
               **(client_config or {})}
        self._cfg = cfg
        self._admin = confluent_kafka.admin.AdminClient(dict(cfg))
        self._producer = confluent_kafka.Producer(dict(cfg))
        self._timeout = consumer_timeout_s

    # -- admin ---------------------------------------------------------
    def create_topic(self, topic: str, partitions: int = 4) -> None:
        from confluent_kafka.admin import NewTopic

        fs = self._admin.create_topics(
            [NewTopic(topic, num_partitions=partitions)]
        )
        for f in fs.values():
            try:
                f.result(self._timeout)
            except Exception as e:  # already-exists is fine
                if "TOPIC_ALREADY_EXISTS" not in str(e):
                    raise

    def partitions(self, topic: str) -> list[int]:
        md = self._admin.list_topics(topic, timeout=self._timeout)
        t = md.topics.get(topic)
        if t is None or t.error is not None:
            raise KeyError(f"unknown topic {topic!r}")
        return sorted(t.partitions)

    def end_offsets(self, topic: str) -> dict[int, int]:
        out: dict[int, int] = {}
        consumer = self._consumer()
        try:
            for p in self.partitions(topic):
                tp = self._ck.TopicPartition(topic, p)
                _lo, hi = consumer.get_watermark_offsets(
                    tp, timeout=self._timeout)
                out[p] = hi
        finally:
            consumer.close()
        return out

    # -- produce -------------------------------------------------------
    def produce_many(
        self,
        topic: str,
        values: list[bytes],
        keys: list[bytes | None] | None = None,
        partition_of: Callable[[int], int] | None = None,
    ) -> dict[int, int]:
        np_ = len(self.partitions(topic))
        touched: set[int] = set()
        for i, v in enumerate(values):
            kwargs: dict = {"value": v}
            if keys and keys[i] is not None:
                kwargs["key"] = keys[i]
            if partition_of is not None:
                p = partition_of(i) % np_
                kwargs["partition"] = p
                touched.add(p)
            self._producer.produce(topic, **kwargs)
        self._producer.flush(self._timeout)
        ends = self.end_offsets(topic)
        return {p: e for p, e in ends.items()
                if not touched or p in touched}

    def produce(self, topic: str, value: bytes, key: bytes | None = None,
                partition: int | None = None) -> tuple[int, int]:
        # single-message path reports the ACTUAL landing slot via the
        # delivery callback (FileBroker contract: (partition, offset) of
        # the write, broker.py produce) — end_offsets alone cannot name
        # which partition an unkeyed message went to
        landed: list[tuple[int, int]] = []
        errors: list = []

        def _cb(err, msg):
            if err is None:
                landed.append((msg.partition(), msg.offset()))
            else:
                errors.append(err)

        kwargs: dict = {"value": value, "on_delivery": _cb}
        if key is not None:
            kwargs["key"] = key
        if partition is not None:
            kwargs["partition"] = partition
        self._producer.produce(topic, **kwargs)
        self._producer.flush(self._timeout)
        if errors:
            # broker rejection (message too large, unknown partition, …)
            # — surface the real cause, distinct from a flush timeout
            raise IOError(f"produce: delivery failed: {errors[0]}")
        if not landed:
            raise IOError(
                "produce: delivery not confirmed within "
                f"{self._timeout}s (message may still be queued; a retry "
                "can duplicate it)")
        return landed[0]

    # -- consume -------------------------------------------------------
    def read(self, topic: str, partition: int, offset: int,
             max_records: int = 10_000
             ) -> list[tuple[int, bytes | None, bytes]]:
        consumer = self._consumer()
        out: list[tuple[int, bytes | None, bytes]] = []
        try:
            tp = self._ck.TopicPartition(topic, partition, max(0, offset))
            consumer.assign([tp])
            end = self.end_offsets(topic).get(partition, 0)
            while len(out) < max_records:
                msg = consumer.poll(self._timeout)
                if msg is None or msg.error() is not None:
                    break
                out.append((msg.offset(), msg.key(), msg.value()))
                if msg.offset() + 1 >= end:
                    break
        finally:
            consumer.close()
        return out

    def _consumer(self):
        return self._ck.Consumer({
            **self._cfg,
            "group.id": "tenzir-ray-adhoc-reader",
            "enable.auto.commit": False,
            "auto.offset.reset": "earliest",
        })


class SqsBroker:
    """boto3-shaped adapter. SQS has no partitions or offset replay, so
    the mapping is documented and deliberately weaker:

    - a "topic" with P partitions is P queues named ``<topic>-p<i>``;
    - offsets are SYNTHETIC receive counters (monotone per partition in
      this process) — ``read`` consumes destructively (delete after
      receive), so re-reading an old offset range is NOT possible.
      Exactly-once still holds end-to-end because the lake's epoch-id
      skip dedups redeliveries (SQS is at-least-once); resume-from-
      offset degrades to resume-from-queue-head.

    UNTESTED in-sandbox (no network, no boto3); constructor fails fast
    when boto3 is missing."""

    def __init__(self, *, region_name: str | None = None,
                 queue_prefix: str = "", client=None):
        if client is None:  # pragma: no cover - boto3 absent in sandbox
            try:
                import boto3
            except ImportError as e:
                raise RuntimeError(
                    "SqsBroker needs boto3; pip install boto3 on a "
                    "networked deployment"
                ) from e
            client = boto3.client("sqs", region_name=region_name)
        self._sqs = client
        self._prefix = queue_prefix
        self._urls: dict[str, str] = {}
        self._counters: dict[tuple[str, int], int] = {}

    def _qname(self, topic: str, partition: int) -> str:
        return f"{self._prefix}{topic}-p{partition:05d}"

    def _url(self, topic: str, partition: int) -> str:
        name = self._qname(topic, partition)
        if name not in self._urls:
            self._urls[name] = self._sqs.get_queue_url(
                QueueName=name)["QueueUrl"]
        return self._urls[name]

    def create_topic(self, topic: str, partitions: int = 4) -> None:
        for p in range(partitions):
            r = self._sqs.create_queue(QueueName=self._qname(topic, p))
            self._urls[self._qname(topic, p)] = r["QueueUrl"]

    def partitions(self, topic: str) -> list[int]:
        prefix = f"{self._prefix}{topic}-p"
        r = self._sqs.list_queues(QueueNamePrefix=prefix)
        out = []
        for url in r.get("QueueUrls", []):
            name = url.rsplit("/", 1)[-1]
            out.append(int(name[len(prefix):]))
        if not out:
            raise KeyError(f"unknown topic {topic!r}")
        return sorted(out)

    def end_offsets(self, topic: str) -> dict[int, int]:
        # synthetic: consumed-so-far + currently visible backlog
        out: dict[int, int] = {}
        for p in self.partitions(topic):
            attrs = self._sqs.get_queue_attributes(
                QueueUrl=self._url(topic, p),
                AttributeNames=["ApproximateNumberOfMessages"],
            )["Attributes"]
            backlog = int(attrs.get("ApproximateNumberOfMessages", 0))
            out[p] = self._counters.get((topic, p), 0) + backlog
        return out

    def produce_many(
        self,
        topic: str,
        values: list[bytes],
        keys: list[bytes | None] | None = None,
        partition_of: Callable[[int], int] | None = None,
    ) -> dict[int, int]:
        import zlib

        parts = self.partitions(topic)
        np_ = len(parts)
        by_part: dict[int, list[bytes]] = {}
        for i, v in enumerate(values):
            k = keys[i] if keys else None
            if partition_of is not None:
                p = partition_of(i) % np_
            elif k is not None:
                p = zlib.crc32(k) % np_
            else:
                p = i % np_
            by_part.setdefault(parts[p], []).append(v)
        import base64

        for p, msgs in by_part.items():
            url = self._url(topic, p)
            for chunk_start in range(0, len(msgs), 10):  # SQS batch cap
                chunk = msgs[chunk_start:chunk_start + 10]
                # SQS bodies are TEXT (strict UTF-8 on the wire) but the
                # broker contract is bytes — base64 both ways so binary
                # payloads (arrow/compressed) survive
                self._sqs.send_message_batch(
                    QueueUrl=url,
                    Entries=[
                        {"Id": str(j),
                         "MessageBody": base64.b64encode(m).decode("ascii"),
                         **self._entry_extras(topic, p, chunk_start + j, m)}
                        for j, m in enumerate(chunk)
                    ],
                )
        ends = self.end_offsets(topic)  # one API sweep, not one per partition
        return {p: ends.get(p, 0) for p in by_part}

    def produce(self, topic: str, value: bytes, key: bytes | None = None,
                partition: int | None = None) -> tuple[int, int]:
        pf = (lambda i: partition) if partition is not None else None
        ends = self.produce_many(topic, [value], [key], partition_of=pf)
        p, end = next(iter(ends.items()))
        return p, end - 1

    # subclass hook: extra per-entry fields (FIFO group/dedup ids)
    def _entry_extras(self, topic: str, partition: int, batch_index: int,
                      value: bytes) -> dict:
        return {}

    def read(self, topic: str, partition: int, offset: int,
             max_records: int = 10_000
             ) -> list[tuple[int, bytes | None, bytes]]:
        import base64

        url = self._url(topic, partition)
        out: list[tuple[int, bytes | None, bytes]] = []
        base = self._counters.get((topic, partition), 0)
        while len(out) < max_records:
            r = self._sqs.receive_message(
                QueueUrl=url,
                MaxNumberOfMessages=min(10, max_records - len(out)),
                WaitTimeSeconds=0,
            )
            msgs = r.get("Messages", [])
            if not msgs:
                break
            for m in msgs:
                out.append((
                    base + len(out),
                    None,
                    base64.b64decode(m["Body"]),
                ))
                self._sqs.delete_message(
                    QueueUrl=url, ReceiptHandle=m["ReceiptHandle"])
        self._counters[(topic, partition)] = base + len(out)
        return out


class SqsFifoBroker(SqsBroker):
    """FIFO-queue variant of :class:`SqsBroker` — the stronger replay
    story flagged in NOTES: standard SQS is at-least-once with no
    ordering, so the plain adapter's offsets are synthetic and a
    producer retry can double-enqueue. FIFO queues (public AWS
    semantics) add exactly what a binlog source needs:

    - **ordering**: one ``MessageGroupId`` per partition-queue gives
      strict FIFO delivery within the partition (the Kafka-partition
      analog);
    - **enqueue dedup**: a deterministic ``MessageDeduplicationId`` per
      message means a retried ``produce_many`` of the same batch cannot
      double-enqueue within SQS's 5-minute dedup window.

    ``dedup_id_of(index, value) -> str`` should map each message to its
    LOGICAL identity (e.g. its lsn) — that is what makes cross-call
    retries dedup. The DEFAULT id is salted per produce call (sha1 of
    a call-unique nonce + position + payload): client-level re-sends
    within one call dedup, but two separate calls NEVER collide — a
    content-only default would silently drop a legitimate second event
    that happens to carry identical bytes (binlogs do). The
    consumer-side epoch-id skip in the lake remains the end-to-end
    exactly-once gate (SQS delivery is still at-least-once).

    UNTESTED against real AWS in-sandbox (no network); the call shapes
    are locked by the fake-client conformance pytest alongside the
    plain adapter's."""

    def __init__(self, *, region_name: str | None = None,
                 queue_prefix: str = "", client=None,
                 dedup_id_of=None):
        super().__init__(region_name=region_name, queue_prefix=queue_prefix,
                         client=client)
        self._dedup_id_of = dedup_id_of
        self._call_salt = ""

    def produce_many(self, topic, values, keys=None, partition_of=None):
        import uuid as _uuid

        self._call_salt = _uuid.uuid4().hex  # one nonce per produce call
        return super().produce_many(topic, values, keys=keys,
                                    partition_of=partition_of)

    def _qname(self, topic: str, partition: int) -> str:
        return f"{self._prefix}{topic}-p{partition:05d}.fifo"

    def create_topic(self, topic: str, partitions: int = 4) -> None:
        for p in range(partitions):
            r = self._sqs.create_queue(
                QueueName=self._qname(topic, p),
                Attributes={"FifoQueue": "true",
                            # explicit ids, never content-based: two
                            # distinct binlog events may share a payload
                            "ContentBasedDeduplication": "false"},
            )
            self._urls[self._qname(topic, p)] = r["QueueUrl"]

    def partitions(self, topic: str) -> list[int]:
        prefix = f"{self._prefix}{topic}-p"
        r = self._sqs.list_queues(QueueNamePrefix=prefix)
        out = []
        for url in r.get("QueueUrls", []):
            name = url.rsplit("/", 1)[-1]
            if name.endswith(".fifo"):
                out.append(int(name[len(prefix):-len(".fifo")]))
        if not out:
            raise KeyError(f"unknown topic {topic!r}")
        return sorted(out)

    def _entry_extras(self, topic: str, partition: int, batch_index: int,
                      value: bytes) -> dict:
        import hashlib

        if self._dedup_id_of is not None:
            did = str(self._dedup_id_of(batch_index, value))
        else:
            did = hashlib.sha1(
                f"{self._call_salt}:{partition}:{batch_index}:".encode()
                + value).hexdigest()
        return {"MessageGroupId": f"p{partition}",
                "MessageDeduplicationId": did[:128]}
