"""Kafka wire-protocol -> Spark: a streaming data source and a
driver-side poll loop, both feeding the checkpointed ingest of
streaming/kafka.py over REAL protocol bytes on a REAL TCP socket.

Two consumption paths, mirroring how the reference splits its Kafka
source (quickwit-indexing/src/source/kafka_source.rs) into a consumer
loop and the checkpoint-committing publish:

1. `poll_wire_topic` — a batch poll: read committed offsets from the
   manifest (source_positions), fetch each partition up to its high
   watermark with `KafkaWireClient`, and hand ONE batch to
   `ingest_offset_batch`, whose checkpoint contract turns at-least-once
   delivery into exactly-once publish. This is the shape of the
   reference's suggest_truncate/checkpoint loop (kafka_source.rs), minus
   the actor runtime (Spark's driver replaces it).

2. `KafkaWireDataSource` — a PySpark Python Data Source
   (pyspark.sql.datasource, public 4.x API) exposing the broker as a
   Structured Streaming source with Spark's own kafka column contract
   (key, value, partition, offset, timestamp). After
   `spark.dataSource.register(KafkaWireDataSource)`,
   `wire_kafka_shaped_stream` (the production wiring of kafka.py) runs
   VERBATIM on `spark.readStream.format("kafka-wire")` — micro-batch
   planning on the driver (latestOffset = per-partition high watermarks),
   per-partition fetches on EXECUTORS (read() runs in the task; one
   socket per task, nothing pickled but host/port/offsets). At scale
   this is the right shape: N kafka partitions fan out to N parallel
   fetch tasks and the driver only moves offset dicts.

Offsets in the streaming source's progress dicts are Spark's
exclusive-end convention; the manifest checkpoint keeps the reference's
inclusive last-offset convention (kafka.py offset_position) — the
conversion happens where the columns are projected, not in the protocol.
"""

from __future__ import annotations

import json

from .kafka_wire import EARLIEST, LATEST, KafkaWireClient


def poll_wire_topic(host: str, port: int, topic: str, config,
                    build_partitions: int = 8,
                    max_records_per_poll: int = 100_000,
                    client_id: str = "qw-spark-poll") -> dict:
    """One exactly-once poll: broker -> pandas -> ingest_offset_batch.

    Returns {"published": bool, "records": n, "partitions": {p: (from,
    to)}}. A re-poll after a successful publish fetches nothing (offsets
    advance); a forced replay of the same offsets is rejected by the
    manifest checkpoint — both paths covered by tests/test_kafka_wire.py
    over the loopback broker."""
    import os

    import pandas as pd

    from .kafka import ingest_offset_batch, source_positions

    with KafkaWireClient(host, port, client_id=client_id) as client:
        client.api_versions()  # negotiate before any data request
        parts = client.metadata([topic]).get(topic, [])
        committed = {}
        if os.path.exists(os.path.join(config.index_dir, "manifest.json")):
            committed = source_positions(config)
        frames, offsets = [], {}
        total = 0
        for p in parts:
            start = committed[p] + 1 if p in committed else \
                client.list_offsets(topic, p, EARLIEST)
            hwm = client.list_offsets(topic, p, LATEST)
            if start >= hwm:
                continue
            docs: list[dict] = []
            last = None  # last offset CONSUMED, tombstones included
            consumed, off = 0, start
            while off < hwm and total + consumed < max_records_per_poll:
                recs, hwm = client.fetch(topic, p, off)
                if not recs:
                    # transient empty fetch (max_wait expiry); offsets
                    # only advance past records actually consumed, so
                    # the next poll resumes here — nothing is skipped
                    break
                for o, _ts, _k, v, _h in recs:
                    if o >= hwm or total + consumed >= \
                            max_records_per_poll:
                        break
                    last = o
                    consumed += 1
                    if v is not None:
                        # null value = tombstone (compacted topics):
                        # advances the offset, carries no document
                        docs.append(json.loads(v.decode("utf-8")))
                off = last + 1 if last is not None else hwm
            if last is None:
                continue
            total += consumed
            # None on the first-ever batch — including a late start on a
            # compacted/retained-away topic (same contract as kafka.py's
            # handle_kafka_batch: the manifest only learns offsets that
            # were actually ingested)
            frm = committed.get(p)
            offsets[p] = (frm, last)
            if docs:
                frames.append(pd.DataFrame(docs))
    if not offsets:
        return {"published": False, "records": 0, "partitions": {}}
    # tombstone-only polls publish an EMPTY batch: the checkpoint must
    # still advance past the tombstones or every poll re-reads them
    batch = (pd.concat(frames, ignore_index=True) if frames
             else pd.DataFrame())
    ok = ingest_offset_batch(batch, config, offsets,
                             build_partitions=build_partitions)
    return {"published": ok, "records": int(len(batch)),
            "partitions": offsets}


def _datasource_classes():
    """Defined lazily: pyspark.sql.datasource exists only under pyspark
    4.x, and module import must not require it (poll_wire_topic is
    pandas-only)."""
    from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                        InputPartition)

    class _OffsetRange(InputPartition):
        def __init__(self, host, port, topic, partition, start, end):
            self.host, self.port = host, port
            self.topic, self.partition = topic, partition
            self.start, self.end = start, end

    class _WireStreamReader(DataSourceStreamReader):
        """Micro-batch planner + executor-side reader.

        Progress dicts map str(partition) -> next offset to read
        (exclusive end, Spark convention). No live socket is ever an
        attribute: every method opens/closes its own client, so the
        reader pickles cleanly to executors."""

        def __init__(self, options):
            self.host = options.get("host", "127.0.0.1")
            self.port = int(options.get("port", "9092"))
            self.topic = options.get("topic")
            if not self.topic:
                raise ValueError("kafka-wire source requires 'topic'")
            starting = options.get("startingOffsets", "earliest")
            if starting not in ("earliest", "latest"):
                raise ValueError(
                    f"startingOffsets={starting!r}: earliest|latest")
            self._starting = EARLIEST if starting == "earliest" else LATEST

        def _client(self):
            return KafkaWireClient(self.host, self.port,
                                   client_id="qw-spark-stream")

        def initialOffset(self) -> dict:
            with self._client() as c:
                c.api_versions()
                parts = c.metadata([self.topic]).get(self.topic, [])
                return {str(p): c.list_offsets(self.topic, p,
                                               self._starting)
                        for p in parts}

        def latestOffset(self) -> dict:
            with self._client() as c:
                parts = c.metadata([self.topic]).get(self.topic, [])
                return {str(p): c.list_offsets(self.topic, p, LATEST)
                        for p in parts}

        def partitions(self, start: dict, end: dict):
            out = []
            for p, hi in end.items():
                lo = int(start.get(p, 0))
                if int(hi) > lo:
                    out.append(_OffsetRange(self.host, self.port,
                                            self.topic, int(p), lo,
                                            int(hi)))
            # Spark requires >=1 partition even for an empty batch
            return out or [_OffsetRange(self.host, self.port, self.topic,
                                        -1, 0, 0)]

        def read(self, part):
            if part.partition < 0:
                return iter(())
            return self._read_range(part)

        @staticmethod
        def _read_range(part, empty_fetch_timeout: float = 60.0):
            import time
            with KafkaWireClient(part.host, part.port,
                                 client_id="qw-spark-task") as c:
                off = part.start
                deadline = time.monotonic() + empty_fetch_timeout
                while off < part.end:
                    recs, _hwm = c.fetch(part.topic, part.partition, off)
                    if not recs:
                        # An empty fetch at a valid offset is transient
                        # (max_wait expired below the planned end, e.g.
                        # during a leader change) — retry; NEVER truncate
                        # the planned range, because Spark's checkpoint
                        # advances to part.end regardless and the skipped
                        # records would be lost (the manifest would then
                        # raise OffsetGap forever). Truncation-below-
                        # retention surfaces as OFFSET_OUT_OF_RANGE, not
                        # as an empty fetch, so looping here is safe;
                        # the deadline fails the task (Spark retries it)
                        # rather than silently dropping data.
                        if time.monotonic() > deadline:
                            raise RuntimeError(
                                f"{part.topic}/{part.partition}: no data "
                                f"at offset {off} < planned end "
                                f"{part.end} after "
                                f"{empty_fetch_timeout:.0f}s of retries")
                        time.sleep(0.05)
                        continue
                    deadline = time.monotonic() + empty_fetch_timeout
                    for o, ts, k, v, _h in recs:
                        if o >= part.end:
                            return
                        yield (k, v, part.partition, o, ts)
                    off = recs[-1][0] + 1

        def commit(self, end: dict) -> None:
            # the manifest checkpoint is the source of truth (kafka.py);
            # Spark's own checkpoint dir replays are made exactly-once
            # there, so nothing to do broker-side
            return None

    class KafkaWireDataSource(DataSource):
        """`spark.readStream.format("kafka-wire")` over the wire client.

        Column contract matches Spark's kafka source so
        wire_kafka_shaped_stream consumes it unchanged."""

        @classmethod
        def name(cls):
            return "kafka-wire"

        def schema(self):
            return ("key binary, value binary, partition int, "
                    "offset long, timestamp long")

        def streamReader(self, schema):
            return _WireStreamReader(self.options)

    return KafkaWireDataSource, _WireStreamReader, _OffsetRange


def register_kafka_wire(spark):
    """Register the kafka-wire streaming source on a SparkSession."""
    KafkaWireDataSource, _, _ = _datasource_classes()
    spark.dataSource.register(KafkaWireDataSource)
    return KafkaWireDataSource
