"""Kafka-shaped offset checkpointing, broker-independent: the
per-source-partition (from -> to) delta contract of checkpoint.rs:170-337
that makes at-least-once delivery exactly-once at publish time. An
in-memory queue shim plays the broker."""

import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.streaming.kafka import (OffsetGap,
                                            handle_kafka_batch,
                                            ingest_offset_batch,
                                            source_positions)


def _docs(lo, hi, part):
    return pd.DataFrame({
        "repo": [f"p{part}"] * (hi - lo + 1),
        "path": [f"doc{o}.py" for o in range(lo, hi + 1)],
        "commit": ["c"] * (hi - lo + 1),
        "lang": ["python"] * (hi - lo + 1),
        "content": [f"kafka message {o} merge" for o in range(lo, hi + 1)],
    })


@pytest.fixture
def cfg(tmp_path):
    return IndexConfig(index_uid="kfk", index_dir=str(tmp_path / "k"),
                       sha_col=None)


def test_sequential_batches_advance_offsets(cfg):
    assert ingest_offset_batch(_docs(0, 4, 0), cfg, {0: (None, 4)})
    assert ingest_offset_batch(_docs(5, 9, 0), cfg, {0: (4, 9)})
    assert source_positions(cfg) == {0: 9}
    assert IndexSearcher(cfg.index_dir).count("*") == 10


def test_replay_is_exactly_once(cfg):
    assert ingest_offset_batch(_docs(0, 4, 0), cfg, {0: (None, 4)})
    # at-least-once redelivery of the SAME batch: rejected, no new docs
    assert not ingest_offset_batch(_docs(0, 4, 0), cfg, {0: (None, 4)})
    assert IndexSearcher(cfg.index_dir).count("*") == 5
    assert source_positions(cfg) == {0: 4}


def test_offset_gap_raises(cfg):
    assert ingest_offset_batch(_docs(0, 4, 0), cfg, {0: (None, 4)})
    # claims to continue from offset 6 while the store committed 4:
    # offsets 5..6 were never ingested — data loss is an ERROR, not a
    # silently skipped batch (unlike a replay)
    with pytest.raises(OffsetGap):
        ingest_offset_batch(_docs(7, 9, 0), cfg, {0: (6, 9)})
    assert source_positions(cfg) == {0: 4}


def test_multi_partition_atomicity(cfg):
    both = pd.concat([_docs(0, 2, 0), _docs(0, 3, 1)], ignore_index=True)
    assert ingest_offset_batch(both, cfg, {0: (None, 2), 1: (None, 3)})
    # one partition replays, the other advances: the WHOLE publish is
    # rejected (all-or-nothing checkpoint validation)
    nxt = pd.concat([_docs(0, 2, 0), _docs(4, 5, 1)], ignore_index=True)
    assert not ingest_offset_batch(nxt, cfg, {0: (None, 2), 1: (3, 5)})
    assert source_positions(cfg) == {0: 2, 1: 3}
    # correct continuation for both commits
    nxt2 = pd.concat([_docs(3, 5, 0), _docs(4, 5, 1)], ignore_index=True)
    assert ingest_offset_batch(nxt2, cfg, {0: (2, 5), 1: (3, 5)})
    assert source_positions(cfg) == {0: 5, 1: 5}


def _offset_batch(spark, lo, hi, part=0):
    pdf = _docs(lo, hi, part)
    pdf["_src_partition"] = part
    pdf["_src_offset"] = list(range(lo, hi + 1))
    return spark.createDataFrame(pdf)


def test_handle_kafka_batch_replay_and_gap(cfg, spark):
    """The micro-batch handler the stream actually runs (regression for
    the round-2 advice: from-position must come from the batch's OWN lo,
    not the live manifest — the old code compared the manifest to itself
    and waved every replay and gap through)."""
    assert handle_kafka_batch(_offset_batch(spark, 0, 4), cfg,
                              build_partitions=2)
    assert source_positions(cfg) == {0: 4}
    # exact foreachBatch replay: skipped, not re-published
    assert not handle_kafka_batch(_offset_batch(spark, 0, 4), cfg,
                                  build_partitions=2)
    assert IndexSearcher(cfg.index_dir).count("*") == 5
    # a gap (offsets 5..6 lost) raises instead of publishing
    with pytest.raises(OffsetGap):
        handle_kafka_batch(_offset_batch(spark, 7, 9), cfg,
                           build_partitions=2)
    assert source_positions(cfg) == {0: 4}
    # correct continuation advances
    assert handle_kafka_batch(_offset_batch(spark, 5, 9), cfg,
                              build_partitions=2)
    assert source_positions(cfg) == {0: 9}
    assert IndexSearcher(cfg.index_dir).count("*") == 10


def test_resume_point_feeds_next_batch(cfg):
    """The driver loop a real consumer would run: read committed
    positions, fetch from the shim queue after them, publish."""
    queue = {0: [(o, f"m{o}") for o in range(20)]}  # (offset, payload)
    for _round in range(4):
        committed = source_positions(cfg) if _round else {}
        frm = committed.get(0)
        pending = [(o, m) for o, m in queue[0]
                   if frm is None or o > frm][:6]
        if not pending:
            break
        lo, hi = pending[0][0], pending[-1][0]
        df = _docs(lo, hi, 0)
        assert ingest_offset_batch(df, cfg, {0: (frm, hi)})
    assert source_positions(cfg) == {0: 19}
    assert IndexSearcher(cfg.index_dir).count("*") == 20


def test_allow_offset_gaps_stitches_transactional_holes(cfg, spark):
    """Transactional topics: commit markers occupy offsets, so batch N+1
    legitimately starts past committed+1. Strict mode raises (previous
    test); allow_offset_gaps=True stitches frm to the committed position
    and publishes — and still skips exact replays."""
    assert handle_kafka_batch(_offset_batch(spark, 0, 4), cfg,
                              build_partitions=2,
                              allow_offset_gaps=True)
    # offset 5 is a commit marker: next data batch starts at 6
    assert handle_kafka_batch(_offset_batch(spark, 6, 8), cfg,
                              build_partitions=2,
                              allow_offset_gaps=True)
    assert source_positions(cfg) == {0: 8}
    assert IndexSearcher(cfg.index_dir).count("*") == 8
    # replay of the stitched batch is still exactly-once
    assert not handle_kafka_batch(_offset_batch(spark, 6, 8), cfg,
                                  build_partitions=2,
                                  allow_offset_gaps=True)
    assert IndexSearcher(cfg.index_dir).count("*") == 8


def test_streaming_wiring_end_to_end(cfg, spark, tmp_path):
    """The PRODUCTION stream wiring (kafka_stream minus the broker
    connection line) driven by a real Structured Streaming query: a
    file source with the Kafka column contract (value/partition/offset)
    feeds wire_kafka_shaped_stream; two micro-batches advance offsets;
    then the WHOLE stream replays from a fresh Spark checkpoint (lost
    driver checkpoint, the worst at-least-once case) and the manifest
    checkpoint makes it a no-op."""
    import json
    import os

    from quickwit_spark.streaming.kafka import wire_kafka_shaped_stream

    src = tmp_path / "topic"
    src.mkdir()
    schema = "repo string, path string, commit string, lang string, " \
             "content string"

    def write_file(name, lo, hi, part=0):
        rows = _docs(lo, hi, part)
        with open(src / name, "w") as f:
            for i, (_, r) in enumerate(rows.iterrows()):
                f.write(json.dumps({"value": json.dumps(r.to_dict()),
                                    "partition": part,
                                    "offset": lo + i}) + "\n")

    def run_stream(ckpt):
        stream = (spark.readStream
                  .schema("value string, partition int, offset long")
                  .option("maxFilesPerTrigger", "1")
                  .json(str(src)))
        return wire_kafka_shaped_stream(
            stream, cfg, schema, os.path.join(str(tmp_path), ckpt),
            build_partitions=2)

    write_file("b0.json", 0, 4)
    q = run_stream("ck1")
    q.processAllAvailable()
    assert source_positions(cfg) == {0: 4}
    assert IndexSearcher(cfg.index_dir).count("*") == 5

    write_file("b1.json", 5, 9)
    q.processAllAvailable()
    q.stop()
    assert source_positions(cfg) == {0: 9}
    assert IndexSearcher(cfg.index_dir).count("*") == 10

    # fresh Spark checkpoint: the source redelivers EVERYTHING; the
    # manifest's offset checkpoint rejects both replayed batches
    q2 = run_stream("ck2")
    q2.processAllAvailable()
    q2.stop()
    assert source_positions(cfg) == {0: 9}
    assert IndexSearcher(cfg.index_dir).count("*") == 10
