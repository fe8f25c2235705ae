"""Incremental index builds driven by Iceberg snapshots.

The reference's file/queue sources track a source position and commit it
atomically with each split publish (checkpoint.rs:170-337,
publisher.rs:130-155). With an Iceberg table as the source, the natural
position is the table's own SEQUENCE NUMBER: each call indexes exactly
the data files appended since the last recorded sequence number (however
many snapshots that spans) and advances the checkpoint in the SAME
manifest transaction that publishes the segments — exactly-once on top
of crash/retry replays, the same contract as streaming.incremental.

Scale shape: the delta plan touches only manifests newer than the
checkpoint (manifest-list sequence_number skip), the build is the
standard routed mapInPandas segment build over ONLY the new files, and
the driver collects one manifest row per segment — nothing is
proportional to the already-indexed corpus.

Source-side DELETES (position AND equality — upserts include one) do
not propagate: ingest consumes appends only (delete manifests are
skipped by ``appended_files``), matching the reference's source
contract — so an upserted document is indexed as a NEW doc while its
old version stays in the index until retired explicitly. Deleting
documents from the INDEX is the delete-task flow (index/deletes.py,
`_delete_by_query`), a separate operation; the returned summary's
``source_deletes_ignored`` counts the delete manifests this call
skipped so callers can wire that retirement.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd

from ..config import IndexConfig
from ..index.builder import (MANIFEST_ROW_SCHEMA, build_partition,
                             route_partitions)
from ..index.manifest import CheckpointConflict, Manifest
from ..streaming.incremental import _cleanup_replayed_segments
from .iceberg import IcebergTable, load_table

# partition-id namespace per ingested sequence number; disjoint from
# streaming's batch stride blocks only by key namespace (partition ids
# are segment metadata, not checkpoint keys — collisions are harmless,
# distinctness is just for lineage readability)
SEQ_PARTITION_STRIDE = 1_000_000


def _checkpoint_key(table: IcebergTable) -> str:
    return f"iceberg:{table.meta['table-uuid']}"


def _parse_position(pos: str | None) -> tuple[int, int | None]:
    """Stored position 'iceberg-seq=N;snap=S;...' -> (N, S)."""
    if pos is None:
        return 0, None
    if not pos.startswith("iceberg-seq="):
        raise ValueError(f"not an iceberg source position: {pos!r}")
    fields = dict(kv.split("=", 1) for kv in pos.split(";"))
    snap = fields.get("snap")
    return int(fields["iceberg-seq"]), (int(snap) if snap else None)


def ingest_iceberg(spark, table_path: str, config: IndexConfig,
                   partitions_per_ingest: int = 8,
                   snapshot_id: int | None = None) -> dict:
    """Index every data file appended since the last recorded sequence
    number (as of the current — or pinned — snapshot), publishing the
    segments and the new source position atomically. Returns a summary
    dict; ``status`` is 'up-to-date', 'published', or 'replayed'."""
    table = load_table(table_path)
    snap = table.snapshot(snapshot_id)
    manifest = Manifest.load_or_create(
        config.index_dir, config.index_uid, config.manifest_config())
    key = _checkpoint_key(table)
    stored = manifest.checkpoint(key)
    since_seq, since_snap = _parse_position(stored)
    cur_seq = 0 if snap is None else snap["sequence-number"]
    # lineage check FIRST: the table uuid is path-derived
    # (create_table._det_uuid), so a dropped-and-recreated table at the
    # same path reuses the checkpoint key — and can even land on the
    # SAME sequence number, which a pure seq comparison would read as
    # 'up-to-date' and silently never index. The recorded snapshot id
    # must still exist in the table's history — or be covered by the
    # expire_snapshots watermark below — to prove the same lineage.
    if since_snap is not None and since_snap not in {
            s["snapshot-id"] for s in table.meta["snapshots"]}:
        # expire_snapshots legitimately removes old snapshots from the
        # SAME lineage; it records the highest expired sequence number,
        # so a checkpoint at/below that watermark is provably consumed
        # history, not a replaced table (a recreated table starts with
        # no watermark, so its fresh metadata still fails this check).
        expired_seq = int(table.meta.get("properties", {})
                          .get("quickwit.expired-up-to-seq", -1))
        if since_seq > expired_seq:
            raise CheckpointConflict(
                f"iceberg table {table_path} does not contain snapshot "
                f"{since_snap} recorded in the index checkpoint — the "
                f"table was replaced or its history rewritten; rebuild "
                f"the index fresh instead of resuming")
    if cur_seq < since_seq:
        # same lineage but the metadata dir was rolled back manually
        raise CheckpointConflict(
            f"iceberg table {table_path} is at sequence {cur_seq} but "
            f"the index already consumed up to {since_seq}; refusing "
            f"to rewind — rebuild the index fresh instead")
    if cur_seq == since_seq:
        return {"status": "up-to-date", "sequence": cur_seq,
                "files": 0, "docs": 0, "segments": 0,
                "source_deletes_ignored": 0}

    files = table.appended_files(since_seq, snapshot_id)
    from .avro_ocf import read_ocf
    _, all_manifests = read_ocf(snap["manifest-list"])
    deletes_ignored = sum(
        1 for mf in all_manifests
        if mf.get("content") == 1 and mf["sequence_number"] > since_seq)
    segments_root = os.path.join(config.index_dir, "segments")
    os.makedirs(segments_root, exist_ok=True)

    rows: list[dict] = []
    if files:
        # resolve columns by field id when the schema history contains
        # a rename/name-reuse (delta files may span generations)
        fields = table.schema_fields
        use_ids = table._needs_field_id_read(fields)
        if use_ids:
            spark.conf.set("spark.sql.parquet.fieldId.read.enabled",
                           "true")
        df = (spark.read
              .schema(table._spark_read_schema(fields, use_ids))
              .parquet(*[f["file_path"] for f in files]))
        base = cur_seq * SEQ_PARTITION_STRIDE
        routed = route_partitions(df, config, partitions_per_ingest)
        from pyspark.sql import functions as F
        routed = routed.withColumn("_pid", F.col("_pid") + F.lit(base))
        cfg = config

        def _build(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"manifest_json": []})
            built = build_partition(pdf, cfg, segments_root)
            return pd.DataFrame(
                {"manifest_json": [json.dumps(r) for r in built]})

        out = (routed.groupBy("_pid")
               .applyInPandas(_build, schema=MANIFEST_ROW_SCHEMA)
               .collect())
        rows = [json.loads(r.manifest_json) for r in out]

    n_docs = sum(r["num_docs"] for r in rows)
    sig = hashlib.sha256(
        "|".join(sorted(r["segment_id"] for r in rows)).encode()
    ).hexdigest()[:12]
    to = (f"iceberg-seq={cur_seq};snap={snap['snapshot-id']};"
          f"files={len(files)};ids={sig}")
    summary = {"status": "published", "sequence": cur_seq,
               "files": len(files), "docs": n_docs,
               "segments": len(rows),
               "source_deletes_ignored": deletes_ignored}
    try:
        manifest.publish(rows, checkpoint_delta={key: (stored, to)})
    except CheckpointConflict:
        # exactly-once: only an EXACT replay (same position, i.e. same
        # snapshot AND same content-addressed segment ids) is benign
        if manifest.checkpoint(key) != to:
            raise
        _cleanup_replayed_segments(manifest, segments_root, rows)
        summary["status"] = "replayed"
    return summary
