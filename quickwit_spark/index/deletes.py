"""Delete tasks: apply a delete query by rewriting affected segments.

Mirrors the reference's delete pipeline (quickwit-janitor/src/actors/
delete_task_planner.rs + merge_executor.rs:361-470 process_delete_and_merge):
a delete query selects docids per segment; affected segments are rewritten
without those docs (docids re-densified, postings filtered, empty terms
dropped) and the manifest publish atomically replaces the parents. Segments
whose match set is empty are untouched; a segment whose docs are all
deleted is retired without a replacement (merge_executor.rs: the split is
dropped entirely).

The rewritten segment id is content-addressed over (parent id, deleted
docids), so re-applying the same delete is idempotent.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ..functions.bm25 import fieldnorm_to_id
from .builder import write_segment
from .manifest import Manifest
from .merge import _decode_segment_postings, _encode_position_blob


def rewrite_segment_without(index_dir: str, parent: dict,
                            deleted: np.ndarray) -> dict | None:
    """Rewrite one segment dropping `deleted` (sorted unique docids).
    Returns the new segment's metadata, or None if every doc is deleted."""
    segments_root = os.path.join(index_dir, "segments")
    seg_dir = os.path.join(segments_root, parent["segment_id"])
    n = int(parent["num_docs"])
    kept_mask = np.ones(n, dtype=bool)
    kept_mask[deleted] = False
    n_new = int(kept_mask.sum())
    if n_new == 0:
        return None
    remap = np.cumsum(kept_mask) - 1  # old docid -> new docid (kept only)

    with_pos = parent.get("record") == "position"
    terms, term_of, docids, tfs, positions = _decode_segment_postings(
        seg_dir, with_positions=with_pos)
    keep = kept_mask[docids]
    new_term_of = term_of[keep]
    new_doc = remap[docids[keep]]
    new_tfs = tfs[keep]
    pos_arg = None
    if with_pos and positions is not None:
        tok_keep = np.repeat(keep, tfs)
        # pos_arg stays None here: the blob is re-encoded below, after
        # term compaction fixes the term ids
        new_pos = positions[tok_keep]

    # drop terms that lost all postings; re-densify term ids. A segment
    # left with ZERO postings but surviving docs (blank-text docs, or a
    # delete that removed every doc containing text) is still a valid
    # rewrite target — returning None here would tell the caller "all
    # docs deleted" and silently retire the survivors with the segment
    live_terms, compact = np.unique(new_term_of, return_inverse=True)
    terms_sorted = terms[live_terms]

    if with_pos and positions is not None and len(new_tfs):
        pos_arg = _encode_position_blob(new_pos, new_tfs, compact)
    elif with_pos:
        # positional segment with zero surviving postings still carries
        # a (valid, empty) pos_blob column — phrase readers expect it
        pos_arg = (b"", np.zeros(len(terms_sorted) + 1, dtype=np.int64))

    # docs table filtered + re-densified ids: filter the ARROW table and
    # keep the parent's exact column types — a pandas round-trip would
    # re-infer (int32 -> int64, all-null string -> null), making the
    # rewritten segment's doc_fields drift from its siblings'
    import pyarrow as pa
    tbl = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
    kept_tbl = tbl.filter(pa.array(kept_mask))
    doc_cols = {}
    for i, name in enumerate(kept_tbl.schema.names):
        if name == "_seg_doc":
            doc_cols[name] = pa.array(
                np.arange(n_new), type=kept_tbl.schema.field(i).type)
        else:
            doc_cols[name] = kept_tbl.column(i).combine_chunks()
    fieldnorms = kept_tbl.column("fieldnorm").to_numpy().astype(np.int64)
    if parent.get("fieldnorms", True):
        fn_ids = fieldnorm_to_id(fieldnorms)
    else:
        fn_ids = fieldnorm_to_id(np.ones(n_new, dtype=np.int64))

    h = hashlib.sha256()
    h.update(f"delete:{parent['segment_id']}:".encode())
    h.update(np.asarray(deleted, dtype=np.int64).tobytes())
    segment_id = f"seg-{h.hexdigest()[:20]}"
    new_dir = os.path.join(segments_root, segment_id)
    meta_extra = {
        "segment_id": segment_id,
        "partition_id": parent.get("partition_id", -1),
        # ingest-epoch lineage survives delete rewrites too (see the
        # merge metadata note; sync_iceberg scopes retirement by it)
        "max_src_pid": parent.get("max_src_pid"),
        "chunk_idx": parent.get("chunk_idx", -1),
        # scale by the surviving fraction: copying the parent's figure
        # unchanged lets bytes_raw drift arbitrarily far above actual
        # content across delete/merge cycles (merges SUM these)
        "bytes_raw": int(parent.get("bytes_raw", 0) * n_new // n),
        "tags": parent.get("tags", {}),
        # parent bounds remain sound for the surviving subset
        "col_stats": parent.get("col_stats", {}),
        "num_merge_ops": parent.get("num_merge_ops", 0),
        "parents": [parent["segment_id"]],
        "delete_opstamp": parent.get("delete_opstamp", 0) + 1,
        "schema_rev": parent["schema_rev"],
        "tokenizer": parent["tokenizer"],
        "record": parent.get("record", "freq"),
        "fieldnorms": parent.get("fieldnorms", True),
        "field_types": parent.get("field_types", {}),
        "dynamic": parent.get("dynamic", False),
    }
    return write_segment(new_dir, terms_sorted, compact, new_doc, new_tfs,
                         fn_ids, doc_cols, meta_extra, positions=pos_arg)


def apply_delete_query(index_dir: str, query, spark=None,
                       segment_filter=None) -> dict:
    """Evaluate `query` against every published segment and rewrite the
    matching ones without the matched docs (atomic manifest replace).

    segment_filter optionally restricts which segments are even
    considered (seg dict -> bool) — sync_iceberg scopes retirement to
    segments ingested at or below its checkpoint, so a crash-retry or
    racing duplicate can never delete documents the winning sync just
    published.

    Returns {"segments_rewritten", "segments_dropped", "docs_deleted"}.
    """
    from ..search.engine import IndexSearcher, get_reader

    searcher = IndexSearcher(index_dir)
    node = searcher.parse(query)
    tokenizer, text_field = searcher.tokenizer, searcher.text_field
    manifest = Manifest.load(index_dir)
    segs = manifest.segments()
    if segment_filter is not None:
        segs = [s for s in segs if segment_filter(s)]
    if not segs:
        return {"segments_rewritten": 0, "segments_dropped": 0,
                "docs_deleted": 0}

    def eval_and_rewrite(seg: dict) -> dict:
        """Match + rewrite one segment (runs INSIDE the task when spark is
        attached — the reference's delete pipeline evaluates delete
        queries on the workers, not the control plane)."""
        reader = get_reader(os.path.join(index_dir, "segments",
                                         seg["segment_id"]), tokenizer)
        ids = np.asarray(reader.eval(node, text_field, scoring=False
                                     ).docids, dtype=np.int64)
        if len(ids) == 0:
            return {"unchanged": seg["segment_id"], "n_deleted": 0}
        meta = rewrite_segment_without(index_dir, seg, ids)
        return {"parent": seg["segment_id"], "n_deleted": int(len(ids)),
                "meta": meta}

    if spark is not None and len(segs) > 1:
        payload = [(seg["segment_id"], json.dumps(seg)) for seg in segs]
        df = spark.createDataFrame(payload, "segment_id string, seg string")

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"res": [
                json.dumps(eval_and_rewrite(json.loads(r.seg)))
                for r in pdf.itertuples()]})

        rows = (df.repartition(len(segs), "segment_id")
                .groupBy("segment_id")
                .applyInPandas(run, schema="res string").collect())
        results = [json.loads(r.res) for r in rows]
    else:
        results = [eval_and_rewrite(seg) for seg in segs]

    changed = [r for r in results if "unchanged" not in r]
    if not changed:
        return {"segments_rewritten": 0, "segments_dropped": 0,
                "docs_deleted": 0}
    staged = [r["meta"] for r in changed if r["meta"] is not None]
    replaced = [r["parent"] for r in changed]
    manifest.publish(staged, replaced_segment_ids=replaced)
    return {
        "segments_rewritten": len(staged),
        "segments_dropped": len(changed) - len(staged),
        "docs_deleted": int(sum(r["n_deleted"] for r in changed)),
    }
