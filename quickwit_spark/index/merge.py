"""Merge executor: K parent segments -> one merged segment.

Mirrors the reference MergeExecutor (quickwit-indexing/src/merge_executor.rs):
  - parents are concatenated in policy order; docids remapped by cumulative
    doc-count offsets (the union-index doc order);
  - attributes recombined: num_docs/bytes summed, tags unioned,
    num_merge_ops = max(parents) + 1 (merge_executor.rs:293-299);
  - segments merge only within one doc-mapping (schema_rev/tokenizer/record
    group — doc_mapping_uid semantics, split_metadata.rs:132-134);
  - the publish replaces parents atomically (publisher.rs:130-155).

The merged segment id is content-addressed over the parent ids, so
re-running a merge is byte-identical and idempotent (FIXTURES.md F6).

Everything is numpy-vectorized: one varint decode per parent (whole blob),
group-wise delta cumsum, one lexsort, then the shared write_segment encoder.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .builder import write_segment
from .codecs import varint_decode
from .manifest import Manifest
from .merge_policy import MergeOperation, StableLogMergePolicy


def _decode_segment_postings(seg_dir: str, with_positions: bool = False):
    """Decode ALL postings of a segment in one vectorized pass.

    Returns (terms: object array sorted, term_of_posting, docids, tfs,
    positions-or-None). Positions come back as one token stream ordered
    by (term, doc, position) — the storage order.
    """
    cols = ["term_id", "doc_freq", "docid_blob", "tf_blob"]
    if with_positions:
        cols.append("pos_blob")
    t = pq.read_table(os.path.join(seg_dir, "postings.parquet"),
                      columns=cols)
    td = pq.read_table(os.path.join(seg_dir, "termdict.parquet"),
                       columns=["term", "term_id"])
    terms = np.asarray(td.column("term").to_pylist(), dtype=object)
    doc_freq = t.column("doc_freq").to_numpy()
    # postings rows are written ordered by term_id == termdict order
    docid_blob = b"".join(t.column("docid_blob").to_pylist())
    tf_blob = b"".join(t.column("tf_blob").to_pylist())
    deltas = varint_decode(docid_blob).astype(np.int64)
    tfs = varint_decode(tf_blob).astype(np.int64)
    npost = len(deltas)
    assert npost == int(doc_freq.sum())
    term_starts = np.r_[0, np.cumsum(doc_freq)[:-1]].astype(np.int64)
    # group-wise delta cumsum: docids = cumsum - base(term)
    cs = np.cumsum(deltas)
    base = (cs[term_starts] - deltas[term_starts])
    term_of = np.repeat(np.arange(len(terms)), doc_freq)
    docids = cs - base[term_of]
    positions = None
    if with_positions:
        from .codecs import decode_positions
        pos_blob = b"".join(t.column("pos_blob").to_pylist())
        positions, _ = decode_positions(pos_blob, tfs)
    return terms, term_of, docids, tfs, positions


def _gather_runs(values: np.ndarray, run_lens: np.ndarray,
                 order: np.ndarray) -> np.ndarray:
    """Reorder a run-structured array by a run permutation (vectorized)."""
    run_starts = np.r_[0, np.cumsum(run_lens)[:-1]]
    sorted_lens = run_lens[order]
    total = int(sorted_lens.sum())
    out_start = np.r_[0, np.cumsum(sorted_lens)[:-1]]
    within = np.arange(total) - np.repeat(out_start, sorted_lens)
    src = np.repeat(run_starts[order], sorted_lens) + within
    return values[src]


# single shared encoder (codecs.py) — bit-identical across build/merge/
# delete paths, which content-addressed idempotence depends on
from .codecs import encode_position_blob as _encode_position_blob  # noqa: E402


def merge_segments(index_dir: str, parents: list[dict]) -> dict:
    """Execute one merge operation; returns the merged segment's metadata."""
    segments_root = os.path.join(index_dir, "segments")
    offsets = np.r_[0, np.cumsum([p["num_docs"] for p in parents])[:-1]]
    with_pos = all(p.get("record") == "position" for p in parents)

    all_terms: list[np.ndarray] = []
    parts = []
    for p, off in zip(parents, offsets):
        seg_dir = os.path.join(segments_root, p["segment_id"])
        terms, term_of, docids, tfs, pos = _decode_segment_postings(
            seg_dir, with_positions=with_pos)
        all_terms.append(terms)
        parts.append((terms, term_of, docids + int(off), tfs, pos))

    global_terms = np.unique(np.concatenate(all_terms))
    g_term = np.concatenate([
        np.searchsorted(global_terms, terms)[term_of]
        for terms, term_of, _d, _t, _p in parts])
    g_doc = np.concatenate([d for _te, _to, d, _t, _p in parts])
    g_tf = np.concatenate([t for _te, _to, _d, t, _p in parts])
    order = np.lexsort((g_doc, g_term))
    positions = None
    if with_pos:
        # positions travel with their posting run; doc-local values are
        # unchanged by the merge, only run order changes
        all_pos = np.concatenate([p for *_rest, p in parts])
        g_pos = _gather_runs(all_pos, g_tf, order)
        positions = _encode_position_blob(g_pos, g_tf[order], g_term[order])
    g_term, g_doc, g_tf = g_term[order], g_doc[order], g_tf[order]

    # docs table: concat with remapped doc ids
    doc_tables = []
    fn_ids_parts = []
    for p, off in zip(parents, offsets):
        seg_dir = os.path.join(segments_root, p["segment_id"])
        t = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        new_ids = pa.array(
            (t.column("_seg_doc").to_numpy() + int(off)).astype(np.int32),
            type=pa.int32())
        t = t.set_column(t.schema.get_field_index("_seg_doc"), "_seg_doc",
                         new_ids)
        doc_tables.append(t)
        fn_ids_parts.append(t.column("fieldnorm_id").to_numpy())
    docs_tbl = pa.concat_tables(doc_tables)
    fn_ids = np.concatenate(fn_ids_parts).astype(np.int64)

    h = hashlib.sha256(("merge:" + ":".join(
        p["segment_id"] for p in parents)).encode())
    segment_id = f"seg-{h.hexdigest()[:20]}"
    seg_dir = os.path.join(segments_root, segment_id)

    tags: dict[str, list[str] | None] = {}
    for p in parents:
        for col, vals in p.get("tags", {}).items():
            if vals is None:
                tags[col] = None
            elif tags.get(col, []) is not None:
                tags.setdefault(col, [])
                tags[col] = sorted(set(tags[col]) | set(vals))
    # union numeric min/max stats (only columns present in every parent
    # stay sound); mirrors the reference's merged time_range union
    # (merge_executor.rs:199-210)
    stat_keys = set.intersection(*(set(p.get("col_stats", {}))
                                   for p in parents)) if parents else set()
    col_stats = {}
    for col in stat_keys:
        los = [p["col_stats"][col][0] for p in parents]
        his = [p["col_stats"][col][1] for p in parents]
        col_stats[col] = [min(los), max(his)]

    first = parents[0]
    meta_extra = {
        "segment_id": segment_id,
        "partition_id": -1,
        "chunk_idx": -1,
        "bytes_raw": int(sum(p.get("bytes_raw", 0) for p in parents)),
        "tags": tags,
        "col_stats": col_stats,
        "num_merge_ops": max(p.get("num_merge_ops", 0) for p in parents) + 1,
        "parents": [p["segment_id"] for p in parents],
        "schema_rev": first["schema_rev"],
        "tokenizer": first["tokenizer"],
        "record": first.get("record", "freq"),
        "fieldnorms": first.get("fieldnorms", True),
    }
    doc_cols = {name: docs_tbl.column(name)
                for name in docs_tbl.schema.names}
    return write_segment(seg_dir, global_terms, g_term, g_doc, g_tf,
                         fn_ids, doc_cols, meta_extra, positions=positions)


def _mapping_group(seg: dict) -> tuple:
    return (seg["schema_rev"], seg["tokenizer"], seg.get("record", "freq"),
            seg.get("fieldnorms", True))


def plan_merges(segments: list[dict],
                policy: StableLogMergePolicy) -> list[MergeOperation]:
    """Group by doc-mapping, then ask the policy (MergePlanner analog)."""
    by_mapping: dict[tuple, list[dict]] = {}
    for s in segments:
        by_mapping.setdefault(_mapping_group(s), []).append(s)
    ops: list[MergeOperation] = []
    for group in by_mapping.values():
        ops.extend(policy.operations(group))
    return ops


def run_merges(index_dir: str, spark=None,
               policy: StableLogMergePolicy | None = None,
               max_rounds: int = 100) -> int:
    """Drive merge rounds until the policy is satisfied (hierarchical
    merge; each round publishes atomically, replacing parents)."""
    policy = policy or StableLogMergePolicy()
    total_ops = 0
    for _ in range(max_rounds):
        manifest = Manifest.load(index_dir)
        ops = plan_merges(manifest.segments(), policy)
        if not ops:
            break
        if spark is not None and len(ops) > 1:
            metas = _execute_spark(spark, index_dir, ops)
        else:
            metas = [merge_segments(index_dir, op.segments) for op in ops]
        replaced = [sid for op in ops for sid in op.segment_ids()]
        manifest.publish(metas, replaced_segment_ids=replaced)
        total_ops += len(ops)
    return total_ops


def _execute_spark(spark, index_dir: str, ops: list[MergeOperation]
                   ) -> list[dict]:
    rows = [(i, json.dumps(op.segments)) for i, op in enumerate(ops)]
    df = spark.createDataFrame(rows, "op_id int, parents string")

    def run_op(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in pdf.itertuples():
            meta = merge_segments(index_dir, json.loads(r.parents))
            out.append(json.dumps(meta))
        return pd.DataFrame({"meta": out})

    res = (df.repartition(len(ops), "op_id").groupBy("op_id")
           .applyInPandas(run_op, schema="meta string").collect())
    return [json.loads(r.meta) for r in res]
