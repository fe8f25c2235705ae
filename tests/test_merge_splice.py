"""Merge byte-splice equivalence: the spliced merge output must be
byte-identical to a full decode-and-re-encode merge (the round-1
implementation, preserved here as the oracle). Canonical varint encoding
guarantees it; this test pins it for both freq-only and positional
segments."""

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.index.builder import build_index_pandas, write_segment
from quickwit_spark.index.corpus import corpus_pandas
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.index.merge import (_decode_segment_postings,
                                        _encode_position_blob,
                                        merge_segments)


def _gather_runs(values, run_lens, order):
    """Reference-twin helper for the oracle merge below: reorder a
    run-structured array by a run permutation (vectorized). Lives here —
    production merge splices bytes and never gathers value runs."""
    import numpy as np
    run_starts = np.r_[0, np.cumsum(run_lens)[:-1]]
    sorted_lens = run_lens[order]
    total = int(sorted_lens.sum())
    out_start = np.r_[0, np.cumsum(sorted_lens)[:-1]]
    within = np.arange(total) - np.repeat(out_start, sorted_lens)
    src = np.repeat(run_starts[order], sorted_lens) + within
    return values[src]



def _merge_reencode(index_dir, parents, out_dir):
    """Round-1 merge: decode everything, lexsort, re-encode (oracle)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    segments_root = os.path.join(index_dir, "segments")
    offsets = np.r_[0, np.cumsum([p["num_docs"] for p in parents])[:-1]]
    with_pos = all(p.get("record") == "position" for p in parents)
    all_terms, parts = [], []
    for p, off in zip(parents, offsets):
        seg_dir = os.path.join(segments_root, p["segment_id"])
        terms, term_of, docids, tfs, pos = _decode_segment_postings(
            seg_dir, with_positions=with_pos)
        all_terms.append(terms)
        parts.append((terms, term_of, docids + int(off), tfs, pos))
    global_terms = np.unique(np.concatenate(all_terms))
    g_term = np.concatenate([np.searchsorted(global_terms, terms)[term_of]
                             for terms, term_of, _d, _t, _p in parts])
    g_doc = np.concatenate([d for _te, _to, d, _t, _p in parts])
    g_tf = np.concatenate([t for _te, _to, _d, t, _p in parts])
    order = np.lexsort((g_doc, g_term))
    positions = None
    if with_pos:
        all_pos = np.concatenate([p for *_rest, p in parts])
        g_pos = _gather_runs(all_pos, g_tf, order)
        positions = _encode_position_blob(g_pos, g_tf[order], g_term[order])
    g_term, g_doc, g_tf = g_term[order], g_doc[order], g_tf[order]
    doc_tables, fn_parts = [], []
    for p, off in zip(parents, offsets):
        seg_dir = os.path.join(segments_root, p["segment_id"])
        t = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        new_ids = pa.array(
            (t.column("_seg_doc").to_numpy() + int(off)).astype(np.int32),
            type=pa.int32())
        t = t.set_column(t.schema.get_field_index("_seg_doc"), "_seg_doc",
                         new_ids)
        doc_tables.append(t)
        fn_parts.append(t.column("fieldnorm_id").to_numpy())
    docs_tbl = pa.concat_tables(doc_tables)
    fn_ids = np.concatenate(fn_parts).astype(np.int64)
    first = parents[0]
    meta_extra = {
        "segment_id": "oracle", "partition_id": -1, "chunk_idx": -1,
        "bytes_raw": 0, "tags": {}, "col_stats": {}, "num_merge_ops": 0,
        "parents": [], "schema_rev": first["schema_rev"],
        "tokenizer": first["tokenizer"],
        "record": first.get("record", "freq"),
        "fieldnorms": first.get("fieldnorms", True),
    }
    doc_cols = {name: docs_tbl.column(name) for name in docs_tbl.schema.names}
    write_segment(out_dir, global_terms, g_term, g_doc, g_tf, fn_ids,
                  doc_cols, meta_extra, positions=positions)


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


@pytest.mark.parametrize("record", ["freq", "position"])
def test_splice_byte_identical_to_reencode(tmp_path, record):
    pdf = corpus_pandas(600, seed=3, skew=True)
    cfg = IndexConfig(index_uid="sp", index_dir=str(tmp_path / record),
                      record=record)
    build_index_pandas(pdf, cfg, num_partitions=4)
    parents = Manifest.load(cfg.index_dir).segments()
    assert len(parents) >= 3
    meta = merge_segments(cfg.index_dir, parents)
    spliced = os.path.join(cfg.index_dir, "segments", meta["segment_id"])
    oracle = str(tmp_path / f"oracle_{record}")
    _merge_reencode(cfg.index_dir, parents, oracle)
    for f in ("postings.parquet", "termdict.parquet"):
        assert _sha(os.path.join(spliced, f)) == \
            _sha(os.path.join(oracle, f)), f


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _random_corpus(draw):
    n = draw(st.integers(min_value=6, max_value=40))
    vocab = ["alpha", "beta", "gamma", "delta", "merge", "scan", "x1",
             "veryLongIdentifierName", "snake_case_token"]
    rows = []
    for i in range(n):
        ntok = draw(st.integers(min_value=1, max_value=30))
        toks = draw(st.lists(st.sampled_from(vocab), min_size=ntok,
                             max_size=ntok))
        rows.append({"repo": f"r{i % 3}", "path": f"f{i}.py",
                     "commit": "c", "lang": "python",
                     "content": " ".join(toks)})
    return pd.DataFrame(rows)


@given(_random_corpus(), st.integers(min_value=2, max_value=5),
       st.sampled_from(["freq", "position"]))
@settings(max_examples=15, deadline=None)
def test_splice_property_random_corpora(tmp_path_factory, pdf, parts,
                                        record):
    """Property form of the byte-identity pin: random token streams,
    random parent counts, both record modes."""
    tmp = tmp_path_factory.mktemp("sprop")
    cfg = IndexConfig(index_uid="sp", index_dir=str(tmp / "i"),
                      sha_col=None, record=record)
    build_index_pandas(pdf, cfg, num_partitions=parts)
    parents = Manifest.load(cfg.index_dir).segments()
    if len(parents) < 2:
        return
    meta = merge_segments(cfg.index_dir, parents)
    spliced = os.path.join(cfg.index_dir, "segments", meta["segment_id"])
    oracle = str(tmp / "oracle")
    _merge_reencode(cfg.index_dir, parents, oracle)
    for f in ("postings.parquet", "termdict.parquet"):
        assert _sha(os.path.join(spliced, f)) == \
            _sha(os.path.join(oracle, f)), f
