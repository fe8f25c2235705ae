"""Vectorized phrase matching: equivalence vs the per-doc reference
algorithm (the round-1 implementation, preserved here as the oracle) and
a micro-benchmark on a large candidate set.

Reference semantics: full_text_query.rs:36-163 (phrase scorer: tf =
phrase frequency, idf summed over terms; slop = positional tolerance
against the anchor slot)."""

import os
import time

import numpy as np
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.index.builder import build_index_pandas
from quickwit_spark.index.corpus import corpus_pandas
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.search import ast as A
from quickwit_spark.search.engine import IndexSearcher, get_reader


@pytest.fixture(scope="module")
def pos_idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("phrasevec")
    # bursty corpus => repeated adjacent tokens => real phrase matches
    pdf = corpus_pandas(3000, seed=11, skew=True)
    cfg = IndexConfig(index_uid="pv", index_dir=str(tmp / "i"),
                      record="position")
    build_index_pandas(pdf, cfg, num_partitions=1)
    return cfg


def _reader(cfg):
    seg = Manifest.load(cfg.index_dir).segments()[0]
    return get_reader(os.path.join(cfg.index_dir, "segments",
                                   seg["segment_id"]),
                      "source_code_default")


def _common_bigram(pdf_like_reader):
    """Pick the term with the highest doc_freq that self-repeats (bursty
    corpus guarantees adjacent repeats) — phrase 'X X' has a large
    candidate set (every doc containing X twice)."""
    td = pdf_like_reader._cached_termdict()
    return td.sort_values("doc_freq").iloc[-1]["term"]


def _phrase_per_doc_reference(reader, terms, slop=0):
    """The round-1 per-candidate-doc loop, kept as the semantic oracle."""
    postings = [reader.term_postings_positions(t) for t in terms]
    if any(p[2] == 0 for p in postings):
        return [], []
    cand = postings[0][0]
    for p in postings[1:]:
        cand = np.intersect1d(cand, p[0], assume_unique=True)
    match_ids, freqs = [], []
    for doc in cand.tolist():
        slot_pos = []
        for d, tf, _df, pos, rs in postings:
            j = np.searchsorted(d, doc)
            slot_pos.append(pos[rs[j]:rs[j] + tf[j]])
        anchors = slot_pos[0]
        for i, sp in enumerate(slot_pos[1:], start=1):
            adj = sp - i
            if slop == 0:
                anchors = np.intersect1d(anchors, adj)
            elif len(adj) == 0:
                anchors = anchors[:0]
            else:
                j = np.searchsorted(adj, anchors)
                lo = np.abs(adj[np.clip(j - 1, 0, len(adj) - 1)]
                            - anchors) <= slop
                hi = np.abs(adj[np.clip(j, 0, len(adj) - 1)]
                            - anchors) <= slop
                anchors = anchors[lo | hi]
            if len(anchors) == 0:
                break
        if len(anchors):
            match_ids.append(doc)
            freqs.append(len(anchors))
    return match_ids, freqs


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_phrase_vectorized_equivalence(pos_idx, slop):
    reader = _reader(pos_idx)
    head = _common_bigram(reader)
    td = reader._cached_termdict()
    mid = td[td.doc_freq >= 50].sort_values("doc_freq").iloc[0]["term"]
    for terms in ([head, head], [head, mid], [mid, head],
                  [head, head, head]):
        ref_ids, ref_freqs = _phrase_per_doc_reference(reader, terms, slop)
        scored = reader._eval_phrase(
            A.Phrase("content", " ".join(terms), slop=slop), "content",
            scoring=True)
        assert scored.docids.tolist() == ref_ids, (terms, slop)
        # identical phrase freqs => identical scores
        w = reader._phrase_weight(
            [reader.term_postings_positions(t)[2] for t in terms])
        fn = reader.fieldnorm_ids()[np.asarray(ref_ids, dtype=np.int64)]
        expect = w.score(np.asarray(ref_freqs, dtype=np.int64), fn)
        assert np.array_equal(scored.scores, expect), (terms, slop)


def test_phrase_vectorized_speedup(pos_idx):
    """>=1k candidate docs; the batched path must beat the per-doc loop
    by a wide margin (typically 30-100x; assert 5x to absorb VM noise)."""
    reader = _reader(pos_idx)
    head = _common_bigram(reader)
    terms = [head, head]
    cand = np.intersect1d(reader.term_postings_positions(head)[0],
                          reader.term_postings_positions(head)[0])
    assert len(cand) >= 1000

    node = A.Phrase("content", f"{head} {head}")
    reader._eval_phrase(node, "content", scoring=True)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        reader._eval_phrase(node, "content", scoring=True)
    vec = (time.perf_counter() - t0) / 3

    _phrase_per_doc_reference(reader, terms)  # warm
    t0 = time.perf_counter()
    ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    _phrase_per_doc_reference(reader, terms)
    ref = time.perf_counter() - t0

    assert vec * 5 < ref, f"vectorized {vec*1e3:.1f}ms vs loop {ref*1e3:.1f}ms"
