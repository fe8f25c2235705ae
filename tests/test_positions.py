"""Position postings, phrase / phrase-prefix queries, delete tasks,
search_after pagination, list_fields.

Phrase oracle: re-tokenize the stored content with the same analyzer and
check token-subsequence containment directly (golden-by-construction).
"""

import os

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.functions.tokenizers import tokenize_one
from quickwit_spark.index.builder import build_index_pandas
from quickwit_spark.index.deletes import apply_delete_query
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.index.merge import merge_segments, run_merges
from quickwit_spark.search import ast as A
from quickwit_spark.search.engine import IndexSearcher, SegmentReader

DOCS = [
    "def quickSort(arr): return mergeSort(arr) if len(arr) else arr",
    "merge sort beats quick sort on linked lists",
    "the quick brown fox jumps over sort order",
    "sortMerge joins shuffle both sides by key",
    "quick sort quick sort quick sort",
    "no relevant terms here at all",
    "sort quick inverted order here",
    "a quick word then much later a sort appears",
]


def _mk(tmp_path, record="position", docs=DOCS, parts=2):
    pdf = pd.DataFrame({
        "repo": [f"r{i % 3}" for i in range(len(docs))],
        "path": [f"f{i}.py" for i in range(len(docs))],
        "commit": ["c0"] * len(docs),
        "lang": ["python"] * len(docs),
        "content": docs,
    })
    cfg = IndexConfig(index_uid="pos", index_dir=str(tmp_path / record),
                      sha_col=None, record=record)
    build_index_pandas(pdf, cfg, num_partitions=parts)
    return cfg


def _phrase_oracle(docs, phrase_toks, slop=0):
    """Docs (by content) containing the phrase."""
    out = []
    for i, text in enumerate(docs):
        toks = tokenize_one(text)
        hit = False
        for s in range(len(toks)):
            if toks[s] != phrase_toks[0]:
                continue
            if slop == 0:
                if toks[s:s + len(phrase_toks)] == phrase_toks:
                    hit = True
                    break
            else:
                ok = True
                for j, pt in enumerate(phrase_toks[1:], start=1):
                    win = toks[max(0, s + j - slop):s + j + slop + 1]
                    if pt not in win:
                        ok = False
                        break
                if ok:
                    hit = True
                    break
        if hit:
            out.append(i)
    return out


def _matched_contents(searcher, node):
    res = searcher.search(node, k=100, fetch_fields=True)
    return sorted(h.doc["path"] for h in res.hits)


def _oracle_paths(ids):
    return sorted(f"f{i}.py" for i in ids)


def test_exact_phrase_matches_oracle(tmp_path):
    cfg = _mk(tmp_path)
    s = IndexSearcher(cfg.index_dir)
    for phrase in ("quick sort", "merge sort", "sort order", "quick brown fox"):
        node = A.Phrase("content", phrase)
        expect = _phrase_oracle(DOCS, phrase.split())
        assert _matched_contents(s, node) == _oracle_paths(expect), phrase


def test_phrase_not_mere_intersection(tmp_path):
    cfg = _mk(tmp_path)
    s = IndexSearcher(cfg.index_dir)
    # doc 6 has both terms but inverted order; doc 7 far apart
    got = _matched_contents(s, A.Phrase("content", "quick sort"))
    assert "f6.py" not in got
    assert "f7.py" not in got
    # freq-only index degrades to intersection and DOES match them
    cfg2 = _mk(tmp_path, record="freq")
    s2 = IndexSearcher(cfg2.index_dir)
    got2 = _matched_contents(s2, A.Phrase("content", "quick sort"))
    assert "f6.py" in got2 and "f7.py" in got2


def test_phrase_slop(tmp_path):
    cfg = _mk(tmp_path)
    s = IndexSearcher(cfg.index_dir)
    # "quick ... sort" with one word between ("quick brown fox" no;
    # "quick sort" yes; slop=2 lets "sort quick" (transposed) match too)
    got1 = _matched_contents(s, A.Phrase("content", "quick sort", slop=1))
    expect1 = _phrase_oracle(DOCS, ["quick", "sort"], slop=1)
    assert got1 == _oracle_paths(expect1)
    assert set(_matched_contents(s, A.Phrase("content", "quick sort"))) <= \
        set(got1)


def test_phrase_prefix(tmp_path):
    cfg = _mk(tmp_path)
    s = IndexSearcher(cfg.index_dir)
    got = _matched_contents(s, A.PhrasePrefix("content", "merge so"))
    # "merge sort" matches doc 1 ("merge sort beats...")
    assert "f1.py" in got
    assert "f5.py" not in got
    # parser surface
    got2 = _matched_contents(s, s.parse('content:"merge so"*'))
    assert got2 == got


def test_phrase_scores_positive_and_freq_sensitive(tmp_path):
    cfg = _mk(tmp_path)
    s = IndexSearcher(cfg.index_dir)
    res = s.search(A.Phrase("content", "quick sort"), k=10)
    assert res.num_hits >= 2
    scores = {h.doc["path"]: h.score for h in res.hits}
    # doc 4 repeats the phrase 3x => higher tf => higher score than doc 1
    assert scores["f4.py"] > scores["f1.py"]


def test_merge_preserves_positions(tmp_path):
    from quickwit_spark.config import MergePolicyConfig
    from quickwit_spark.index.merge_policy import StableLogMergePolicy
    cfg = _mk(tmp_path, parts=4)
    s = IndexSearcher(cfg.index_dir)
    before = _matched_contents(s, A.Phrase("content", "quick sort"))
    n_ops = run_merges(cfg.index_dir, policy=StableLogMergePolicy(
        MergePolicyConfig(merge_factor=2, max_merge_factor=4,
                          min_level_num_docs=1)))
    assert n_ops >= 1
    s2 = IndexSearcher(cfg.index_dir)
    assert len(s2.manifest.segments()) < 4
    assert _matched_contents(s2, A.Phrase("content", "quick sort")) == before
    # merged segment still answers slop + prefix correctly
    assert _matched_contents(
        s2, A.Phrase("content", "quick sort", slop=1)) == \
        _oracle_paths(_phrase_oracle(DOCS, ["quick", "sort"], slop=1))


def test_merge_idempotent_with_positions(tmp_path):
    cfg = _mk(tmp_path, parts=2)
    m = Manifest.load(cfg.index_dir)
    parents = sorted(m.segments(), key=lambda s: s["segment_id"])
    meta1 = merge_segments(cfg.index_dir, parents)
    seg_dir = os.path.join(cfg.index_dir, "segments", meta1["segment_id"])
    import hashlib
    h1 = {f: hashlib.sha256(
        open(os.path.join(seg_dir, f), "rb").read()).hexdigest()
        for f in os.listdir(seg_dir)}
    meta2 = merge_segments(cfg.index_dir, parents)
    h2 = {f: hashlib.sha256(
        open(os.path.join(seg_dir, f), "rb").read()).hexdigest()
        for f in os.listdir(seg_dir)}
    assert meta1["segment_id"] == meta2["segment_id"]
    assert h1 == h2


def test_delete_query_rewrites_segments(tmp_path):
    cfg = _mk(tmp_path, parts=2)
    s = IndexSearcher(cfg.index_dir)
    n_before = s.count("*")
    assert n_before == len(DOCS)
    stats = apply_delete_query(cfg.index_dir, A.Phrase("content",
                                                       "quick sort"))
    assert stats["docs_deleted"] == len(_phrase_oracle(DOCS,
                                                       ["quick", "sort"]))
    s2 = IndexSearcher(cfg.index_dir)
    assert s2.count("*") == n_before - stats["docs_deleted"]
    assert s2.search(A.Phrase("content", "quick sort"), k=10).num_hits == 0
    # non-deleted docs still searchable, phrases still work post-rewrite
    assert s2.search(A.Term("content", "shuffle"), k=10).num_hits == 1
    got = _matched_contents(s2, A.Phrase("content", "inverted order"))
    assert got == ["f6.py"]
    # idempotent: re-applying deletes nothing
    stats2 = apply_delete_query(cfg.index_dir, A.Phrase("content",
                                                        "quick sort"))
    assert stats2["docs_deleted"] == 0
    # vacuum drops the dead parents
    dead = Manifest.load(cfg.index_dir).vacuum()
    assert len(dead) >= 1
    s3 = IndexSearcher(cfg.index_dir)
    assert s3.count("*") == n_before - stats["docs_deleted"]


def test_search_after_pagination(tmp_path):
    cfg = _mk(tmp_path, parts=3)
    s = IndexSearcher(cfg.index_dir)
    node = A.Bool(should=(A.Term("content", "quick"),
                          A.Term("content", "sort")))
    full = s.search(node, k=100, fetch_fields=False)
    pages = []
    cursor = None
    while True:
        page = s.search(node, k=3, fetch_fields=False, search_after=cursor)
        if not page.hits:
            break
        pages.extend((h.segment_id, h.doc_id, h.score) for h in page.hits)
        cursor = page.next_cursor
    assert pages == [(h.segment_id, h.doc_id, h.score) for h in full.hits]


def test_list_fields(tmp_path):
    cfg = _mk(tmp_path)
    s = IndexSearcher(cfg.index_dir)
    fields = {f["field"]: f for f in s.list_fields()}
    assert "lang" in fields and fields["lang"]["tag"]
    assert "fieldnorm" in fields
    assert fields["repo"]["segments"] == len(s.manifest.segments())


def test_position_index_rank_matches_freq_for_term_queries(tmp_path):
    """Positions change storage, not term scoring."""
    cfg_p = _mk(tmp_path, record="position")
    cfg_f = _mk(tmp_path, record="freq")
    sp, sf = IndexSearcher(cfg_p.index_dir), IndexSearcher(cfg_f.index_dir)
    for q in (A.Term("content", "sort"),
              A.Bool(must=(A.Term("content", "quick"),
                           A.Term("content", "sort")))):
        rp = [(h.doc_id, h.score) for h in sp.search(q, k=10,
                                                     fetch_fields=False).hits]
        rf = [(h.doc_id, h.score) for h in sf.search(q, k=10,
                                                     fetch_fields=False).hits]
        assert rp == rf
