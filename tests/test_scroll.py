"""Scroll API: TTL'd contexts over search_after (scroll_context.rs,
root.rs:342-373). Paging an entire result set through _scroll-shaped
calls must reproduce the one-shot ranking exactly."""

import numpy as np
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.index.builder import build_index_pandas
from quickwit_spark.index.corpus import corpus_pandas
from quickwit_spark.search import ast as A
from quickwit_spark.search.engine import IndexSearcher


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scroll")
    pdf = corpus_pandas(300, seed=9)
    cfg = IndexConfig(index_uid="sc", index_dir=str(tmp / "i"))
    build_index_pandas(pdf, cfg, num_partitions=3)
    return cfg


def test_scroll_pages_entire_result_set(idx):
    s = IndexSearcher(idx.index_dir)
    node = A.Term("content", "merge")
    full = s.search(node, k=10_000, fetch_fields=False)
    assert full.num_hits > 30
    pages = []
    res, sid = s.scroll(node, k=7, fetch_fields=False)
    while res.hits:
        pages.extend((float(np.float32(h.score)), h.segment_id, h.doc_id)
                     for h in res.hits)
        res = s.scroll_next(sid)
    want = [(float(np.float32(h.score)), h.segment_id, h.doc_id)
            for h in full.hits]
    assert pages == want
    s.scroll_clear(sid)
    with pytest.raises(KeyError):
        s.scroll_next(sid)


def test_scroll_ttl_expiry(idx):
    s = IndexSearcher(idx.index_dir)
    res, sid = s.scroll("content:merge", k=5, ttl_seconds=-1.0,
                        fetch_fields=False)
    with pytest.raises(KeyError):
        s.scroll_next(sid)


def test_scroll_survives_new_searcher_instance(idx):
    s1 = IndexSearcher(idx.index_dir)
    res, sid = s1.scroll("content:merge", k=5, fetch_fields=False)
    s2 = IndexSearcher(idx.index_dir)  # KV lives beside the manifest
    nxt = s2.scroll_next(sid)
    assert nxt.hits
    assert nxt.hits[0].doc_id != res.hits[0].doc_id or \
        nxt.hits[0].segment_id != res.hits[0].segment_id


def test_scroll_context_is_json_not_pickle(tmp_path):
    """Scroll contexts persist as tagged-JSON AST (scroll_context.rs
    stores serialized protos): no pickle in the KV file — unpickling an
    attacker-writable file would be arbitrary code execution."""
    import datetime
    import json

    import pytest

    from quickwit_spark.search import ast as A
    from quickwit_spark.search.ast import ast_from_json, ast_to_json
    node = A.Bool(
        must=(A.Term("content", "x"), A.Phrase("content", "a b", slop=2)),
        must_not=(A.Wildcard("path", "*.py"),),
        should=(A.Boost(A.TermSet("lang", ("py", "rs")), 2.5),),
        filter=(A.Range("ts", gte=datetime.datetime(2024, 1, 2, 3, 4, 5),
                        lt=10),),
        minimum_should_match=1)
    j = json.loads(json.dumps(ast_to_json(node)))  # JSON-serializable
    assert ast_from_json(j) == node
    with pytest.raises(ValueError):
        ast_from_json({"t": "__import__"})  # unknown tags never execute
