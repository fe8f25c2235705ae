"""Multi-index UnionSearcher: global merge order, multi-field sort
tie-breaks, cursor translation, page-based scroll."""

import pytest

from quickwit_spark.search import mgmt_api as M
from quickwit_spark.search.multi import (
    UnionSearcher, resolve_es_index_patterns)


def _mk(root, name, docs):
    doc = {"version": "0.7", "index_id": name,
           "doc_mapping": {"mode": "dynamic",
                           "dynamic_mapping": {"tokenizer": "default",
                                               "fast": True}}}
    M.create_index(str(root), doc)
    cfg = M.load_index_config(f"{root}/{name}")
    M.ingest_ndjson(cfg, docs)
    return f"{root}/{name}"


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("union")
    d1 = _mk(root, "u1", [{"n": 1, "m": 5, "w": "alpha beta"},
                          {"n": 3, "m": 1, "w": "alpha"}])
    d2 = _mk(root, "u2", [{"n": 1, "m": 2, "w": "alpha"},
                          {"n": 2, "w": "beta"}])
    return [d1, d2]


def test_patterns():
    existing = ["gharchive-1", "gharchive-2", "other"]
    assert resolve_es_index_patterns(
        "", "gharchive-*", existing) == ["gharchive-1", "gharchive-2"]
    assert resolve_es_index_patterns(
        "", "gharchive-*,-*-2", existing) == ["gharchive-1"]
    with pytest.raises(KeyError):
        resolve_es_index_patterns("", "gharchive-*,missing", existing)
    assert resolve_es_index_patterns("", "zzz-*", existing) == []


def test_multi_field_sort_tiebreak(dirs):
    """Equal primary keys MUST fall through to the secondary sort
    field (the _KeyWrap __eq__ regression: identity comparison made
    tuple sorts ignore the second field)."""
    u = UnionSearcher(dirs)
    res = u.sort_search("*", k=10, sort_by=(("n", "asc"),
                                            ("m", "asc")))
    import json
    keys = [(json.loads(h.doc["__source"]).get("n"),
             json.loads(h.doc["__source"]).get("m"))
            for h in res.hits]
    # n=1 twice: m 2 before m 5; missing m sorts last within its n
    assert keys == [(1, 2), (1, 5), (2, None), (3, 1)]


def test_union_search_after_deep_page(dirs):
    """values+address cursors page through the union without skipping
    rows (per-index cursor translation: fetching without one starves
    deep pages)."""
    u = UnionSearcher(dirs)
    full = u.search("w:alpha", k=10)
    assert full.num_hits == 3
    page1 = u.search("w:alpha", k=1)
    h = page1.hits[0]
    page2 = u.search("w:alpha", k=2,
                     search_after=(h.score, h.segment_id, h.doc_id))
    ids = [(x.segment_id, x.doc_id) for x in page2.hits]
    want = [(x.segment_id, x.doc_id) for x in full.hits[1:]]
    assert ids == want


def test_union_scroll_pages(dirs):
    u = UnionSearcher(dirs)
    res, sid = u.scroll("*", k=3, ttl_seconds=60,
                        sort_by=(("n", "desc"),))
    assert [h.doc["__source"] is not None for h in res.hits]
    first = [h.doc_id for h in res.hits]
    res2 = u.scroll_next(sid)
    assert res2.num_hits == 4 and len(res2.hits) == 1
    assert u.scroll_clear(sid)
    with pytest.raises(KeyError):
        u.scroll_next(sid)
    assert len(first) == 3


def test_union_sorted_values_only_cursor(dirs):
    """ES values-only search_after pages a sorted union exactly (each
    index applies the strictly-after filter natively)."""
    u = UnionSearcher(dirs)
    full = u.sort_search("*", k=10, sort_by=(("n", "asc"),))
    import json as _j
    ns = [_j.loads(h.doc["__source"]).get("n") for h in full.hits]
    assert ns == [1, 1, 2, 3]
    page2 = u.sort_search("*", k=10, sort_by=(("n", "asc"),),
                          search_after=[1])
    ns2 = [_j.loads(h.doc["__source"]).get("n") for h in page2.hits]
    assert ns2 == [2, 3]
    with pytest.raises(ValueError, match="address cursors"):
        u.sort_search("*", k=2, sort_by=(("n", "asc"),),
                      search_after=[1, "seg", 0])
