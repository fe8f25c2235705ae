"""Native /api/v1 search facade (rest_handler.rs SearchRequestQueryString
params; response shape from root_search_aux)."""

import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.index.builder import build_index_pandas
from quickwit_spark.index.corpus import corpus_pandas
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.search.rest import native_search


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rest")
    pdf = corpus_pandas(300, seed=21)
    pdf["nchars"] = pdf["content"].str.len()
    cfg = IndexConfig(index_uid="rest", index_dir=str(tmp / "i"),
                      store_cols=("nchars", "content"))
    build_index_pandas(pdf, cfg, num_partitions=3)
    return cfg


def _ids(resp):
    """Hit identity: hits are plain document JSON (the reference's
    SearchResponseRest shape), so identify by the doc key columns."""
    return [(h["repo"], h["path"], h["commit"]) for h in resp["hits"]]


def test_native_search_basic(idx):
    s = IndexSearcher(idx.index_dir)
    r = native_search(s, {"query": "content:merge", "max_hits": 5})
    assert r["num_hits"] > 5 and len(r["hits"]) == 5
    assert r["errors"] == []
    # hits are the documents themselves (search_response_rest.rs:43)
    assert "repo" in r["hits"][0] and "document" not in r["hits"][0]
    # pagination via start_offset
    r2 = native_search(s, {"query": "content:merge", "max_hits": 5,
                           "start_offset": 5})
    all10 = native_search(s, {"query": "content:merge", "max_hits": 10})
    assert _ids(r) + _ids(r2) == _ids(all10)


def test_native_search_sort_and_snippets(idx):
    s = IndexSearcher(idx.index_dir)
    r = native_search(s, {"query": "content:merge",
                          "sort_by": "-nchars", "max_hits": 3,
                          "snippet_fields": "content"})
    vals = [h["nchars"] for h in r["hits"]]
    assert vals == sorted(vals, reverse=True)
    # snippets ride in the parallel `snippets` array
    assert "<b>" in r["snippets"][0]["content"][0]
    # search_after cursor round trip
    r2 = native_search(s, {"query": "content:merge",
                           "sort_by": "-nchars", "max_hits": 3,
                           "search_after": r["search_after"]})
    assert not (set(_ids(r)) & set(_ids(r2)))


def test_native_sorted_count_all_false(idx):
    """count_all=false on the SORTED path reaches sort_search's segment
    early-exit: same hits, num_hits may be a lower bound."""
    s = IndexSearcher(idx.index_dir)
    exact = native_search(s, {"query": "*", "sort_by": "-nchars",
                              "max_hits": 5})
    pruned = native_search(s, {"query": "*", "sort_by": "-nchars",
                               "max_hits": 5, "count_all": False})
    assert _ids(exact) == _ids(pruned)
    assert pruned["num_hits"] <= exact["num_hits"]


def test_native_search_pruned_count(idx):
    s = IndexSearcher(idx.index_dir)
    exact = native_search(s, {"query": "merge OR scan", "max_hits": 10})
    pruned = native_search(s, {"query": "merge OR scan", "max_hits": 10,
                               "count_all": False})
    assert _ids(exact) == _ids(pruned)
    assert pruned["num_hits"] <= exact["num_hits"]


# ------------------------------------------------- review-pass regressions

def test_sort_by_bare_score_is_desc(idx):
    """sort_by=_score must return best-first like the ES facade and
    every client's expectation — not ascending worst-first."""
    s = IndexSearcher(idx.index_dir)
    r = native_search(s, {"query": "content:merge",
                          "sort_by": "_score", "max_hits": 5})
    plain = native_search(s, {"query": "content:merge", "max_hits": 5})
    assert _ids(r) == _ids(plain)
    # explicit +_score still means ascending: worst-scored docs first,
    # so the page must differ from the best-first page (scores are not
    # exposed in the reference response shape; compare via the engine)
    asc = native_search(s, {"query": "content:merge",
                            "sort_by": "+_score", "max_hits": 5})
    eng = s.sort_search(s.parse("content:merge"), k=5,
                        sort_by=(("_score", "asc"),))
    assert _ids(asc) == [(h.doc["repo"], h.doc["path"],
                          h.doc["commit"]) for h in eng.hits]


def test_get_style_search_after_cursor_roundtrip(idx):
    """A GET query-string cursor is a STRING; tuple() used to explode
    it into characters. The comma form a client echoes back must
    paginate correctly."""
    s = IndexSearcher(idx.index_dir)
    p1 = native_search(s, {"query": "content:merge",
                           "sort_by": "-nchars", "max_hits": 5})
    cursor = p1["search_after"]
    assert cursor is not None
    # body-style list cursor
    p2 = native_search(s, {"query": "content:merge",
                           "sort_by": "-nchars", "max_hits": 5,
                           "search_after": cursor})
    # GET-style comma string of the same cursor
    p2_get = native_search(s, {"query": "content:merge",
                               "sort_by": "-nchars", "max_hits": 5,
                               "search_after":
                                   ",".join(str(v) for v in cursor)})
    assert _ids(p2_get) == _ids(p2)
    assert not (set(_ids(p1)) & set(_ids(p2_get)))


def test_snippet_fields_comma_space(idx):
    """'a, b' (comma-space) must snippet BOTH fields."""
    s = IndexSearcher(idx.index_dir)
    r = native_search(s, {"query": "content:merge", "max_hits": 3,
                          "snippet_fields": " content , content "})
    assert all("content" in snip for snip in r["snippets"])
