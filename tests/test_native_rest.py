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


def test_native_search_basic(idx):
    s = IndexSearcher(idx.index_dir)
    r = native_search(s, {"query": "content:merge", "max_hits": 5})
    assert r["num_hits"] > 5 and len(r["hits"]) == 5
    assert r["errors"] == []
    assert r["hits"][0]["score"] >= r["hits"][-1]["score"]
    assert "repo" in r["hits"][0]["document"]
    # pagination via start_offset
    r2 = native_search(s, {"query": "content:merge", "max_hits": 5,
                           "start_offset": 5})
    all10 = native_search(s, {"query": "content:merge", "max_hits": 10})
    assert [h["doc_id"] for h in r["hits"]] + \
        [h["doc_id"] for h in r2["hits"]] == \
        [h["doc_id"] for h in all10["hits"]]


def test_native_search_sort_and_snippets(idx):
    s = IndexSearcher(idx.index_dir)
    r = native_search(s, {"query": "content:merge",
                          "sort_by": "-nchars", "max_hits": 3,
                          "snippet_fields": "content"})
    vals = [h["document"]["nchars"] for h in r["hits"]]
    assert vals == sorted(vals, reverse=True)
    assert "<b>" in r["hits"][0]["snippet"]["content"][0]
    # search_after cursor round trip
    r2 = native_search(s, {"query": "content:merge",
                           "sort_by": "-nchars", "max_hits": 3,
                           "search_after": r["search_after"]})
    assert not ({h["doc_id"] for h in r["hits"]}
                & {h["doc_id"] for h in r2["hits"]})


def test_native_sorted_count_all_false(idx):
    """count_all=false on the SORTED path reaches sort_search's segment
    early-exit: same hits, num_hits may be a lower bound."""
    s = IndexSearcher(idx.index_dir)
    exact = native_search(s, {"query": "*", "sort_by": "-nchars",
                              "max_hits": 5})
    pruned = native_search(s, {"query": "*", "sort_by": "-nchars",
                               "max_hits": 5, "count_all": False})
    assert [h["doc_id"] for h in exact["hits"]] == \
        [h["doc_id"] for h in pruned["hits"]]
    assert pruned["num_hits"] <= exact["num_hits"]


def test_native_search_pruned_count(idx):
    s = IndexSearcher(idx.index_dir)
    exact = native_search(s, {"query": "merge OR scan", "max_hits": 10})
    pruned = native_search(s, {"query": "merge OR scan", "max_hits": 10,
                               "count_all": False})
    assert [h["doc_id"] for h in exact["hits"]] == \
        [h["doc_id"] for h in pruned["hits"]]
    assert pruned["num_hits"] <= exact["num_hits"]
