"""Distributed leaf fan-outs must return results identical to the
in-process leaf loop: sort_search (collector.rs:994-1145) and list_terms
(list_terms.rs:47-330, per-split leaf limit)."""

import os

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.index.builder import build_index_pandas
from quickwit_spark.index.corpus import corpus_pandas
from quickwit_spark.search import ast as A
from quickwit_spark.search.engine import IndexSearcher


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dleaves")
    pdf = corpus_pandas(1200, seed=5)
    pdf["nchars"] = pdf["content"].str.len()
    cfg = IndexConfig(index_uid="dl", index_dir=str(tmp / "i"),
                      store_cols=("nchars", "lang"))
    build_index_pandas(pdf, cfg, num_partitions=6)
    return cfg


def _hits_key(res):
    return [(h.segment_id, h.doc_id, h.score) for h in res.hits]


@pytest.mark.parametrize("sort_by", [
    (("nchars", "desc"),),
    (("nchars", "asc"), ("_score", "desc")),
    (("_score", "desc"), ("_doc", "asc")),
])
def test_sort_search_distributed_identical(idx, spark, sort_by):
    local = IndexSearcher(idx.index_dir)
    dist = IndexSearcher(idx.index_dir, spark=spark)
    node = A.Term("content", "merge")
    a = local.sort_search(node, k=15, sort_by=sort_by, fetch_fields=False)
    b = dist.sort_search(node, k=15, sort_by=sort_by, fetch_fields=False)
    assert a.num_hits == b.num_hits
    assert _hits_key(a) == _hits_key(b)


def test_sort_search_distributed_string_field(idx, spark):
    local = IndexSearcher(idx.index_dir)
    dist = IndexSearcher(idx.index_dir, spark=spark)
    node = A.MatchAll()
    a = local.sort_search(node, k=10, sort_by=(("lang", "asc"),),
                          fetch_fields=False)
    b = dist.sort_search(node, k=10, sort_by=(("lang", "asc"),),
                         fetch_fields=False)
    assert _hits_key(a) == _hits_key(b)


def test_list_terms_distributed_and_limit_pushdown(idx, spark):
    local = IndexSearcher(idx.index_dir)
    dist = IndexSearcher(idx.index_dir, spark=spark)
    for kw in ({}, {"start": "m", "end": "n"}, {"start": "get"},
               {"limit": 7}):
        a = local.list_terms(**kw)
        b = dist.list_terms(**kw)
        assert a == b, kw
    # per-segment pushdown still yields the true global top-limit
    full = local.list_terms(start="a", end="z", limit=10**9)
    lim = local.list_terms(start="a", end="z", limit=25)
    assert lim == full[:25]
