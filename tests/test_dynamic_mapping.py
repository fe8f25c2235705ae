"""Dynamic mapping mode (doc_mapping.rs:26-47 `mode: dynamic`,
find_field_or_hit_dynamic in query_ast/utils.rs): unmapped JSON paths are
indexed as exact terms in a reserved namespace of the shared termdict, so
Term / TermSet / exists queries on any path work without schema changes."""

import json

import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.index.builder import build_index_pandas
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.index.merge import merge_segments
from quickwit_spark.search import ast as A
from quickwit_spark.search.engine import IndexSearcher

DOCS = [
    ("r0", "a.py", "c0", "python", "merge sort quick",
     {"severity": "error", "attrs": {"region": "eu", "stars": 5}}),
    ("r0", "b.py", "c0", "python", "quick scan",
     {"severity": "warn", "attrs": {"region": "us"}, "tags": ["x", "y"]}),
    ("r1", "c.rs", "c0", "rust", "merge scan",
     {"severity": "error", "attrs": {"stars": 3}}),
    ("r1", "d.rs", "c0", "rust", "sort scan", None),
]


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dyn")
    pdf = pd.DataFrame(DOCS, columns=["repo", "path", "commit", "lang",
                                      "content", "extra"])
    pdf["extra"] = pdf["extra"].map(
        lambda v: json.dumps(v) if v is not None else None)
    cfg = IndexConfig(index_uid="dyn", index_dir=str(tmp / "i"),
                      sha_col=None, dynamic_col="extra")
    build_index_pandas(pdf, cfg, num_partitions=2)
    return cfg


def _ids(searcher, node):
    res = searcher.search(node, k=100, fetch_fields=True)
    return sorted(h.doc["path"] for h in res.hits)


def test_dynamic_term_queries(idx):
    s = IndexSearcher(idx.index_dir)
    assert _ids(s, A.Term("severity", "error")) == ["a.py", "c.rs"]
    assert _ids(s, A.Term("attrs.region", "eu")) == ["a.py"]
    assert _ids(s, A.Term("attrs.stars", "5")) == ["a.py"]
    assert _ids(s, A.Term("tags", "x")) == ["b.py"]
    assert _ids(s, A.Term("attrs.region", "nowhere")) == []


def test_dynamic_termset_and_exists(idx):
    s = IndexSearcher(idx.index_dir)
    assert _ids(s, A.TermSet("attrs.region", ("eu", "us"))) == \
        ["a.py", "b.py"]
    assert _ids(s, A.FieldPresence("attrs.stars")) == ["a.py", "c.rs"]
    assert _ids(s, A.FieldPresence("severity")) == \
        ["a.py", "b.py", "c.rs"]


def test_dynamic_combines_with_text_and_mapped_fields(idx):
    s = IndexSearcher(idx.index_dir)
    node = A.Bool(must=(A.Term("content", "merge"),),
                  filter=(A.Term("severity", "error"),))
    assert _ids(s, node) == ["a.py", "c.rs"]
    # mapped column still resolves as a doc column, not dynamically
    node2 = A.Bool(must=(A.Term("lang", "python"),),
                   filter=(A.Term("attrs.region", "us"),))
    assert _ids(s, node2) == ["b.py"]


def test_dynamic_terms_hidden_from_text_scans(idx):
    s = IndexSearcher(idx.index_dir)
    terms = s.list_terms(limit=10_000)
    assert all(not t.startswith("\x01") for t in terms)
    res = s.search(A.Wildcard("content", "*e*"), k=100, fetch_fields=False)
    assert res.num_hits > 0  # matches text terms only — no crash/leak


def test_dynamic_survives_merge(idx):
    m = Manifest.load(idx.index_dir)
    parents = m.segments()
    assert len(parents) == 2
    meta = merge_segments(idx.index_dir, parents)
    m.publish([meta], replaced_segment_ids=[p["segment_id"]
                                            for p in parents])
    s = IndexSearcher(idx.index_dir)
    assert len(s.manifest.segments()) == 1
    assert _ids(s, A.Term("severity", "error")) == ["a.py", "c.rs"]
    assert _ids(s, A.FieldPresence("attrs.stars")) == ["a.py", "c.rs"]


def test_dynamic_numeric_range(idx):
    """Range queries on unmapped numeric paths: int leaves get sortable
    \\x02-namespace terms, so a numeric range resolves to a term-range
    scan (typed dynamic-field semantics)."""
    s = IndexSearcher(idx.index_dir)
    # stars: a.py=5, c.rs=3
    assert _ids(s, A.Range("attrs.stars", gte=4)) == ["a.py"]
    assert _ids(s, A.Range("attrs.stars", gte=3)) == ["a.py", "c.rs"]
    assert _ids(s, A.Range("attrs.stars", gt=3)) == ["a.py"]
    assert _ids(s, A.Range("attrs.stars", lte=3)) == ["c.rs"]
    assert _ids(s, A.Range("attrs.stars", lt=3)) == []
    assert _ids(s, A.Range("attrs.stars", gte=3, lt=5)) == ["c.rs"]
    # float bounds round to the enclosing int range
    assert _ids(s, A.Range("attrs.stars", gte=3.5)) == ["a.py"]
    assert _ids(s, A.Range("attrs.stars", lte=4.5)) == ["c.rs"]
    # combined with mapped filters and text
    node = A.Bool(must=(A.Term("content", "scan"),),
                  filter=(A.Range("attrs.stars", gte=1),))
    assert _ids(s, node) == ["c.rs"]
    # numeric namespace stays hidden from text term listings
    assert all(t >= "\x03" for t in s.list_terms(limit=100000))
