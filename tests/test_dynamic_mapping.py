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
    # float bounds are exact under the sortable-f64 encoding
    assert _ids(s, A.Range("attrs.stars", gte=3.5)) == ["a.py"]
    assert _ids(s, A.Range("attrs.stars", lte=4.5)) == ["c.rs"]
    assert _ids(s, A.Range("attrs.stars", gte=5.0)) == ["a.py"]
    assert _ids(s, A.Range("attrs.stars", gt=5.0)) == []
    # combined with mapped filters and text
    node = A.Bool(must=(A.Term("content", "scan"),),
                  filter=(A.Range("attrs.stars", gte=1),))
    assert _ids(s, node) == ["c.rs"]
    # numeric namespace stays hidden from text term listings
    assert all(t >= "\x03" for t in s.list_terms(limit=100000))


def test_dynamic_float_leaves_range(tmp_path):
    """Float JSON leaves are range-queryable too (sortable f64 bits:
    order-preserving across negatives, zeros, and fractions)."""
    import json as _json
    vals = [-3.5, -0.25, 0.0, 0.25, 1.5, 2.0, 1000.125]
    pdf = pd.DataFrame({
        "repo": [f"r{i}" for i in range(len(vals))],
        "path": [f"p{i}" for i in range(len(vals))],
        "commit": ["c"] * len(vals), "lang": ["python"] * len(vals),
        "content": ["alpha"] * len(vals),
        "extra": [_json.dumps({"score": v}) for v in vals],
    })
    cfg = IndexConfig(index_uid="fd", index_dir=str(tmp_path / "f"),
                      sha_col=None, dynamic_col="extra")
    build_index_pandas(pdf, cfg, num_partitions=1)
    s = IndexSearcher(cfg.index_dir)

    def got(**kw):
        res = s.search(A.Range("score", **kw), k=100, fetch_fields=True)
        return sorted(h.doc["path"] for h in res.hits)

    def want(pred):
        return sorted(f"p{i}" for i, v in enumerate(vals) if pred(v))

    assert got(gte=0.0) == want(lambda v: v >= 0.0)
    assert got(gt=0.0) == want(lambda v: v > 0.0)
    assert got(lt=0.0) == want(lambda v: v < 0.0)
    assert got(lte=-0.25) == want(lambda v: v <= -0.25)
    assert got(gte=-1.0, lt=2.0) == want(lambda v: -1.0 <= v < 2.0)
    assert got(gt=1.5, lte=1000.125) == \
        want(lambda v: 1.5 < v <= 1000.125)
