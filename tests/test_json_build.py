"""Distributed schemaless ingest: build_index_json (doc-mapper
projection inside executors) vs the driver-side ingest path."""

import json

import pytest

from quickwit_spark.index.builder import build_index_json
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.search import ast as A
from quickwit_spark.search import mgmt_api as M
from quickwit_spark.search.engine import IndexSearcher

CONFIG = {
    "version": "0.7", "index_id": "jdocs",
    "doc_mapping": {
        "mode": "dynamic",
        "field_mappings": [
            {"name": "text", "type": "text", "tokenizer": "default",
             "record": "position"},
            {"name": "n", "type": "u64", "fast": True}],
        "dynamic_mapping": {"tokenizer": "default",
                            "expand_dots": True, "fast": True}}}

DOCS = [{"text": f"alpha doc {i}", "n": i,
         "meta": {"lang": "en" if i % 3 else "fr", "k": i * 2}}
        for i in range(60)]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("jb"))
    lines = [json.dumps(d) for d in DOCS] + ["{not json", "[1,2]"]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    build_index_json(spark, df, CONFIG, root, num_partitions=4)
    return root


def test_counts_and_queries_match_driver_ingest(built, spark,
                                                tmp_path):
    s = IndexSearcher(f"{built}/jdocs")
    assert s.count(A.MatchAll()) == 60  # invalid lines dropped
    # same docs through the driver-side HTTP ingest path
    root2 = str(tmp_path)
    M.create_index(root2, dict(CONFIG))
    cfg2 = M.load_index_config(f"{root2}/jdocs")
    M.ingest_ndjson(cfg2, DOCS)
    s2 = IndexSearcher(f"{root2}/jdocs")
    for node in (A.Term("meta.lang", "fr"),
                 A.Range("n", gte=10, lt=30),
                 A.FullText("text", "alpha"),
                 A.Range("meta.k", gte=40, lte=80)):
        assert s.count(node) == s2.count(node), node


def test_resume_is_noop(built, spark):
    m1 = Manifest.load(f"{built}/jdocs")
    segs1 = sorted(m1.data["segments"])
    lines = [json.dumps(d) for d in DOCS] + ["{not json", "[1,2]"]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    build_index_json(spark, df, CONFIG, built, num_partitions=4)
    m2 = Manifest.load(f"{built}/jdocs")
    assert sorted(m2.data["segments"]) == segs1


def test_structured_config_refused(spark, tmp_path):
    cfg = {"version": "0.7", "index_id": "x",
           "doc_mapping": {"doc_id_fields": ["id"],
                           "field_mappings": [
                               {"name": "text", "type": "text"}]}}
    df = spark.createDataFrame([("{}",)], "value string")
    with pytest.raises(ValueError, match="doc-mapper"):
        build_index_json(spark, df, cfg, str(tmp_path))
