"""Doc-mapping update flow (reference: doc_mapping_uid bump,
split_metadata.rs:132-134; update_tests/doc_mapping_tests.rs): an index
gains a NEW mapping generation (schema_rev + analysis changes) without
rewriting existing segments. Search unions generations with PER-REV
query compilation; merges never cross revs; reused/unchanged revs
refuse loudly."""

import pandas as pd
import pytest

from quickwit_spark.config import IndexConfig, MergePolicyConfig
from quickwit_spark.index.builder import build_index_pandas, update_index
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.index.merge import plan_merges, run_merges
from quickwit_spark.index.merge_policy import StableLogMergePolicy
from quickwit_spark.search import ast as A
from quickwit_spark.search.engine import IndexSearcher


def _docs(tag, texts):
    return pd.DataFrame({
        "repo": ["r"] * len(texts),
        "path": [f"{tag}{i}" for i in range(len(texts))],
        "commit": ["c"] * len(texts), "lang": ["x"] * len(texts),
        "content": texts})


@pytest.fixture()
def two_rev_index(tmp_path, spark):
    """Gen v1: source_code_default (camelCase split + lowercase).
    Gen v2: whitespace (no split inside runs, case preserved)."""
    from quickwit_spark.streaming.incremental import ingest_batch

    cfg = IndexConfig(index_uid="up", index_dir=str(tmp_path / "up"),
                      sha_col=None, tokenizer="source_code_default",
                      schema_rev="v1")
    build_index_pandas(
        _docs("a", ["FooBar baz one", "plain merge text"]), cfg,
        num_partitions=1)
    cfg2 = update_index(cfg, "v2", tokenizer="whitespace")
    assert cfg2.tokenizer == "whitespace" and cfg2.schema_rev == "v2"
    # new-generation ingest goes through a string-keyed checkpoint path
    ingest_batch(spark.createDataFrame(
        _docs("b", ["FooBar baz two", "merge again"])), cfg2,
        batch_id=1, partitions_per_batch=1)
    return cfg, cfg2


def test_search_unions_generations_per_rev(two_rev_index):
    cfg, _cfg2 = two_rev_index
    s = IndexSearcher(cfg.index_dir)
    segs = s.manifest.segments()
    assert {sg["schema_rev"] for sg in segs} == {"v1", "v2"}

    # 'foo' exists only under the v1 analyzer (camelCase split + lower)
    r = s.search(A.Term("content", "foo"), k=10, fetch_fields=True)
    assert {h.doc["path"] for h in r.hits} == {"a0"}
    # 'FooBar' (case-sensitive whole run) only under v2 whitespace
    r = s.search(A.Term("content", "FooBar"), k=10, fetch_fields=True)
    assert {h.doc["path"] for h in r.hits} == {"b0"}
    # a term identical under both analyzers unions the generations
    r = s.search(A.Term("content", "merge"), k=10, fetch_fields=True)
    assert {h.doc["path"] for h in r.hits} == {"a1", "b1"}
    # FullText compiles per segment rev: "FooBar baz" -> v1 [foo,bar,baz]
    # AND (no match in v1 doc? it has all three) / v2 ["FooBar","baz"]
    r = s.search(A.FullText("content", "FooBar baz"), k=10,
                 fetch_fields=True)
    assert {h.doc["path"] for h in r.hits} == {"a0", "b0"}


def test_merges_never_cross_revs(two_rev_index):
    cfg, _cfg2 = two_rev_index
    m = Manifest.load(cfg.index_dir)
    pol = StableLogMergePolicy(MergePolicyConfig(
        merge_factor=2, max_merge_factor=4, min_level_num_docs=1,
        split_num_docs_target=1_000_000))
    ops = plan_merges(m.segments(), pol)
    for op in ops:
        revs = {s["schema_rev"] for s in op.segments}
        assert len(revs) == 1, f"cross-rev merge planned: {revs}"
    run_merges(cfg.index_dir, policy=pol)
    merged = Manifest.load(cfg.index_dir).segments()
    assert {sg["schema_rev"] for sg in merged} == {"v1", "v2"}
    # per-rev compilation survives compaction
    s = IndexSearcher(cfg.index_dir)
    assert {h.doc["path"] for h in s.search(
        A.Term("content", "FooBar"), k=10, fetch_fields=True).hits} \
        == {"b0"}


def test_update_refuses_stale_or_reused_rev(two_rev_index):
    cfg, cfg2 = two_rev_index
    m = Manifest.load(cfg.index_dir)
    with pytest.raises(ValueError, match="already current"):
        m.update_doc_mapping("v2", tokenizer="default")
    with pytest.raises(ValueError, match="already used"):
        m.update_doc_mapping("v1", tokenizer="default")
    # a genuinely fresh rev is fine
    cfg3 = update_index(cfg2, "v3", tokenizer="default")
    assert cfg3.schema_rev == "v3"
    assert Manifest.load(cfg.index_dir).data["config"]["tokenizer"] \
        == "default"
