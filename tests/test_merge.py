"""Merge policy + executor tests (FIXTURES.md F6): policy determinism,
merge idempotence (byte-identical re-run), merged-index rank identity vs
the oracle, and hierarchical merge to a single mature-ish segment."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from quickwit_spark.config import IndexConfig, MergePolicyConfig
from quickwit_spark.index.builder import build_index_pandas
from quickwit_spark.index.corpus import corpus_pandas
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.index.merge import merge_segments, run_merges
from quickwit_spark.index.merge_policy import StableLogMergePolicy
from quickwit_spark.search import ast as A
from quickwit_spark.search.engine import IndexSearcher
from tests.oracle import OracleEngine, OracleSegment

N_DOCS = 240


def _mk_seg(i, num_docs, merge_ops=0):
    return {"segment_id": f"seg-{i:04d}", "num_docs": num_docs,
            "num_merge_ops": merge_ops, "schema_rev": "v1",
            "tokenizer": "t", "record": "freq", "fieldnorms": True,
            "tags": {}}


class TestPolicy:
    def test_ten_equal_segments_merge(self):
        pol = StableLogMergePolicy(MergePolicyConfig(
            min_level_num_docs=100, split_num_docs_target=10_000))
        segs = [_mk_seg(i, 40) for i in range(10)]
        ops = pol.operations(segs)
        assert len(ops) == 1
        assert len(ops[0].segments) == 10

    def test_too_few_segments_no_merge(self):
        pol = StableLogMergePolicy(MergePolicyConfig(
            min_level_num_docs=100, split_num_docs_target=10_000))
        segs = [_mk_seg(i, 40) for i in range(9)]
        assert pol.operations(segs) == []

    def test_mature_never_merges(self):
        pol = StableLogMergePolicy(MergePolicyConfig(
            min_level_num_docs=100, split_num_docs_target=1_000))
        segs = [_mk_seg(i, 2_000) for i in range(12)]
        assert pol.operations(segs) == []

    def test_max_merge_factor_cap(self):
        pol = StableLogMergePolicy(MergePolicyConfig(
            merge_factor=10, max_merge_factor=12,
            min_level_num_docs=100, split_num_docs_target=100_000))
        segs = [_mk_seg(i, 40) for i in range(30)]
        ops = pol.operations(segs)
        assert all(len(op.segments) <= 12 for op in ops)
        assert max(len(op.segments) for op in ops) == 12

    def test_shuffle_invariance(self):
        import random
        pol = StableLogMergePolicy(MergePolicyConfig(
            min_level_num_docs=100, split_num_docs_target=100_000))
        segs = [_mk_seg(i, 40 + 7 * (i % 5)) for i in range(25)]
        ops1 = pol.operations(list(segs))
        shuffled = list(segs)
        random.Random(3).shuffle(shuffled)
        ops2 = pol.operations(shuffled)
        assert [op.segment_ids() for op in ops1] == \
            [op.segment_ids() for op in ops2]


@pytest.fixture(scope="module")
def many_segments(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("merge")
    pdf = corpus_pandas(N_DOCS, seed=42)
    cfg = IndexConfig(index_uid="m", index_dir=str(tmp / "m"))
    build_index_pandas(pdf, cfg, num_partitions=12)
    return pdf, cfg


def _small_policy():
    return StableLogMergePolicy(MergePolicyConfig(
        merge_factor=10, max_merge_factor=12, min_level_num_docs=10,
        split_num_docs_target=1_000_000))


def test_merge_idempotent_and_deterministic(many_segments, tmp_path):
    pdf, cfg = many_segments
    dir_a = str(tmp_path / "a")
    dir_b = str(tmp_path / "b")
    shutil.copytree(cfg.index_dir, dir_a)
    shutil.copytree(cfg.index_dir, dir_b)
    n_a = run_merges(dir_a, policy=_small_policy())
    n_b = run_merges(dir_b, policy=_small_policy())
    assert n_a == n_b >= 1
    segs_a = sorted(s["segment_id"] for s in Manifest.load(dir_a).segments())
    segs_b = sorted(s["segment_id"] for s in Manifest.load(dir_b).segments())
    assert segs_a == segs_b
    for sid in segs_a:
        for fname in ("postings.parquet", "termdict.parquet", "docs.parquet"):
            pa_ = open(os.path.join(dir_a, "segments", sid, fname), "rb").read()
            pb_ = open(os.path.join(dir_b, "segments", sid, fname), "rb").read()
            assert pa_ == pb_


def test_merge_preserves_docs_and_rank_identity(many_segments, tmp_path):
    pdf, cfg = many_segments
    dir_m = str(tmp_path / "m2")
    shutil.copytree(cfg.index_dir, dir_m)
    run_merges(dir_m, policy=_small_policy())
    manifest = Manifest.load(dir_m)
    segs = manifest.segments()
    assert sum(s["num_docs"] for s in segs) == N_DOCS
    assert all(s["num_merge_ops"] >= 1 for s in segs
               if s["parents"])

    # rank identity vs oracle on the MERGED layout
    key = pdf.set_index(["repo", "path", "commit"])
    oseg = []
    for seg in sorted(segs, key=lambda s: s["segment_id"]):
        seg_dir = os.path.join(dir_m, "segments", seg["segment_id"])
        docs_t = pq.read_table(os.path.join(seg_dir, "docs.parquet")
                               ).to_pandas()
        docs = []
        for r in docs_t.itertuples():
            src = key.loc[(r.repo, r.path, r.commit)]
            docs.append({"repo": r.repo, "path": r.path, "commit": r.commit,
                         "lang": r.lang, "content": src["content"]})
        oseg.append(OracleSegment(seg["segment_id"], docs, "content",
                                  "source_code_default"))
    oracle = OracleEngine(oseg)
    searcher = IndexSearcher(dir_m)
    for q in [A.FullText("content", "merge"),
              A.Bool(must=(A.Term("content", "query"),
                           A.Term("content", "index"))),
              A.Bool(should=(A.Term("content", "fetch"),
                             A.Term("content", "codec")))]:
        want_hits, want = oracle.search(q, k=25)
        res = searcher.search(q, k=25, fetch_fields=False)
        got = [(float(np.float32(h.score)), h.segment_id, h.doc_id)
               for h in res.hits]
        assert res.num_hits == want_hits
        assert got == [(float(np.float32(s)), sid, d) for s, sid, d in want]


def test_merge_then_vacuum(many_segments, tmp_path):
    pdf, cfg = many_segments
    dir_v = str(tmp_path / "v")
    shutil.copytree(cfg.index_dir, dir_v)
    run_merges(dir_v, policy=_small_policy())
    manifest = Manifest.load(dir_v)
    dead = manifest.vacuum()
    assert len(dead) >= 10
    live = {s["segment_id"] for s in manifest.segments()}
    on_disk = set(os.listdir(os.path.join(dir_v, "segments")))
    assert live <= on_disk
    assert not (set(dead) & on_disk)
    # index still searchable
    s = IndexSearcher(dir_v)
    assert s.count("*") == N_DOCS


def test_merge_spark_path(spark, many_segments, tmp_path):
    pdf, cfg = many_segments
    dir_s = str(tmp_path / "s")
    dir_l = str(tmp_path / "l")
    shutil.copytree(cfg.index_dir, dir_s)
    shutil.copytree(cfg.index_dir, dir_l)
    # force >1 op so the spark path engages: smaller max factor
    pol = StableLogMergePolicy(MergePolicyConfig(
        merge_factor=4, max_merge_factor=5, min_level_num_docs=10,
        split_num_docs_target=1_000_000))
    run_merges(dir_s, spark=spark, policy=pol)
    run_merges(dir_l, policy=pol)
    a = sorted(s["segment_id"] for s in Manifest.load(dir_s).segments())
    b = sorted(s["segment_id"] for s in Manifest.load(dir_l).segments())
    assert a == b


def test_merge_wave_packing():
    """Greedy wave packing bounds docs in flight; an over-budget op
    still runs (alone)."""
    from quickwit_spark.index.merge import MergeOperation, _merge_waves

    def op(n):
        return MergeOperation(segments=[{"num_docs": n,
                                         "segment_id": f"s{n}"}])

    ops = [op(900), op(800), op(300), op(200), op(100)]
    waves = _merge_waves(ops, 1000)
    # every wave under budget except singleton over-budget ops
    for w in waves:
        total = sum(s["num_docs"] for o in w for s in o.segments)
        assert total <= 1000 or len(w) == 1
    # all ops scheduled exactly once
    flat = sorted(s["segment_id"] for w in waves for o in w
                  for s in o.segments)
    assert flat == sorted(s["segment_id"] for o in ops
                          for s in o.segments)
    # None = one wave (unchanged default)
    assert _merge_waves(ops, None) == [ops]
    # over-budget op runs alone
    assert any(len(w) == 1 and w[0].segments[0]["num_docs"] == 900
               for w in _merge_waves(ops, 100))


def test_run_merges_multi_wave_equivalent(tmp_path, spark):
    """Wave-bounded merge produces the same final layout as unbounded
    (content-addressed ids make this byte-checkable)."""
    from quickwit_spark.config import IndexConfig, MergePolicyConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.index.corpus import corpus_pandas
    from quickwit_spark.index.manifest import Manifest
    from quickwit_spark.index.merge import (StableLogMergePolicy,
                                            run_merges)
    pol = StableLogMergePolicy(MergePolicyConfig(
        merge_factor=4, max_merge_factor=4, min_level_num_docs=1_000_000))
    pdf = corpus_pandas(4000, seed=11)
    layouts = []
    for sub, budget in (("a", None), ("b", 600)):
        cfg = IndexConfig(index_uid="wv", index_dir=str(tmp_path / sub))
        build_index_pandas(pdf, cfg, num_partitions=16)
        run_merges(cfg.index_dir, spark=spark, policy=pol,
                   max_docs_in_flight=budget)
        layouts.append(sorted(
            s["segment_id"]
            for s in Manifest.load(cfg.index_dir).segments()))
    assert layouts[0] == layouts[1]
    assert len(layouts[0]) < 16


def test_batch_flat_equals_rounds_bytes(tmp_path):
    """Transitive batch planning (each doc rewritten ONCE, straight to
    its final segment) must produce byte-identical postings/termdict/
    docs content to the reference-shaped level-by-level rounds — a
    splice of a splice is the same concatenation. Only lineage metadata
    (segment ids, parents, num_merge_ops) may differ."""
    import hashlib

    pdf = corpus_pandas(960, seed=5)

    def pol():
        return StableLogMergePolicy(MergePolicyConfig(
            merge_factor=3, max_merge_factor=3, min_level_num_docs=10,
            split_num_docs_target=1_000_000))

    hashes, nops = {}, {}
    for sub, batch in (("rounds", False), ("flat", True)):
        cfg = IndexConfig(index_uid="bf", index_dir=str(tmp_path / sub))
        build_index_pandas(pdf, cfg, num_partitions=27)
        nops[sub] = run_merges(cfg.index_dir, policy=pol(), batch=batch)
        segs = Manifest.load(cfg.index_dir).segments()
        assert sum(s["num_docs"] for s in segs) == 960
        tr = []
        for s in segs:
            d = os.path.join(cfg.index_dir, "segments", s["segment_id"])
            tr.append(tuple(
                hashlib.sha256(
                    open(os.path.join(d, f), "rb").read()).hexdigest()
                for f in ("postings.parquet", "termdict.parquet",
                          "docs.parquet")))
        hashes[sub] = sorted(tr)
    assert hashes["rounds"] == hashes["flat"]
    # flat mode must actually skip the intermediate levels
    assert nops["flat"] < nops["rounds"]
    assert nops["flat"] >= 1


def test_merge_of_all_empty_parents(tmp_path):
    """A merge group where EVERY parent is a valid zero-postings segment
    (all-blank text; StableLog groups by num_docs so they can land
    together) must produce the empty merged child, not crash the whole
    merge round in the splice arithmetic."""
    import pandas as pd

    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.index.manifest import Manifest
    from quickwit_spark.index.merge import merge_segments
    from quickwit_spark.search.engine import IndexSearcher

    docs = [{"repo": "r", "path": f"f{i}.py", "commit": "c",
             "lang": "py", "content": "   "} for i in range(8)]
    cfg = IndexConfig(index_uid="mt", index_dir=str(tmp_path / "mt"),
                      sha_col=None)
    build_index_pandas(pd.DataFrame(docs), cfg, num_partitions=2)
    m = Manifest.load(cfg.index_dir)
    parents = m.segments()
    assert len(parents) == 2
    child = merge_segments(cfg.index_dir, parents)
    assert child["num_docs"] == 8
    m.publish([child], replaced_segment_ids=[
        p["segment_id"] for p in parents])
    s = IndexSearcher(cfg.index_dir)
    assert s.count("*") == 8
    assert s.count("content:anything") == 0


def test_delete_query_on_blank_text_segment(tmp_path):
    """apply_delete_query with a non-text filter over a zero-postings
    segment: rewrite_segment_without must decode the empty posting set
    without the fabricated-term_starts IndexError."""
    import pandas as pd

    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.index.deletes import apply_delete_query
    from quickwit_spark.search import ast as A
    from quickwit_spark.search.engine import IndexSearcher

    docs = [{"repo": "r", "path": f"f{i}.py", "commit": "c",
             "lang": ["py", "go"][i % 2], "content": ""}
            for i in range(6)]
    cfg = IndexConfig(index_uid="dt", index_dir=str(tmp_path / "dt"),
                      sha_col=None)
    build_index_pandas(pd.DataFrame(docs), cfg, num_partitions=1)
    stats = apply_delete_query(cfg.index_dir, A.Term("lang", "go"))
    assert stats["docs_deleted"] == 3
    s = IndexSearcher(cfg.index_dir)
    assert s.count("*") == 3


def test_positional_delete_leaves_queryable_empty_postings(tmp_path):
    """record='position' variant: deleting every doc that carries text
    leaves a positional segment with zero postings but surviving docs —
    it must stay phrase-queryable (empty pos_blob column present)."""
    import pandas as pd

    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.index.deletes import apply_delete_query
    from quickwit_spark.search import ast as A
    from quickwit_spark.search.engine import IndexSearcher

    docs = [{"repo": "r", "path": f"f{i}.py", "commit": "c",
             "lang": ["py", "go"][i % 2],
             "content": "alpha beta" if i % 2 else ""}
            for i in range(6)]
    cfg = IndexConfig(index_uid="pd", index_dir=str(tmp_path / "pd"),
                      sha_col=None, record="position")
    build_index_pandas(pd.DataFrame(docs), cfg, num_partitions=1)
    stats = apply_delete_query(cfg.index_dir, A.Term("lang", "go"))
    assert stats["docs_deleted"] == 3
    s = IndexSearcher(cfg.index_dir)
    assert s.count("*") == 3  # blank-text survivors kept
    res = s.search(A.Phrase("content", "alpha beta"), k=5,
                   fetch_fields=False)
    assert res.num_hits == 0  # and phrase search doesn't crash
