"""u64 fast-field semantics beyond i64::MAX (the reference pins sorting
such values, quickwit-search/src/tests.rs:743): storage, sort order,
range queries, and segment pruning must stay exact."""

import numpy as np
import pandas as pd

from quickwit_spark.config import IndexConfig
from quickwit_spark.index.builder import build_index_pandas
from quickwit_spark.search import ast as A
from quickwit_spark.search.engine import IndexSearcher

BIG = 2 ** 63


def _mk(tmp_path):
    vals = np.array([BIG + 5, 3, BIG + 1, 10, BIG + 9, 0],
                    dtype=np.uint64)
    pdf = pd.DataFrame({
        "repo": [f"r{i}" for i in range(6)],
        "path": [f"p{i}" for i in range(6)],
        "commit": ["c"] * 6, "lang": ["python"] * 6,
        "content": ["alpha beta"] * 6,
        "u64col": vals,
    })
    cfg = IndexConfig(index_uid="u", index_dir=str(tmp_path / "i"),
                      sha_col=None, store_cols=("u64col",))
    build_index_pandas(pdf, cfg, num_partitions=2)
    return cfg, vals


def test_u64_sort_and_range(tmp_path):
    cfg, vals = _mk(tmp_path)
    s = IndexSearcher(cfg.index_dir)
    res = s.sort_search(A.MatchAll(), k=6, sort_by=(("u64col", "desc"),))
    got = [int(h.doc["u64col"]) for h in res.hits]
    assert got == sorted((int(v) for v in vals), reverse=True)
    # range query across the i64 boundary stays exact
    r = s.search(A.Range("u64col", gte=BIG + 2), k=10, fetch_fields=True)
    assert sorted(int(h.doc["u64col"]) for h in r.hits) == [BIG + 5, BIG + 9]
    # pruning with int-exact per-segment stats never drops a live segment
    plan = s.explain(A.Range("u64col", gte=BIG + 2))
    kept_docs = plan["docs_to_consider"]
    assert r.num_hits == 2 and kept_docs >= 2
