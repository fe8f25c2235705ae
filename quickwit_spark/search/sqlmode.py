"""SQL-comparable BM25 scoring (float64, no f32 rounding).

The engine's production scorer is f32 for rank-identity with the reference
(functions/bm25.py). For the driver's DuckDB-oracle correctness gate we
also expose an f64 scoring path computing the SAME formula over the SAME
quantized fieldnorms — an ANSI-SQL statement (see __spark_entry__.py) can
reproduce it exactly, so row hashes match after rounding.

    idf   = ln(1 + (N - df + 0.5)/(df + 0.5))
    score = idf * (k1+1) * tf / (tf + k1*(1 - b + b*qlen/avg))
    qlen  = FIELD_NORMS_TABLE[fieldnorm_id]   (quantized length)
    avg   = total_quantized_fieldnorm / N
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from ..functions.bm25 import FIELD_NORMS_TABLE, id_to_fieldnorm
from ..functions.bm25 import B_F64 as B
from ..functions.bm25 import K1_F64 as K1
from .engine import SegmentReader


def fieldnorm_sql_table() -> str:
    """The quantization table as an inline SQL VALUES relation."""
    rows = ",".join(f"({int(v)})" for v in np.unique(FIELD_NORMS_TABLE))
    return f"(VALUES {rows}) fnt(flen)"


def term_scores_f64(reader: SegmentReader, term: str) -> dict[int, float]:
    docids, tfs, df = reader.term_postings(term)
    if df == 0:
        return {}
    n = reader.num_docs
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    qlen = id_to_fieldnorm(reader.fieldnorm_ids()).astype(np.float64)
    avg = float(reader.meta["total_fieldnorm"]) / float(n)
    tf = tfs.astype(np.float64)
    norm = K1 * (1.0 - B + B * qlen[docids] / avg)
    scores = idf * (K1 + 1.0) * tf / (tf + norm)
    return dict(zip(docids.tolist(), scores.tolist()))


def bool_scores_f64(reader: SegmentReader, terms: list[str],
                    operator: str = "and",
                    filter_docids: np.ndarray | None = None,
                    must_not_terms: list[str] | None = None,
                    boosts: list[float] | None = None
                    ) -> dict[int, float]:
    """boosts: optional per-term multipliers (the reference's `term^2`
    boost, query_ast/mod.rs:207-218) applied to that term's BM25
    contribution before the bool sum — f64 twin of engine.py's
    A.Boost handling."""
    per_term = [term_scores_f64(reader, t) for t in terms]
    if boosts is not None:
        if len(boosts) != len(terms):
            # zip would silently TRUNCATE per_term, changing which docs
            # match (not just their weights) — the oracle twin must fail
            # loudly instead of producing wrong f64 reference scores
            raise ValueError(
                f"boosts length {len(boosts)} != terms length {len(terms)}")
        per_term = [{d: s * b for d, s in scores.items()}
                    for scores, b in zip(per_term, boosts)]
    if operator == "and":
        docs = set(per_term[0]) if per_term else set()
        for s in per_term[1:]:
            docs &= set(s)
    else:
        docs = set()
        for s in per_term:
            docs |= set(s)
    if filter_docids is not None:
        docs &= set(int(d) for d in filter_docids)
    for t in must_not_terms or []:
        docs -= set(term_scores_f64(reader, t))
    return {d: sum(s[d] for s in per_term if d in s) for d in docs}


def distributed_bool_topk_f64(searcher, terms: list[str],
                              operator: str = "and", k: int = 20,
                              doc_id_col: str = "doc_id",
                              ndigits: int = 6) -> pd.DataFrame:
    """Two-phase distributed BM25 over a multi-segment index with GLOBAL
    corpus statistics, every phase a mapInPandas fan-out over segments:

      phase 1 (stats): leaves report each query term's per-segment doc
        freq (the DFS-query-then-fetch stats pass; num_docs and
        total_fieldnorm come from manifest metadata, no file reads);
      phase 2 (score): leaves score their postings f64 with the
        broadcast global weights and return per-segment top-k; the root
        merges by (score desc, external doc id desc).

    Global stats == whole-corpus stats, so the same DuckDB oracle SQL
    that checks the single-segment harness applies unchanged.

    NOT the production leaf: inside score_leaf, docids/scores go through
    Python dicts and sorted() so the arithmetic is transparently
    oracle-matchable in f64. The real query path is the vectorized f32
    engine — IndexSearcher.search -> segment_top_k (engine.py) with
    block-max WAND — which this harness exists to cross-check, not to
    replace."""
    from .engine import get_reader
    spark = searcher.spark
    assert spark is not None, "needs IndexSearcher(dir, spark=spark)"
    segs = searcher.manifest.segments()
    index_dir, tokenizer = searcher.index_dir, searcher.tokenizer
    n_total = sum(int(s["num_docs"]) for s in segs)
    total_fn = sum(int(s["total_fieldnorm"]) for s in segs)
    avg = float(total_fn) / float(n_total)
    seg_df = spark.createDataFrame([(s["segment_id"],) for s in segs],
                                   "segment_id string"
                                   ).repartition(len(segs))
    tlist = list(terms)

    def stats_leaf(it):
        for pdf in it:
            rows = []
            for sid in pdf["segment_id"].tolist():
                r = get_reader(os.path.join(index_dir, "segments", sid),
                               tokenizer)
                for t in tlist:
                    tr = r._term_row(t)
                    rows.append((t, int(tr[1]) if tr else 0))
            yield pd.DataFrame(rows, columns=["term", "df"])

    stats = (seg_df.mapInPandas(stats_leaf, "term string, df long")
             .groupBy("term").agg({"df": "sum"}).collect())
    global_df = {r["term"]: int(r["sum(df)"]) for r in stats}
    idf = {t: math.log(1.0 + (n_total - global_df.get(t, 0) + 0.5)
                       / (global_df.get(t, 0) + 0.5)) for t in tlist}

    def score_leaf(it):
        for pdf in it:
            for sid in pdf["segment_id"].tolist():
                r = get_reader(os.path.join(index_dir, "segments", sid),
                               tokenizer)
                qlen = id_to_fieldnorm(r.fieldnorm_ids()
                                       ).astype(np.float64)
                per_term = {}
                for t in tlist:
                    docids, tfs, df = r.term_postings(t)
                    if df == 0:
                        per_term[t] = {}
                        continue
                    tf = tfs.astype(np.float64)
                    norm = K1 * (1.0 - B + B * qlen[docids] / avg)
                    sc = idf[t] * (K1 + 1.0) * tf / (tf + norm)
                    per_term[t] = dict(zip(docids.tolist(), sc.tolist()))
                if operator == "and":
                    docs = set(per_term[tlist[0]]) if tlist else set()
                    for t in tlist[1:]:
                        docs &= set(per_term[t])
                else:
                    docs = set()
                    for t in tlist:
                        docs |= set(per_term[t])
                ext = r.doc_column(doc_id_col)
                # sort by the ROUNDED score like the oracle SQL
                # (ORDER BY round(score, 6) DESC, doc_id DESC): raw-f64
                # ordering diverges at the k boundary for scores that
                # tie only after rounding
                rows = sorted(
                    ((sum(per_term[t][d] for t in tlist
                          if d in per_term[t]), int(ext[d]))
                     for d in docs),
                    key=lambda x: (-round(x[0], 6), -x[1]))[:k]
                yield pd.DataFrame(
                    {"doc_id": [r2[1] for r2 in rows],
                     "score": [r2[0] for r2 in rows]})

    cand = seg_df.mapInPandas(score_leaf,
                              "doc_id long, score double").toPandas()
    cand = cand.assign(score=cand["score"].round(ndigits))
    cand = cand.sort_values(["score", "doc_id"],
                            ascending=[False, False]).head(k)
    return pd.DataFrame({
        "doc_id": cand["doc_id"].astype("int64").to_numpy(),
        "score": cand["score"].to_numpy()})


def topk_df(scores: dict[int, float], doc_id_map: np.ndarray, k: int,
            ndigits: int = 6) -> pd.DataFrame:
    """Top-k by (ROUNDED score desc, external doc id desc) — the exact
    key the oracle SQL orders by; sorting raw f64 first would pick a
    different k-boundary row whenever two scores tie only after
    rounding."""
    rows = sorted(((round(float(s), ndigits), int(doc_id_map[d]))
                   for d, s in scores.items()),
                  key=lambda r: (-r[0], -r[1]))[:k]
    return pd.DataFrame({
        "doc_id": [r[1] for r in rows],
        "score": [r[0] for r in rows],
    })
