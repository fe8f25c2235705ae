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
                    must_not_terms: list[str] | None = None
                    ) -> dict[int, float]:
    per_term = [term_scores_f64(reader, t) for t in terms]
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


def topk_df(scores: dict[int, float], doc_id_map: np.ndarray, k: int,
            ndigits: int = 6) -> pd.DataFrame:
    """Top-k by (score desc, external doc id desc), score rounded."""
    rows = sorted(((float(s), int(doc_id_map[d])) for d, s in scores.items()),
                  key=lambda r: (-r[0], -r[1]))[:k]
    return pd.DataFrame({
        "doc_id": [r[1] for r in rows],
        "score": [round(r[0], ndigits) for r in rows],
    })
