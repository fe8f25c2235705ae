"""Pure-Python scalar oracle engine (FIXTURES.md F4/F5).

Independent scalar reimplementation of tokenize->index->BM25->top-k used to
verify the Spark engine is rank-identical (scores compared as f32 values,
ties broken by the global doc address in sort direction). Shares only the
f32 BM25 formula constants and the fieldnorm quantization table with the
engine (both pinned by golden tests); everything else is dicts + loops.
"""

from __future__ import annotations

import numpy as np

from quickwit_spark.functions.bm25 import (
    B,
    K1,
    fieldnorm_to_id,
    id_to_fieldnorm,
    idf_f32,
)
from quickwit_spark.functions.tokenizers import (
    ascii_fold,
    code_tokenize,
    tokenize_one,
)
from quickwit_spark.search import ast as A

f32 = np.float32


def scalar_analyze(text: str, analyzer: str) -> list[str]:
    if analyzer == "source_code_default":
        return [ascii_fold(t.lower()) for t in code_tokenize(text)
                if len(t) <= 255]
    if analyzer == "source_code_with_hex":
        return [ascii_fold(t.lower())
                for t in code_tokenize(text, hex_support=True)
                if len(t) <= 255]
    # fall back to the engine's own query tokenizer for other analyzers
    return tokenize_one(text, analyzer=analyzer)


class OracleSegment:
    def __init__(self, segment_id: str, docs: list[dict], text_field: str,
                 analyzer: str, record: str = "freq",
                 fieldnorms: bool = True):
        self.segment_id = segment_id
        self.docs = docs
        self.text_field = text_field
        self.analyzer = analyzer
        self.record = record
        self.n = len(docs)
        self.postings: dict[str, dict[int, int]] = {}
        self.fieldnorm_id: list[int] = []
        for doc_id, doc in enumerate(docs):
            toks = scalar_analyze(doc[text_field], analyzer)
            ln = len(toks) if fieldnorms else 1
            self.fieldnorm_id.append(
                int(fieldnorm_to_id(np.array([ln]))[0]))
            for t in toks:
                self.postings.setdefault(t, {}).setdefault(doc_id, 0)
                self.postings[t][doc_id] += 1
        total_fn = sum(int(id_to_fieldnorm(np.array([i]))[0])
                       for i in self.fieldnorm_id)
        self.avg = f32(f32(total_fn) / f32(self.n)) if self.n else f32(0)

    # -- scoring -------------------------------------------------------------

    def _score_term_text(self, term: str) -> dict[int, np.float32]:
        plist = self.postings.get(term, {})
        if not plist:
            return {}
        df = len(plist)
        idf = idf_f32(df, self.n)
        weight = f32(idf * (K1 + f32(1.0)))
        out = {}
        for doc_id, tf in plist.items():
            if self.record == "basic":
                tf = 1
            ln = f32(int(id_to_fieldnorm(
                np.array([self.fieldnorm_id[doc_id]]))[0]))
            norm = f32(K1 * (f32(1.0) - B + B * ln / self.avg))
            out[doc_id] = f32(weight * f32(f32(tf) / f32(f32(tf) + norm)))
        return out

    def eval(self, node: A.Node, scoring: bool = True) -> dict[int, np.float32]:
        if isinstance(node, A.MatchAll):
            return {d: f32(1.0) for d in range(self.n)}
        if isinstance(node, A.MatchNone):
            return {}
        if isinstance(node, A.Boost):
            return {d: f32(s * f32(node.boost))
                    for d, s in self.eval(node.inner, scoring).items()}
        if isinstance(node, A.FullText):
            if node.field == self.text_field:
                toks = scalar_analyze(node.text, self.analyzer)
            else:
                toks = [node.text]
            if not toks:
                return {}
            terms = [A.Term(node.field, t) for t in toks]
            if len(terms) == 1:
                return self.eval(terms[0], scoring)
            if node.operator == "and":
                return self.eval(A.Bool(must=tuple(terms)), scoring)
            return self.eval(A.Bool(should=tuple(terms)), scoring)
        if isinstance(node, A.Term):
            if node.field == self.text_field:
                return self._score_term_text(node.value)
            out = {}
            matches = [d for d in range(self.n)
                       if str(self.docs[d].get(node.field)) == node.value]
            idf = idf_f32(len(matches), self.n) if matches else f32(0)
            for d in matches:
                out[d] = idf
            return out
        if isinstance(node, A.TermSet):
            out = {}
            for d in range(self.n):
                if node.field == self.text_field:
                    if any(d in self.postings.get(v, {}) for v in node.values):
                        out[d] = f32(1.0)
                elif str(self.docs[d].get(node.field)) in node.values:
                    out[d] = f32(1.0)
            return out
        if isinstance(node, A.Range):
            out = {}
            for d in range(self.n):
                v = self.docs[d].get(node.field)
                if v is None:
                    continue
                ok = True
                if node.gte is not None:
                    ok &= v >= type(v)(node.gte)
                if node.gt is not None:
                    ok &= v > type(v)(node.gt)
                if node.lte is not None:
                    ok &= v <= type(v)(node.lte)
                if node.lt is not None:
                    ok &= v < type(v)(node.lt)
                if ok:
                    out[d] = f32(1.0)
            return out
        if isinstance(node, A.Bool):
            return self._eval_bool(node, scoring)
        raise TypeError(node)

    def _eval_bool(self, node: A.Bool, scoring: bool) -> dict[int, np.float32]:
        result: dict[int, np.float32] | None = None
        if not node.must and not node.filter and not node.should:
            # positive-less bool: implicit match-all, minus must_not
            # (tantivy_query_ast.rs:310-321) — mirrors the engine
            if (node.minimum_should_match or 0) > 0:
                return {}
            result = {d: f32(1.0) for d in range(self.n)}
        for clause in node.must:
            s = self.eval(clause, scoring)
            if result is None:
                result = dict(s)
            else:
                result = {d: f32(result[d] + s[d])
                          for d in result if d in s}
        for clause in node.filter:
            s = self.eval(clause, False)
            if result is None:
                result = {d: f32(0.0) for d in s}
            else:
                result = {d: v for d, v in result.items() if d in s}
        if node.should:
            msm = node.minimum_should_match
            if result is None:
                counts: dict[int, int] = {}
                sums: dict[int, np.float32] = {}
                for clause in node.should:
                    s = self.eval(clause, scoring)
                    for d, v in s.items():
                        counts[d] = counts.get(d, 0) + 1
                        sums[d] = f32(sums.get(d, f32(0.0)) + v)
                result = {d: sums[d] for d in sums
                          if counts[d] >= (msm if msm is not None else 1)}
            else:
                counts = {}
                for clause in node.should:
                    s = self.eval(clause, scoring)
                    for d in list(result):
                        if d in s:
                            result[d] = f32(result[d] + s[d])
                            counts[d] = counts.get(d, 0) + 1
                if msm is not None and msm > 0:
                    result = {d: v for d, v in result.items()
                              if counts.get(d, 0) >= msm}
        if result is None:
            return {}
        for clause in node.must_not:
            s = self.eval(clause, False)
            result = {d: v for d, v in result.items() if d not in s}
        return result


class OracleEngine:
    """Multi-segment oracle with the engine's merge + tie-break rules."""

    def __init__(self, segments: list[OracleSegment]):
        self.segments = segments

    def search(self, node: A.Node, k: int = 10):
        rows = []
        num_hits = 0
        for seg in self.segments:
            scores = seg.eval(node, scoring=True)
            num_hits += len(scores)
            for d, s in scores.items():
                rows.append((float(s), seg.segment_id, d))
        # score desc, then (segment_id, doc_id) desc
        rows.sort(key=lambda r: (-r[0], _neg_str(r[1]), -r[2]))
        return num_hits, rows[:k]


class _neg_str(str):
    """Reverse-ordering wrapper for descending string sort keys."""
    def __lt__(self, other):
        return str.__gt__(self, other)
    def __gt__(self, other):
        return str.__lt__(self, other)
