"""Elasticsearch-compatible query DSL -> QueryAst.

Mirrors the reference's ES front-end (quickwit-query/src/elastic_query_dsl/
mod.rs:73-88): query_string, bool, term, terms, match_all, match_none,
match, match_bool_prefix, match_phrase, multi_match, range, exists,
regexp, wildcard — all converted onto the same AST the native path uses
(SURVEY.md §3.2: only the front-end differs; the engine path is identical).
"""

from __future__ import annotations

from typing import Any

from . import ast as A
from .parser import parse_query


def es_to_ast(body: dict[str, Any], default_field: str = "content") -> A.Node:
    if not isinstance(body, dict) or len(body) != 1:
        raise ValueError("ES query object must have exactly one key")
    kind, spec = next(iter(body.items()))
    if kind == "match_all":
        return A.MatchAll()
    if kind == "match_none":
        return A.MatchNone()
    if kind == "query_string":
        return parse_query(
            spec["query"],
            default_field=spec.get("default_field", default_field),
            default_operator=spec.get("default_operator", "and").lower())
    if kind == "term":
        field, v = next(iter(spec.items()))
        value = v["value"] if isinstance(v, dict) else v
        node: A.Node = A.Term(field, str(value))
        if isinstance(v, dict) and "boost" in v:
            node = A.Boost(node, float(v["boost"]))
        return node
    if kind == "terms":
        field, values = next(iter(spec.items()))
        return A.TermSet(field, tuple(str(x) for x in values))
    if kind in ("match", "match_bool_prefix"):
        field, v = next(iter(spec.items()))
        if isinstance(v, dict):
            return A.FullText(field, str(v["query"]),
                              operator=v.get("operator", "or").lower())
        return A.FullText(field, str(v), operator="or")
    if kind == "match_phrase":
        field, v = next(iter(spec.items()))
        text = v["query"] if isinstance(v, dict) else v
        slop = int(v.get("slop", 0)) if isinstance(v, dict) else 0
        # positional phrase; freq-only indexes fall back to intersection
        # (the reference's PhraseFallbackToIntersection mode)
        return A.Phrase(field, str(text), slop=slop)
    if kind == "match_phrase_prefix":
        field, v = next(iter(spec.items()))
        text = v["query"] if isinstance(v, dict) else v
        maxe = int(v.get("max_expansions", 50)) if isinstance(v, dict) else 50
        return A.PhrasePrefix(field, str(text), max_expansions=maxe)
    if kind == "multi_match":
        fields = spec.get("fields") or [default_field]
        text = str(spec["query"])
        op = spec.get("operator", "or").lower()
        parts = tuple(A.FullText(f, text, operator=op) for f in fields)
        return parts[0] if len(parts) == 1 else A.Bool(should=parts)
    if kind == "range":
        field, v = next(iter(spec.items()))
        return A.Range(field, gte=v.get("gte"), gt=v.get("gt"),
                       lte=v.get("lte"), lt=v.get("lt"))
    if kind == "exists":
        return A.FieldPresence(spec["field"])
    if kind == "regexp":
        field, v = next(iter(spec.items()))
        pat = v["value"] if isinstance(v, dict) else v
        return A.Regex(field, str(pat))
    if kind == "wildcard":
        field, v = next(iter(spec.items()))
        pat = v["value"] if isinstance(v, dict) else v
        return A.Wildcard(field, str(pat))
    if kind == "bool":
        def _many(key):
            items = spec.get(key, [])
            if isinstance(items, dict):
                items = [items]
            return tuple(es_to_ast(i, default_field) for i in items)
        return A.Bool(
            must=_many("must"),
            must_not=_many("must_not"),
            should=_many("should"),
            filter=_many("filter"),
            minimum_should_match=(
                int(spec["minimum_should_match"])
                if "minimum_should_match" in spec else None))
    raise ValueError(f"unsupported ES query kind: {kind}")


def es_search(searcher, body: dict, default_field: str | None = None
              ) -> dict:
    """Execute an ES `_search`-shaped request body and return an
    ES-shaped response (reference: quickwit-serve elasticsearch_api
    rest_handler.rs:502+ — body -> QueryAst -> same engine path ->
    response reshaped). Supports query, size, from, sort (fast fields /
    _score / _doc), and aggs (one spec level via search/aggregations)."""
    import time as _time

    t0 = _time.perf_counter()
    node = es_to_ast(body.get("query", {"match_all": {}}),
                     default_field or searcher.text_field)
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    sort_spec = body.get("sort")
    if sort_spec:
        sort_by = []
        for s in sort_spec[:2]:
            if isinstance(s, str):
                sort_by.append((s, "asc" if s != "_score" else "desc"))
            else:
                (f, v), = s.items()
                order = v.get("order", "desc") if isinstance(v, dict) \
                    else str(v)
                sort_by.append((f, order))
        res = searcher.sort_search(node, k=offset + size,
                                   sort_by=tuple(sort_by))
        hits = res.hits[offset:offset + size]
    else:
        res = searcher.search(node, k=size, offset=offset)
        hits = res.hits
    out_hits = []
    for h in hits:
        src = {k: v for k, v in h.doc.items()
               if not k.startswith("_") and k not in ("fieldnorm",
                                                      "fieldnorm_id")}
        out_hits.append({
            "_id": f"{h.segment_id}:{h.doc_id}",
            "_score": None if sort_spec else float(h.score),
            "_source": src,
        })
    resp = {
        "took": int((_time.perf_counter() - t0) * 1000),
        "timed_out": False,
        "hits": {
            "total": {"value": res.num_hits, "relation": "eq"},
            "max_score": (float(res.hits[0].score)
                          if res.hits and not sort_spec else None),
            "hits": out_hits,
        },
    }
    if body.get("aggs"):
        from .aggregations import aggregate
        out = aggregate(searcher, node, body["aggs"])
        pdf = out.toPandas() if hasattr(out, "toPandas") else out
        resp["aggregations"] = pdf.to_dict("records")
    return resp


def es_msearch(searcher, lines: list[dict],
               default_field: str | None = None,
               headers: bool = True) -> dict:
    """ES `_msearch`: strict NDJSON alternation — every even line is a
    header (may be `{}`; single-index engine ignores it), every odd line a
    body (rest_handler.rs:806+). headers=False accepts bodies only; the
    framing is explicit, never guessed from a body's keys (a body without
    query/aggs/size is still a body)."""
    if headers:
        if len(lines) % 2 != 0:
            raise ValueError(
                "_msearch expects alternating header/body lines; got an "
                "odd count (pass headers=False for body-only input)")
        bodies = lines[1::2]
    else:
        bodies = list(lines)
    responses = [es_search(searcher, body, default_field)
                 for body in bodies]
    return {"responses": responses}
