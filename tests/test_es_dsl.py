"""ES-compatible DSL conversion + snippet generation tests."""

from quickwit_spark.search import ast as A
from quickwit_spark.search.es_dsl import es_to_ast
from quickwit_spark.search.snippets import extract_query_terms, make_snippet


def test_term_and_terms():
    assert es_to_ast({"term": {"lang": {"value": "python"}}}) == \
        A.Term("lang", "python")
    assert es_to_ast({"terms": {"lang": ["a", "b"]}}) == \
        A.TermSet("lang", ("a", "b"))


def test_match_variants():
    assert es_to_ast({"match": {"content": "quick sort"}}) == \
        A.FullText("content", "quick sort", operator="or")
    assert es_to_ast({"match": {"content": {
        "query": "quick sort", "operator": "AND"}}}) == \
        A.FullText("content", "quick sort", operator="and")
    assert es_to_ast({"match_phrase": {"content": "quick sort"}}) == \
        A.Phrase("content", "quick sort")
    assert es_to_ast({"match_phrase": {"content": {
        "query": "quick sort", "slop": 1}}}) == \
        A.Phrase("content", "quick sort", slop=1)
    assert es_to_ast({"match_phrase_prefix": {"content": "quick so"}}) == \
        A.PhrasePrefix("content", "quick so")


def test_bool_nested():
    node = es_to_ast({"bool": {
        "must": [{"match": {"content": "a"}}],
        "must_not": {"term": {"lang": "md"}},
        "filter": [{"range": {"n_chars": {"gte": 10, "lt": 50}}}],
    }})
    assert node == A.Bool(
        must=(A.FullText("content", "a", operator="or"),),
        must_not=(A.Term("lang", "md"),),
        filter=(A.Range("n_chars", gte=10, lt=50),))


def test_query_string_and_misc():
    assert es_to_ast({"query_string": {
        "query": "a AND b", "default_field": "content"}}) == \
        A.Bool(must=(A.FullText("content", "a"),
                     A.FullText("content", "b")))
    assert es_to_ast({"exists": {"field": "lang"}}) == A.FieldPresence("lang")
    assert es_to_ast({"wildcard": {"content": {"value": "me*ge"}}}) == \
        A.Wildcard("content", "me*ge")
    assert es_to_ast({"match_all": {}}) == A.MatchAll()


def test_snippets():
    node = A.Bool(must=(A.Term("content", "merge"),
                        A.FullText("content", "batch split")))
    terms = extract_query_terms(node)
    assert set(terms) == {"merge", "batch", "split"}
    text = "x " * 50 + "the MERGE of batch parts " + "y " * 50
    s = make_snippet(text, terms)
    assert "<b>MERGE</b>" in s and "<b>batch</b>" in s
    assert len(s) <= 150 + 3 * 7  # fragment cap + tag overhead
    assert make_snippet(text, ["absent"]) == ""


def test_es_search_response_shape(spark, tmp_path):
    import pandas as pd
    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.search.es_dsl import es_search
    pdf = pd.DataFrame({
        "repo": ["r"] * 4, "path": [f"f{i}" for i in range(4)],
        "commit": ["c"] * 4, "lang": ["go", "go", "rust", "rust"],
        "content": ["alpha beta", "alpha alpha", "beta gamma", "delta"],
        "stars": [5, 2, 9, 1],
    })
    cfg = IndexConfig(index_uid="es", index_dir=str(tmp_path / "es"),
                      sha_col=None, store_cols=("stars",),
                      tokenizer="default")
    build_index_pandas(pdf, cfg, num_partitions=1)
    s = IndexSearcher(cfg.index_dir, spark=spark)

    r = es_search(s, {"query": {"match": {"content": "alpha"}}, "size": 5})
    assert r["hits"]["total"] == {"value": 2, "relation": "eq"}
    assert r["hits"]["hits"][0]["_source"]["path"] == "f1"  # higher tf
    assert r["hits"]["max_score"] >= r["hits"]["hits"][1]["_score"]

    r2 = es_search(s, {"query": {"match_all": {}},
                       "sort": [{"stars": {"order": "desc"}}], "size": 2})
    assert [h["_source"]["stars"] for h in r2["hits"]["hits"]] == [9, 5]

    r3 = es_search(s, {"query": {"match_all": {}}, "size": 0,
                       "aggs": {"langs": {"terms": {"field": "lang"}}}})
    # the facade emits the ES NESTED aggregations document (buckets
    # arrays — the reference's wire shape)
    got = {b["key"]: b["doc_count"]
           for b in r3["aggregations"]["langs"]["buckets"]}
    assert got == {"go": 2, "rust": 2}

    # from/size paging
    all4 = es_search(s, {"query": {"match_all": {}}, "size": 4})
    page2 = es_search(s, {"query": {"match_all": {}}, "size": 2, "from": 2})
    assert [h["_id"] for h in page2["hits"]["hits"]] == \
        [h["_id"] for h in all4["hits"]["hits"][2:4]]


def test_explain_and_msearch(spark, tmp_path):
    import pandas as pd
    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.search.es_dsl import es_msearch
    pdf = pd.DataFrame({
        "repo": ["r"] * 4, "path": [f"f{i}" for i in range(4)],
        "commit": ["c"] * 4, "lang": ["go", "go", "rust", "rust"],
        "content": ["alpha beta", "alpha", "beta gamma", "delta"],
    })
    cfg = IndexConfig(index_uid="ex", index_dir=str(tmp_path / "ex"),
                      sha_col=None, partition_cols=("lang",),
                      tokenizer="default")
    build_index_pandas(pdf, cfg, num_partitions=8)
    s = IndexSearcher(cfg.index_dir)

    plan = s.explain("lang:rust beta")
    assert plan["segments_total"] == 2
    assert plan["segments_after_pruning"] == 1
    assert plan["tag_filters"] == [("lang", ["rust"])]
    assert plan["docs_to_consider"] == 2
    plan2 = s.explain("alpha OR beta")
    assert plan2["wand_prunable"] and \
        plan2["wand_shape"] == {"op": "or", "terms": ["alpha", "beta"]}

    r = es_msearch(s, [{}, {"query": {"match": {"content": "alpha"}}},
                       {}, {"query": {"match": {"content": "delta"}}}])
    assert len(r["responses"]) == 2
    assert r["responses"][0]["hits"]["total"]["value"] == 2
    assert r["responses"][1]["hits"]["total"]["value"] == 1


def test_es_search_highlight(spark, tmp_path):
    """ES highlight: fragments from stored fields around the query terms
    (fetch_docs.rs:263-352 snippet semantics via the ES response shape)."""
    import pandas as pd
    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.search.es_dsl import es_search
    pdf = pd.DataFrame({
        "repo": ["r"] * 3, "path": [f"f{i}" for i in range(3)],
        "commit": ["c"] * 3, "lang": ["go"] * 3,
        "content": ["alpha beta gamma", "alpha delta", "no match here"],
    })
    cfg = IndexConfig(index_uid="hl", index_dir=str(tmp_path / "hl"),
                      sha_col=None, store_cols=("content",),
                      tokenizer="default")
    build_index_pandas(pdf, cfg, num_partitions=1)
    s = IndexSearcher(cfg.index_dir)
    r = es_search(s, {"query": {"match": {"content": "alpha"}},
                      "highlight": {"fields": {"content": {}}}})
    hits = r["hits"]["hits"]
    assert len(hits) == 2
    for h in hits:
        assert "<b>alpha</b>" in h["highlight"]["content"][0]
    r2 = es_search(s, {"query": {"match": {"content": "alpha"}}})
    assert "highlight" not in r2["hits"]["hits"][0]


def test_minimum_should_match_forms():
    """ES msm grammar (bool_query.rs): integer, "<n>", "-<n>",
    "<p>%", "-<p>%" — resolved against the bool's own should count."""
    import pytest

    from quickwit_spark.search.es_dsl import parse_minimum_should_match
    assert parse_minimum_should_match(2, 4) == 2
    assert parse_minimum_should_match("3", 4) == 3
    assert parse_minimum_should_match("-1", 4) == 3   # all but 1
    assert parse_minimum_should_match("75%", 4) == 3  # floor(4*0.75)
    assert parse_minimum_should_match("75%", 3) == 2  # floor(3*0.75)
    assert parse_minimum_should_match("-25%", 4) == 3  # 4 - floor(1)
    assert parse_minimum_should_match("-25%", 3) == 3  # 3 - floor(0.75)
    assert parse_minimum_should_match("100%", 5) == 5
    assert parse_minimum_should_match("0%", 5) == 0
    assert parse_minimum_should_match("-10", 4) == 0   # clamped at 0
    assert parse_minimum_should_match(7, 4) == 7       # > count: matches 0
    with pytest.raises(ValueError):
        parse_minimum_should_match("abc", 3)
    with pytest.raises(ValueError):
        parse_minimum_should_match("x%", 3)
    # through the bool conversion
    should = [{"term": {"lang": {"value": v}}} for v in "abcd"]
    node = es_to_ast({"bool": {"should": should,
                               "minimum_should_match": "50%"}})
    assert node.minimum_should_match == 2


def test_sort_rejects_more_than_two_fields(spark, tmp_path):
    """collector.rs:1008-1029: at most 2 sort fields; the facade rejects
    rather than silently truncating."""
    import pandas as pd
    import pytest

    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.search.es_dsl import es_search
    pdf = pd.DataFrame({
        "repo": ["r"] * 6, "path": [f"f{i}.py" for i in range(6)],
        "commit": ["c"] * 6, "lang": ["python"] * 6,
        "content": ["alpha beta"] * 6, "size": range(6)})
    cfg = IndexConfig(index_uid="s3", index_dir=str(tmp_path / "s3"),
                      sha_col=None, store_cols=("size",))
    build_index_pandas(pdf, cfg, num_partitions=1)
    s = IndexSearcher(cfg.index_dir)
    with pytest.raises(ValueError, match="at most 2"):
        es_search(s, {"query": {"match": {"content": "alpha"}},
                      "sort": [{"size": {"order": "asc"}},
                               {"lang": {"order": "asc"}},
                               {"path": {"order": "asc"}}]})
    with pytest.raises(ValueError, match="1 or 2 sort fields"):
        s.sort_search(A.Term("content", "alpha"), k=3,
                      sort_by=(("size", "asc"), ("lang", "asc"),
                               ("path", "asc")))
    # 2 fields still fine
    out = es_search(s, {"query": {"match": {"content": "alpha"}},
                        "sort": [{"size": {"order": "desc"}},
                                 {"lang": {"order": "asc"}}], "size": 3})
    assert out["hits"]["total"]["value"] == 6


def test_phrase_query_snippets_highlight():
    """Quoted-phrase queries must produce highlighted snippets (Phrase /
    PhrasePrefix previously contributed zero terms => empty snippet)."""
    from quickwit_spark.search.parser import parse_query
    node = parse_query('"segmentation fault"')
    terms = extract_query_terms(node)
    assert "segmentation" in terms and "fault" in terms
    s = make_snippet("a segmentation fault occurred here", terms)
    assert "<b>segmentation</b>" in s and "<b>fault</b>" in s
    prefix = parse_query('"quick so"*')
    assert extract_query_terms(prefix)


def test_query_string_fields_multi_field():
    """query_string with a `fields` list (scenario 0005): bare terms
    search every listed field; explicit field: clauses are untouched."""
    node = es_to_ast({"query_string": {
        "query": "merge AND lang:py", "fields": ["content", "path"]}})
    assert isinstance(node, A.Bool)
    (expanded,) = [c for c in node.must if isinstance(c, A.Bool)]
    assert {c.field for c in expanded.should} == {"content", "path"}
    (explicit,) = [c for c in node.must
                   if getattr(c, "field", None) == "lang"]
    assert explicit.field == "lang"
    # a single-entry fields list degrades to one field; the BARE
    # STRING form is rejected like the reference (rest-api-tests
    # 0005 step 3 — unlike multi_match, which accepts a string)
    one = es_to_ast({"query_string": {"query": "merge",
                                      "fields": ["path"]}})
    assert one.field == "path"
    import pytest as _pt
    with _pt.raises(ValueError, match="fields"):
        es_to_ast({"query_string": {"query": "merge",
                                    "fields": "path"}})


def test_fields_boost_syntax():
    node = es_to_ast({"query_string": {
        "query": "merge", "fields": ["content^2", "path"]}})
    assert isinstance(node, A.Bool)
    boosted = [c for c in node.should if isinstance(c, A.Boost)]
    assert len(boosted) == 1 and boosted[0].boost == 2.0
    assert boosted[0].inner.field == "content"
    mm = es_to_ast({"multi_match": {"query": "merge",
                                    "fields": ["content^3"]}})
    assert isinstance(mm, A.Boost) and mm.boost == 3.0


def test_es_to_ast_fuzz_no_unexpected_exceptions():
    """ES bodies are user-controlled: any JSON-shaped input must either
    convert or raise ValueError/KeyError/TypeError (the documented
    invalid-request surface), never an internal error."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.sampled_from([
        "match", "term", "terms", "bool", "query_string", "range",
        "exists", "wildcard", "regexp", "multi_match", "match_phrase",
        "match_all", "must", "should", "must_not", "filter", "query",
        "field", "fields", "value", "gte", "lte", "boost", "slop",
        "minimum_should_match", "operator", "type", "nonsense"])
    scalars = st.one_of(st.text(max_size=8), st.integers(-5, 5),
                        st.booleans(), st.none(),
                        st.sampled_from(["75%", "-1", "phrase", "and"]))
    bodies = st.recursive(
        scalars,
        lambda children: st.one_of(
            st.dictionaries(keys, children, max_size=3),
            st.lists(children, max_size=3)),
        max_leaves=12)

    @settings(max_examples=300, deadline=None)
    @given(st.dictionaries(keys, bodies, min_size=1, max_size=2))
    def run(body):
        try:
            es_to_ast(body)
        except (ValueError, KeyError, TypeError, AttributeError):
            # AttributeError/TypeError on wrong-shaped spec values is
            # the facade's documented invalid-request surface (the REST
            # layer maps all of these to 400)
            return

    run()


def _mini_index(tmp_path, n=12):
    import pandas as pd
    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.search.engine import IndexSearcher
    pdf = pd.DataFrame({
        "repo": ["r"] * n, "path": [f"f{i}.py" for i in range(n)],
        "commit": ["c"] * n, "lang": ["go", "rust"] * (n // 2),
        "content": [f"alpha browse{'s' * (i % 2)} beta w{i}"
                    for i in range(n)],
        "size": range(n)})
    cfg = IndexConfig(index_uid="esx", index_dir=str(tmp_path / "esx"),
                      sha_col=None, store_cols=("size",),
                      tokenizer="default")
    build_index_pandas(pdf, cfg, num_partitions=1)
    return IndexSearcher(cfg.index_dir)


def test_es_sort_dict_and_string_forms(tmp_path):
    """ES accepts sort as ONE dict entry and as a bare string; the dict
    form previously iterated its keys (direction silently dropped) and
    the string form iterated characters."""
    from quickwit_spark.search.es_dsl import es_search

    s = _mini_index(tmp_path)
    body_list = {"query": {"match": {"content": "alpha"}},
                 "sort": [{"size": {"order": "desc"}}], "size": 3}
    body_dict = {"query": {"match": {"content": "alpha"}},
                 "sort": {"size": {"order": "desc"}}, "size": 3}
    body_str = {"query": {"match": {"content": "alpha"}},
                "sort": "size", "size": 3}
    want = [h["_source"]["size"]
            for h in es_search(s, body_list)["hits"]["hits"]]
    assert want == sorted(want, reverse=True)
    got = [h["_source"]["size"]
           for h in es_search(s, body_dict)["hits"]["hits"]]
    assert got == want  # direction honored, not dropped
    got_str = [h["_source"]["size"]
               for h in es_search(s, body_str)["hits"]["hits"]]
    assert got_str == sorted(got_str)  # string form = field asc
    # dict entry WITHOUT order: ES defaults asc for plain fields
    asc = es_search(s, {"query": {"match": {"content": "alpha"}},
                        "sort": [{"size": {"missing": "_last"}}],
                        "size": 3})["hits"]["hits"]
    assert [h["_source"]["size"] for h in asc] == [0, 1, 2]


def test_es_source_body_field(tmp_path):
    """The standard `_source` body field: false, array, and
    {includes, excludes} forms shape the emitted _source."""
    from quickwit_spark.search.es_dsl import es_search

    s = _mini_index(tmp_path)
    q = {"query": {"match": {"content": "alpha"}}, "size": 1}
    h = es_search(s, {**q, "_source": False})["hits"]["hits"][0]
    assert h["_source"] == {}
    h = es_search(s, {**q, "_source": ["lang"]})["hits"]["hits"][0]
    assert set(h["_source"]) == {"lang"}
    h = es_search(s, {**q, "_source": {"excludes": ["lang"]}}
                  )["hits"]["hits"][0]
    assert "lang" not in h["_source"] and "path" in h["_source"]


def test_match_bool_prefix_expands_last_token(tmp_path):
    """match_bool_prefix treats the final token as a prefix: 'alpha
    brows' matches docs containing 'browse'/'browses' (plain match
    would find nothing for 'brows')."""
    from quickwit_spark.search.es_dsl import es_search

    s = _mini_index(tmp_path)
    n_plain = es_search(s, {"query": {
        "match": {"content": "alpha brows"}}})["hits"]["total"]["value"]
    n_prefix = es_search(s, {"query": {
        "match_bool_prefix": {"content": "alpha brows"}}}
    )["hits"]["total"]["value"]
    assert n_prefix == 12  # every doc has a browse*/alpha token
    assert n_plain == 12   # or-match on 'alpha' alone also hits all
    # operator and: prefix clause becomes REQUIRED
    n_and = es_search(s, {"query": {"match_bool_prefix": {
        "content": {"query": "w3 brows", "operator": "and"}}}}
    )["hits"]["total"]["value"]
    assert n_and == 1      # only f3 has w3; brows* matches all
    n_and_plain = es_search(s, {"query": {"match": {
        "content": {"query": "w3 brows", "operator": "and"}}}}
    )["hits"]["total"]["value"]
    assert n_and_plain == 0  # no literal 'brows' token anywhere


def test_max_score_ignores_from_offset(tmp_path):
    """max_score is the global best, not the first post-offset hit."""
    from quickwit_spark.search.es_dsl import es_search

    s = _mini_index(tmp_path)
    q = {"query": {"match": {"content": "browses"}}}
    r0 = es_search(s, {**q, "size": 3})
    r2 = es_search(s, {**q, "size": 3, "from": 2})
    assert r2["hits"]["max_score"] == r0["hits"]["max_score"]
    assert r2["hits"]["hits"][0]["_score"] <= r0["hits"]["max_score"]


def test_minimum_should_match_below_minus_100_percent():
    from quickwit_spark.search.es_dsl import parse_minimum_should_match
    assert parse_minimum_should_match("-130%", 5) == 0
    assert parse_minimum_should_match("-60%", 5) == 2
    assert parse_minimum_should_match("-2", 5) == 3
    assert parse_minimum_should_match(-2, 5) == 3


def test_es_terms_agg_default_size_injected():
    from quickwit_spark.search.es_dsl import _es_terms_default_size
    spec = {"a": {"terms": {"field": "x"},
                  "aggs": {"b": {"terms": {"field": "y", "size": 3}}}}}
    out = _es_terms_default_size(spec)
    assert out["a"]["terms"]["size"] == 10          # ES default injected
    assert out["a"]["aggs"]["b"]["terms"]["size"] == 3  # explicit kept
    assert "size" not in spec["a"]["terms"]         # input not mutated


# ------------------------------------------------- review-pass regressions

import pytest as _pt


@_pt.fixture(scope="module")
def rev_searcher(spark, tmp_path_factory):
    import pandas as pd
    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.search.engine import IndexSearcher
    tmp = tmp_path_factory.mktemp("esrev")
    pdf = pd.DataFrame({
        "repo": ["r"] * 6, "path": [f"f{i}" for i in range(6)],
        "commit": ["c"] * 6,
        "lang": ["go", "go", "rust", "rust", "py", "py"],
        "content": ["merge sort", "merge base", "merge fast",
                    "delta one", "delta two", "gamma three"],
        "n_chars": [10, 11, 12, 8, 9, 11],
    })
    cfg = IndexConfig(index_uid="esrev", index_dir=str(tmp / "i"),
                      sha_col=None, store_cols=("n_chars",),
                      tokenizer="default")
    build_index_pandas(pdf, cfg, num_partitions=1)
    return IndexSearcher(cfg.index_dir, spark=spark)


def test_aggregations_alias_accepted(rev_searcher):
    """The standard ES `aggregations` key is a full alias of `aggs` at
    every nesting level — ignoring it silently returned zero facets."""
    from quickwit_spark.search import es_dsl
    body = {"query": {"match_all": {}}, "size": 0,
            "aggregations": {"langs": {"terms": {"field": "lang"}}}}
    r = es_dsl.es_search(rev_searcher, body)
    # the point here is the alias must not be silently IGNORED
    assert "aggregations" in r
    buckets = r["aggregations"]["langs"]["buckets"]
    assert {b["key"] for b in buckets} == {"go", "rust", "py"}
    alias_nested = {"query": {"match_all": {}}, "size": 0,
                    "aggs": {"langs": {
                        "terms": {"field": "lang"},
                        "aggregations": {"chars": {
                            "avg": {"field": "n_chars"}}}}}}
    r2 = es_dsl.es_search(rev_searcher, alias_nested)
    buckets2 = r2["aggregations"]["langs"]["buckets"]
    assert buckets2 and all("chars" in b for b in buckets2)


def test_malformed_bodies_raise_value_error(rev_searcher):
    """Malformed-but-plausible shapes must raise ValueError (-> HTTP
    400), never AttributeError/TypeError that kills the connection."""
    from quickwit_spark.search import es_dsl
    for bad in ({"range": {"n_chars": 5}},
                {"terms": {"lang": 5}},
                {"bool": {"must": 5}},
                {"match": 7}):
        with _pt.raises(ValueError):
            es_dsl.es_search(rev_searcher, {"query": bad})


def test_match_bool_prefix_analyzed_last_token(rev_searcher):
    """Trailing punctuation must not poison the prefix pattern, and
    `?` in user text must not become a match-any-char wildcard."""
    from quickwit_spark.search import es_dsl

    def n(q):
        return es_dsl.es_search(rev_searcher, {"query": {
            "match_bool_prefix": {"content": q}},
            "size": 6})["hits"]["total"]["value"]
    base = n("mer")
    assert base == 3
    assert n("mer,") == base
    assert n("mer?") == base


def test_bulk_items_keyed_by_action(tmp_path):
    """Items mirror their action ('create' lines -> items[i]['create'])
    and a replayed batch reports 200/noop, not a fabricated 201."""
    from quickwit_spark.config import IndexConfig
    from quickwit_spark.search import es_dsl
    cfg = IndexConfig(index_uid="bk", index_dir=str(tmp_path / "bk"),
                      sha_col=None, tag_cols=())
    lines = [{"index": {}},
             {"repo": "r", "path": "a", "commit": "c",
              "content": "w one"},
             {"create": {}},
             {"repo": "r", "path": "b", "commit": "c",
              "content": "w two"}]
    r1 = es_dsl.es_bulk(cfg, lines)
    assert "index" in r1["items"][0] and "create" in r1["items"][1]
    assert r1["items"][0]["index"]["status"] == 201
    assert r1["items"][1]["create"]["result"] == "created"
    r2 = es_dsl.es_bulk(cfg, lines)  # exact replay
    assert r2["items"][0]["index"]["status"] == 200
    assert r2["items"][1]["create"]["result"] == "noop"


def test_field_caps_and_mapping_types_agree(rev_searcher):
    """One shared type map: the two endpoints must report the same ES
    type for every shared field."""
    from quickwit_spark.search import es_dsl
    caps = es_dsl.es_field_caps(rev_searcher)["fields"]
    props = es_dsl.es_get_mapping(rev_searcher)
    props = props[next(iter(props))]["mappings"]["properties"]
    for fld, types in caps.items():
        if fld in props and "type" in props[fld]:
            assert props[fld]["type"] in types, fld
