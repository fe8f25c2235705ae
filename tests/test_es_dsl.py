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
