"""Query-string grammar tests (docs/reference/query-language.md semantics:
default operator AND, field:term, IN sets, ranges, NOT/-, grouping)."""

from quickwit_spark.search import ast as A
from quickwit_spark.search.parser import parse_query


def test_default_and():
    node = parse_query("quick sort", default_field="content")
    assert node == A.Bool(must=(A.FullText("content", "quick"),
                                A.FullText("content", "sort")))


def test_or_and_grouping():
    node = parse_query("a AND (b OR c)", default_field="content")
    assert node == A.Bool(must=(
        A.FullText("content", "a"),
        A.Bool(should=(A.FullText("content", "b"),
                       A.FullText("content", "c")))))


def test_field_term_and_not():
    node = parse_query("lang:python -content:slow")
    assert node == A.Bool(must=(A.FullText("lang", "python"),),
                          must_not=(A.FullText("content", "slow"),))


def test_not_keyword():
    node = parse_query("a NOT b", default_field="content")
    assert node == A.Bool(must=(A.FullText("content", "a"),),
                          must_not=(A.FullText("content", "b"),))


def test_in_set():
    node = parse_query("lang:IN [python rust go]")
    assert node == A.TermSet("lang", ("python", "rust", "go"))


def test_range_brackets():
    assert parse_query("size:[10 TO 20]") == A.Range("size", gte="10",
                                                     lte="20")
    assert parse_query("size:{10 TO 20}") == A.Range("size", gt="10",
                                                     lt="20")
    assert parse_query("size:[* TO 20}") == A.Range("size", lt="20")
    assert parse_query("size:>=5") == A.Range("size", gte="5")


def test_wildcard_and_matchall():
    assert parse_query("*") == A.MatchAll()
    assert parse_query("wil?car*d", default_field="c") == \
        A.Wildcard("c", "wil?car*d")


def test_quoted_phrase():
    node = parse_query('"quick sort"', default_field="content")
    assert node == A.Phrase("content", "quick sort")


def test_quoted_phrase_slop_and_prefix():
    assert parse_query('title:"quick sort"~2', default_field="c") == \
        A.Phrase("title", "quick sort", slop=2)
    assert parse_query('c:"quick so"*', default_field="c") == \
        A.PhrasePrefix("c", "quick so")


def test_boost_syntax():
    node = parse_query("merge^2", default_field="c")
    assert node == A.Boost(A.FullText("c", "merge", operator="and"), 2.0)
    node = parse_query('t:"quick sort"^0.5', default_field="c")
    assert node == A.Boost(A.Phrase("t", "quick sort"), 0.5)
    # suffix operators bind only when ADJACENT to the closing quote
    spaced = parse_query('t:"quick sort" ^0.5', default_field="c")
    assert not isinstance(spaced, A.Boost)
    node = parse_query("a merge^2", default_field="c")
    assert node == A.Bool(must=(
        A.FullText("c", "a", operator="and"),
        A.Boost(A.FullText("c", "merge", operator="and"), 2.0)))


def test_negated_phrase_and_group():
    """`-"..."` and `-(...)`: the sign lexes as its own token and must
    negate the NEXT primary — not become an always-empty must clause."""
    n = parse_query('error -"false positive"')
    assert isinstance(n, A.Bool)
    assert len(n.must) == 1 and isinstance(n.must[0], A.FullText)
    assert len(n.must_not) == 1 and isinstance(n.must_not[0], A.Phrase)
    assert n.must_not[0].text == "false positive"

    g = parse_query('error -(warn info)')
    assert len(g.must_not) == 1
    # dangling sign is dropped, not an empty clause
    d = parse_query('error -')
    assert isinstance(d, A.FullText)


def test_field_star_is_exists():
    n = parse_query('status:*')
    assert isinstance(n, A.FieldPresence) and n.field == "status"
    both = parse_query('status:* AND error')
    kinds = {type(c) for c in both.must}
    assert A.FieldPresence in kinds
    # bare * stays match-all
    assert isinstance(parse_query('*'), A.MatchAll)


def test_parser_fuzz_no_unexpected_exceptions():
    """Any input must either parse or raise ValueError — no IndexError/
    AttributeError/RecursionError escapes the grammar (user-facing
    query strings are attacker-controlled input)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list(
        'abc x:"()-+*?~^[]{}<>\\\'0 9.AND OR NOT TO IN'))
    texts = st.text(alphabet=alphabet, min_size=0, max_size=40)

    @settings(max_examples=300, deadline=None)
    @given(texts)
    def run(q):
        try:
            node = parse_query(q)
        except ValueError:
            return
        assert node is not None

    run()


def test_quoted_range_bounds_unquoted():
    """ts:["2020-01-01 00:00" TO *] — the quotes/escapes are stripped
    from the bound, not compared literally ('\"' sorts before every
    digit, silently wrong results)."""
    from quickwit_spark.search import ast as A
    from quickwit_spark.search.parser import parse_query

    n = parse_query('ts:["2020-01-01 00:00" TO *]', default_field="text")
    assert isinstance(n, A.Range)
    assert n.gte == "2020-01-01 00:00" and n.lt is None and n.lte is None
    n2 = parse_query('ts:["a \\"q\\" b" TO "z z"]', default_field="text")
    assert n2.gte == 'a "q" b' and n2.lte == "z z"


def test_free_standing_hyphen_is_not_negation():
    """'rock - paper' (hyphen as copied punctuation) must not exclude
    'paper'; a sign only negates what it touches ('-paper')."""
    from quickwit_spark.search import ast as A
    from quickwit_spark.search.parser import parse_query

    n = parse_query("rock - paper", default_field="text")
    assert isinstance(n, A.Bool)
    assert not n.must_not
    texts = sorted(c.text for c in n.must)
    assert texts == ["paper", "rock"]
    n2 = parse_query('rock -"bad phrase"', default_field="text")
    assert n2.must_not  # adjacent sign still negates
