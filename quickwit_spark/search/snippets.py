"""Snippet generation: highlight fragments from stored content around the
query terms (reference: quickwit-search/src/fetch_docs.rs:263-352 —
fragments capped at 150 chars, matched terms wrapped in <b> tags)."""

from __future__ import annotations

import re

MAX_FRAGMENT = 150


def extract_query_terms(node) -> list[str]:
    """Collect text-field term strings from an AST for highlighting."""
    from . import ast as A
    out: list[str] = []

    def walk(n):
        if isinstance(n, A.Term):
            out.append(n.value)
        elif isinstance(n, A.FullText):
            out.append(n.text)
        elif isinstance(n, (A.Phrase, A.PhrasePrefix)):
            # quoted queries must highlight too — without this every
            # phrase search returned an empty snippet
            out.append(n.text)
        elif isinstance(n, A.TermSet):
            out.extend(n.values)
        elif isinstance(n, A.Boost):
            walk(n.inner)
        elif isinstance(n, A.Bool):
            for c in list(n.must) + list(n.should) + list(n.filter):
                walk(c)

    walk(node)
    terms = []
    for t in out:
        terms.extend(t.split())
    return [t for t in terms if t]


from functools import lru_cache


@lru_cache(maxsize=256)
def _term_pattern(terms: tuple) -> "re.Pattern":
    """Compiled per distinct term set, cached: a _search with size=N
    and M highlight fields otherwise recompiles the identical
    alternation N*M times per request."""
    return re.compile("|".join(
        re.escape(t) for t in sorted(terms, key=len, reverse=True)),
        re.IGNORECASE)


def make_snippet(content: str, terms: list[str],
                 max_fragment: int = MAX_FRAGMENT) -> str:
    """One highlighted fragment of <= max_fragment chars centered on the
    first term match; empty string when nothing matches."""
    if not content or not terms:
        return ""
    pat = _term_pattern(tuple(sorted(set(terms))))
    m = pat.search(content)
    if not m:
        return ""
    half = max_fragment // 2
    lo = max(0, m.start() - half)
    hi = min(len(content), lo + max_fragment)
    lo = max(0, hi - max_fragment)
    frag = content[lo:hi]
    return pat.sub(lambda mm: f"<b>{mm.group(0)}</b>", frag)
