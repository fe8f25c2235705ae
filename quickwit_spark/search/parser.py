"""Query-string parser for the reference's query language
(docs/reference/query-language.md; UserInput AST node,
quickwit-query/src/query_ast/user_input_query.rs:35-120).

Supported grammar subset:
    clause   := orExpr
    orExpr   := andExpr (OR andExpr)*
    andExpr  := unary (AND? unary)*          # adjacency = AND (default op
                                             # is AND, query_ast/mod.rs:319-329
                                             # — contra Elasticsearch)
    unary    := ('-' | 'NOT' | '+')? primary
    primary  := '(' clause ')' | field ':' value | value
    value    := word | "quoted text" | IN [w1 w2 ...]
              | [a TO b] | {a TO b} | >x | >=x | <x | <=x | *

Words containing `*` or `?` become Wildcard nodes; `*` alone is MatchAll.
Quoted text becomes a FullText AND over its tokens (positions/phrases are
deferred — the reference's phrase-fallback-to-intersection mode).
"""

from __future__ import annotations

import re

from . import ast as A

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrack>[\[{]) | (?P<rbrack>[\]}]) |
        (?P<quote>"(?:[^"\\]|\\.)*") |
        (?P<word>[^\s()\[\]{}":]+) |
        (?P<colon>:)
    )""",
    re.VERBOSE,
)


def _lex(q: str) -> tuple[list[tuple[str, str]], list[tuple[int, int]]]:
    """Tokens plus their (start, end) source spans — suffix operators
    (`"..."~2`, `"..."*`, `"..."^3`) only bind when ADJACENT to the
    closing quote (query-language.md grammar; `"phrase" *` is a phrase
    AND match-all, not a prefix phrase)."""
    out = []
    spans = []
    i = 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m or m.end() == i:
            if q[i].isspace():
                i += 1
                continue
            raise ValueError(f"cannot lex query at {q[i:]!r}")
        i = m.end()
        for kind in ("lparen", "rparen", "lbrack", "rbrack", "quote",
                     "word", "colon"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                spans.append((m.end() - len(v), m.end()))
                break
    return out, spans


class _Parser:
    def __init__(self, tokens, default_field: str, default_operator: str,
                 spans=None):
        self.toks = tokens
        self.spans = spans or []
        self.pos = 0
        self.default_field = default_field
        self.default_op = default_operator

    def _adjacent_to_prev(self) -> bool:
        """True if the token at self.pos starts exactly where the previous
        token ended (no whitespace between)."""
        if not self.spans or self.pos >= len(self.spans) or self.pos == 0:
            return False
        return self.spans[self.pos][0] == self.spans[self.pos - 1][1]

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def parse(self) -> A.Node:
        node = self.or_expr()
        if self.pos != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.pos:]}")
        return node

    def or_expr(self) -> A.Node:
        parts = [self.and_expr()]
        while self.peek() == ("word", "OR"):
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return A.Bool(should=tuple(parts))

    def and_expr(self) -> A.Node:
        must: list[A.Node] = []
        must_not: list[A.Node] = []
        while True:
            kind, val = self.peek()
            if kind is None or kind == "rparen" or (kind, val) == ("word", "OR"):
                break
            if (kind, val) == ("word", "AND"):
                self.next()
                continue
            neg = False
            if (kind, val) == ("word", "NOT"):
                self.next()
                neg = True
            elif (kind, val) in (("word", "-"), ("word", "+")):
                # bare -/+ before a quoted phrase or group: the sign
                # lexes as its own token (`-"bad phrase"`, `-(a b)`),
                # so consume it and apply to the NEXT primary — leaving
                # it would turn into an always-empty FullText("-") must
                # clause that zeroes the whole query
                self.next()
                if self.peek()[0] in (None, "rparen"):
                    break  # dangling sign at end of clause: drop it
                # a sign only negates what it TOUCHES: 'rock - paper'
                # (hyphen as copied punctuation) must not silently
                # exclude 'paper'; the stray token is dropped instead
                if self._adjacent_to_prev():
                    neg = val == "-"
            elif kind == "word" and val.startswith("-") and len(val) > 1:
                self.toks[self.pos] = ("word", val[1:])
                neg = True
            elif kind == "word" and val.startswith("+") and len(val) > 1:
                self.toks[self.pos] = ("word", val[1:])
            node = self.primary()
            (must_not if neg else must).append(node)
        if not must and not must_not:
            raise ValueError("empty clause")
        if len(must) == 1 and not must_not:
            return must[0]
        return A.Bool(must=tuple(must), must_not=tuple(must_not))

    def primary(self) -> A.Node:
        kind, val = self.next()
        if kind == "lparen":
            node = self.or_expr()
            k, _ = self.next()
            if k != "rparen":
                raise ValueError("expected )")
            return node
        if kind == "quote":
            return self._phrase_node(self.default_field, val)
        if kind == "word":
            if self.peek()[0] == "colon":
                self.next()
                return self.field_value(val)
            return self.value_node(self.default_field, val)
        raise ValueError(f"unexpected token {kind}:{val}")

    def _phrase_node(self, field: str, quoted: str) -> A.Node:
        """Quoted text => Phrase; `"..."~N` sets slop; `"..."*` => prefix
        phrase (reference grammar, docs/reference/query-language.md).
        Engines without position postings fall back to intersection."""
        text = re.sub(r"\\(.)", r"\1", quoted[1:-1])
        k, v = self.peek()
        if k == "word" and self._adjacent_to_prev():
            if v.startswith("~") and v[1:].isdigit():
                self.next()
                return A.Phrase(field, text, slop=int(v[1:]))
            if v == "*":
                self.next()
                return A.PhrasePrefix(field, text)
            if re.fullmatch(r"\^\d+(?:\.\d+)?", v or ""):
                self.next()
                return A.Boost(A.Phrase(field, text), float(v[1:]))
        return A.Phrase(field, text)

    def field_value(self, field: str) -> A.Node:
        kind, val = self.peek()
        if kind == "lparen":
            # field:(a AND b OR c) — group scoped to the field
            # (docs/reference/query-language.md grouping)
            self.next()
            saved = self.default_field
            self.default_field = field
            try:
                node = self.or_expr()
            finally:
                self.default_field = saved
            k, _ = self.next()
            if k != "rparen":
                raise ValueError("expected ) closing field group")
            return node
        if kind == "quote":
            self.next()
            return self._phrase_node(field, val)
        if (kind, val) == ("word", "IN"):
            self.next()
            k, open_b = self.next()
            if k != "lbrack":
                raise ValueError("expected [ after IN")
            vals = []
            while self.peek()[0] == "word":
                vals.append(self.next()[1])
            k, _ = self.next()
            if k != "rbrack":
                raise ValueError("expected ] closing IN")
            return A.TermSet(field, tuple(vals))
        if kind == "lbrack":
            lo_excl = val == "{"
            self.next()

            def _bound():
                # quoted bounds (`ts:["2020-01-01 00:00" TO *]`) carry
                # their surrounding quotes and escapes in the raw token
                # — strip/unescape like _phrase_node, else the literal
                # '"' becomes part of the compared string (it sorts
                # before every digit, silently wrong range results)
                bk, bv = self.next()
                if bk == "quote":
                    return re.sub(r"\\(.)", r"\1", bv[1:-1]), True
                return bv, False
            lo, lo_quoted = _bound()
            to = self.next()[1]
            if to != "TO":
                raise ValueError("expected TO in range")
            hi, hi_quoted = _bound()
            k, close_b = self.next()
            if k != "rbrack":
                raise ValueError("expected ] closing range")
            hi_excl = close_b == "}"
            kw = {}
            if lo != "*" or lo_quoted:  # quoted "*" is a literal bound
                kw["gt" if lo_excl else "gte"] = lo
            if hi != "*" or hi_quoted:
                kw["lt" if hi_excl else "lte"] = hi
            return A.Range(field, **kw)
        if kind == "word":
            self.next()
            if val == "*":
                # `field:*` is the exists query (reference grammar,
                # docs/reference/query-language.md) — NOT MatchAll,
                # which would silently drop the presence constraint
                return A.FieldPresence(field)
            for op, key in ((">=", "gte"), ("<=", "lte"), (">", "gt"),
                            ("<", "lt")):
                if val.startswith(op):
                    return A.Range(field, **{key: val[len(op):]})
            return self.value_node(field, val)
        raise ValueError(f"bad field value for {field}")

    def value_node(self, field: str, word: str) -> A.Node:
        if word == "*":
            return A.MatchAll()
        # a BARE comparison applies to the default field
        # (`default_field: actor.id, query: ">=123"` — 0005 step 20)
        for op, key in ((">=", "gte"), ("<=", "lte"), (">", "gt"),
                        ("<", "lt")):
            if word.startswith(op) and len(word) > len(op):
                return A.Range(field, **{key: word[len(op):]})
        word, boost = split_boost(word)
        if "*" in word or "?" in word:
            node: A.Node = A.Wildcard(field, word)
        else:
            node = A.FullText(field, word, operator=self.default_op)
        return A.Boost(node, boost) if boost is not None else node


def split_boost(word: str) -> tuple[str, float | None]:
    """Split the `text^2` / `name^2.5` boost suffix — the ONE parser of
    the boost grammar, shared by the query-string grammar and the ES
    `fields` lists (a second copy could drift on accepted forms)."""
    m = re.match(r"^(.+)\^(\d+(?:\.\d+)?)$", word)
    return (m.group(1), float(m.group(2))) if m else (word, None)


def parse_query(q: str, default_field: str = "content",
                default_operator: str = "and") -> A.Node:
    q = q.strip()
    if not q or q == "*":
        return A.MatchAll()
    toks, spans = _lex(q)
    return _Parser(toks, default_field, default_operator,
                   spans=spans).parse()
