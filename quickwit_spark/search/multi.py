"""Multi-index search: one request over several indexes (the reference
root resolves index-id PATTERNS via the metastore and fans out across
every matching index — root.rs plan_splits_for_root_search /
list_indexes_metadata; quickwit-metastore index patterns).

The cross-index merge key mirrors the reference's global order: score
desc, then the doc address (index_uid, segment_id, doc_id) desc."""

from __future__ import annotations

import fnmatch
import os

from .engine import IndexSearcher, SearchHit, SearchResult


def resolve_index_patterns(root_dir: str, patterns: list[str]
                           ) -> list[str]:
    """Index dirs under root_dir whose index_uid matches any glob
    pattern (`logs-*` style, rest_handler index-id patterns). An index
    dir is any direct child holding a manifest.json."""
    from ..index.manifest import Manifest
    out = []
    for name in sorted(os.listdir(root_dir)):
        d = os.path.join(root_dir, name)
        if not os.path.isfile(Manifest.path(d)):
            continue
        uid = _read_index_uid(Manifest.path(d))
        if any(fnmatch.fnmatch(uid, p) for p in patterns):
            out.append(d)
    return out


def _read_index_uid(manifest_path: str) -> str:
    """Just the index_uid, without json-parsing the whole manifest —
    at 100k segment rows the full parse is tens of MB of JSON per
    candidate index per pattern resolution. Each textual match is
    verified to sit at TOP-LEVEL nesting (depth-1 brace scan of the
    prefix, string-aware): a nested "index_uid" key — e.g. a user doc
    field or source name inside "config"/"checkpoints", both of which
    sort before "index_uid" under sort_keys=True — can no longer
    shadow the real one. Falls back to a full parse when no top-level
    match exists. The scanned prefix ends at the first top-level match,
    well before the "segments" bulk."""
    import json
    import re
    with open(manifest_path, "rb") as f:
        raw = f.read()
    for m in re.finditer(rb'"index_uid":\s*"((?:[^"\\]|\\.)*)"', raw):
        if _json_depth_at(raw, m.start()) == 1:
            return json.loads(b'"' + m.group(1) + b'"')
    return json.loads(raw)["index_uid"]


def _json_depth_at(raw: bytes, pos: int) -> int:
    """Brace/bracket nesting depth at byte offset `pos` (-1 if inside a
    string literal): one pass over the prefix, escape-aware."""
    depth = 0
    in_str = False
    esc = False
    for c in raw[:pos]:
        if in_str:
            if esc:
                esc = False
            elif c == 0x5C:  # backslash
                esc = True
            elif c == 0x22:  # quote
                in_str = False
        elif c == 0x22:
            in_str = True
        elif c in (0x7B, 0x5B):  # { [
            depth += 1
        elif c in (0x7D, 0x5D):  # } ]
            depth -= 1
    return -1 if in_str else depth


class MultiIndexSearcher:
    """Fan a query out over several indexes and merge top-k globally.
    Each index keeps its own schema/tokenizer (the query string is
    parsed per index against its default field, exactly as the
    reference validates per doc-mapping)."""

    def __init__(self, index_dirs: list[str], spark=None):
        if not index_dirs:
            raise ValueError("no indexes matched")
        self.searchers = [IndexSearcher(d, spark=spark)
                          for d in index_dirs]

    def search(self, query, k: int = 10, offset: int = 0,
               fetch_fields: bool = True,
               count_all: bool = True) -> tuple[int, list[tuple[str,
                                                                SearchHit]]]:
        """Returns (num_hits_total, [(index_uid, hit), ...]) in global
        rank order."""
        rows = []
        total = 0
        for s in self.searchers:
            res = s.search(query, k=offset + k,
                           fetch_fields=fetch_fields,
                           count_all=count_all)
            uid = s.manifest.data["index_uid"]
            total += res.num_hits
            rows.extend((h.score, uid, h) for h in res.hits)
        rows.sort(key=lambda r: (-r[0], _desc(r[1]),
                                 _desc(r[2].segment_id), -r[2].doc_id))
        return total, [(uid, h) for _sc, uid, h in
                       rows[offset:offset + k]]

    def count(self, query) -> int:
        return sum(s.count(query) for s in self.searchers)


class _desc(str):
    """Reverse-ordering wrapper for descending string sort keys."""
    def __lt__(self, other):
        return str.__gt__(self, other)

    def __gt__(self, other):
        return str.__lt__(self, other)


# ---------------------------------------------------------------------------
# UnionSearcher: the ES facade over index PATTERNS
# ---------------------------------------------------------------------------

def resolve_es_index_patterns(root_dir: str, expr: str,
                              existing: list[str]) -> list[str]:
    """ES index expression -> concrete index ids: comma list of globs,
    `-pattern` entries EXCLUDE (es_compatibility/multi-indices:
    `gharchive-*,-gharchive-2`). A CONCRETE missing name raises
    KeyError (ES 404s those); an unmatched wildcard matches nothing."""
    import fnmatch as _fn
    pos: list[str] = []
    neg: list[str] = []
    for part in expr.split(","):
        part = part.strip()
        if not part:
            continue
        if part.startswith("-"):
            neg.append(part[1:])
        else:
            pos.append(part)
    for p in pos:
        if "*" not in p and "?" not in p and p not in existing:
            raise KeyError(p)
    out = [n for n in sorted(existing)
           if any(_fn.fnmatch(n, p) for p in pos)
           and not any(_fn.fnmatch(n, p) for p in neg)]
    return out


def _hit_sort_value(hit, field: str):
    """One hit's sort-merge key value: engine doc columns first (exact
    datetime millis / numerics), then the stored source for dynamic
    paths."""
    if field == "_score":
        return hit.score
    if field in ("_doc", "_shard_doc"):
        return hit.doc_id
    v = hit.doc.get(field)
    if v is not None:
        return v
    from .engine import doc_source
    cur = doc_source(hit.doc)
    for seg in str(field).split("."):
        cur = cur.get(seg) if isinstance(cur, dict) else None
    if isinstance(cur, (dict, list)):
        return None
    return cur


class _KeyWrap:
    """Comparator wrapper: missing values LAST regardless of
    direction; descending fields invert; mixed types compare as
    (typeclass, value) so a stray string can't TypeError the merge."""

    __slots__ = ("key",)

    def __init__(self, value, desc: bool):
        if value is None or (isinstance(value, float)
                             and value != value):
            self.key = (2, 0)  # missing: after everything
            return
        if isinstance(value, bool):
            value = int(value)
        if isinstance(value, (int, float)):
            self.key = (0, -value if desc else value)
        else:
            s = str(value)
            self.key = (1, _desc(s) if desc else s)

    def __lt__(self, other):
        return self.key < other.key

    def __eq__(self, other):
        # REQUIRED for multi-field tuple sorts: without __eq__, equal
        # primary keys compare by object identity (False), so the
        # tuple comparison would never consult the secondary key
        return isinstance(other, _KeyWrap) and self.key == other.key

    def __hash__(self):
        return hash(self.key)


class UnionSearcher:
    """One ES search over several indexes (the reference root resolves
    index-id patterns and fans out, merging leaf responses globally —
    root.rs plan_splits_for_root_search). Hits carry a namespaced
    segment id `uid/segment` so `_index` and cursors stay unambiguous.

    Scrolls are PAGE-based: the context stores the query + page
    ordinal and refetches (page+1)*k merged rows per step — O(pages)
    refetch instead of cross-index cursor algebra, exact results
    (scroll depth is bounded in practice; the reference caches leaf
    requests for the same reason)."""

    def __init__(self, index_dirs: list[str], spark=None,
                 scroll_store: dict | None = None):
        self.index_dirs = list(index_dirs)
        self.searchers = [IndexSearcher(d, spark=spark)
                          for d in index_dirs]
        self.uids = [s.manifest.data["index_uid"]
                     for s in self.searchers]
        self.text_field = (self.searchers[0].text_field
                           if self.searchers else "content")
        self.tokenizer = (self.searchers[0].tokenizer
                          if self.searchers else "default")
        self._scroll_store = scroll_store if scroll_store is not None \
            else {}
        self._spark = spark

    # the serving layer attaches a session lazily for aggregations
    @property
    def spark(self):
        return self._spark

    @spark.setter
    def spark(self, sess):
        self._spark = sess
        for s in self.searchers:
            s.spark = sess

    @property
    def index_uid(self) -> str:
        return ",".join(self.uids)

    @property
    def has_dynamic(self) -> bool:
        return any(getattr(s, "has_dynamic", False)
                   for s in self.searchers)

    @property
    def record(self) -> str:
        recs = {getattr(s, "record", "freq") for s in self.searchers}
        return "position" if "position" in recs else \
            (recs.pop() if recs else "freq")

    def parse(self, query):
        if self.searchers:
            return self.searchers[0].parse(query)
        from . import ast as A
        return query if isinstance(query, A.Node) else A.MatchAll()

    def count(self, query) -> int:
        return sum(s.count(s.parse(query)) for s in self.searchers)

    def list_fields(self) -> list:
        seen: dict = {}
        for s in self.searchers:
            for f in s.list_fields():
                seen.setdefault(f["field"], f)
        return list(seen.values())

    def _tag(self, uid: str, res: SearchResult) -> list[SearchHit]:
        return [SearchHit(h.score, f"{uid}/{h.segment_id}",
                          h.doc_id, h.doc) for h in res.hits]

    def search(self, query, k: int = 10, offset: int = 0,
               fetch_fields: bool = True, count_all: bool = True,
               search_after=None) -> SearchResult:
        need = offset + k
        rows: list[tuple] = []
        total = 0
        max_score = None
        # translate a global cursor into per-index cursors so each
        # index fetches its top `need` rows AFTER the cursor (fetching
        # without one would starve deep pages: the cursor could sit
        # past every returned row). Global order is (score desc, uid
        # desc, segment desc, doc desc): for an index ABOVE the
        # cursor's uid every equal-score row is already consumed
        # (sentinel seg "" excludes them); below it they all qualify
        # (sentinel seg ￿ includes them).
        per_index_sa: dict[str, tuple] = {}
        if search_after is not None:
            sc = float(search_after[0])
            skey = str(search_after[1])
            sdoc = int(search_after[2])
            cuid, _, cseg = skey.partition("/")
            for uid in self.uids:
                if uid == cuid:
                    per_index_sa[uid] = (sc, cseg, sdoc)
                elif uid > cuid:
                    per_index_sa[uid] = (sc, "", -1)
                else:
                    per_index_sa[uid] = (sc, "￿", 1 << 62)
        for uid, s in zip(self.uids, self.searchers):
            res = s.search(s.parse(query), k=need,
                           fetch_fields=fetch_fields,
                           count_all=count_all,
                           search_after=per_index_sa.get(uid))
            total += res.num_hits
            if res.max_score is not None:
                max_score = res.max_score if max_score is None else \
                    max(max_score, res.max_score)
            rows.extend((h.score, _desc(uid), _desc(h.segment_id),
                         h.doc_id, uid, h) for h in res.hits)
        # global order: score desc, then doc address desc (uid desc,
        # segment desc, doc desc — collector.rs tie-break extended by
        # the index dimension)
        rows.sort(key=lambda r: (-r[0], r[1], r[2], -r[3]))
        if search_after is not None:
            sc, skey, sdoc = (float(search_after[0]),
                              str(search_after[1]),
                              int(search_after[2]))
            def after(r):
                if r[0] != sc:
                    return r[0] < sc
                if f"{r[4]}/{r[5].segment_id}" != skey:
                    return f"{r[4]}/{r[5].segment_id}" < skey
                return r[5].doc_id < sdoc
            rows = [r for r in rows if after(r)]
        hits = [SearchHit(h.score, f"{uid}/{h.segment_id}", h.doc_id,
                          h.doc)
                for _sc, _u, _g, _d, uid, h in
                rows[offset:offset + k]]
        return SearchResult(total, hits, max_score=max_score)

    def sort_search(self, query, k: int = 10,
                    sort_by: tuple = (("_score", "desc"),),
                    fetch_fields: bool = True, search_after=None,
                    count_all: bool = True) -> SearchResult:
        if search_after is not None \
                and len(search_after) != len(sort_by):
            raise ValueError(
                "multi-index sort search takes ES VALUES-ONLY "
                "search_after cursors (one value per sort field); "
                "address cursors don't span indexes — page with "
                "scroll instead")
        rows: list[tuple] = []
        total = 0
        for uid, s in zip(self.uids, self.searchers):
            # a values-only cursor filters identically inside every
            # index (strictly-after semantics are index-independent)
            res = s.sort_search(s.parse(query), k=k,
                                sort_by=sort_by,
                                fetch_fields=fetch_fields,
                                search_after=search_after,
                                count_all=count_all)
            total += res.num_hits
            rows.extend((uid, h) for h in res.hits)
        first_desc = sort_by[0][1] == "desc"

        def keyf(row):
            uid, h = row
            ks = [_KeyWrap(_hit_sort_value(h, f), d == "desc")
                  for f, d in sort_by]
            addr = ((_desc(uid), _desc(h.segment_id), -h.doc_id)
                    if first_desc else (uid, str(h.segment_id),
                                        h.doc_id))
            return (*ks, *addr)
        rows.sort(key=keyf)
        hits = [SearchHit(h.score, f"{uid}/{h.segment_id}", h.doc_id,
                          h.doc) for uid, h in rows[:k]]
        return SearchResult(total, hits)

    def matched_docs(self, query, columns: list[str]):
        frames = [s.matched_docs(s.parse(query), columns)
                  for s in self.searchers]
        if not frames:
            # zero matched indexes: an EMPTY relation (aggregations
            # over a no-match pattern return empty buckets, like ES)
            if self._spark is not None:
                import pyspark.sql.types as T
                fields = [T.StructField("segment_id", T.StringType()),
                          T.StructField("doc_id", T.LongType())]
                fields += [T.StructField(c, T.StringType())
                           for c in columns
                           if c not in ("segment_id", "doc_id")]
                return self._spark.createDataFrame(
                    [], T.StructType(fields))
            import pandas as pd
            return pd.DataFrame(columns=["segment_id", "doc_id",
                                         *columns])
        if hasattr(frames[0], "iloc"):
            import pandas as pd
            return pd.concat(frames, ignore_index=True)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    # -- page-based scroll -------------------------------------------------

    def scroll(self, query, k: int = 10, ttl_seconds: float = 60.0,
               fetch_fields: bool = True,
               sort_by: tuple | None = None) -> tuple[SearchResult,
                                                      str]:
        import time
        import uuid

        from .ast import ast_to_json
        node = self.parse(query)
        res = self._page(node, 0, k, sort_by)
        sid = uuid.uuid4().hex
        self._scroll_store[sid] = {
            "dirs": list(self.index_dirs),
            "query_ast": ast_to_json(node),
            "k": int(k), "page": 1,
            "sort_by": [list(x) for x in sort_by] if sort_by else None,
            "ttl": float(ttl_seconds),
            "expires_at": time.time() + float(ttl_seconds),
        }
        return res, sid

    def scroll_next(self, scroll_id: str) -> SearchResult:
        import time

        from .ast import ast_from_json
        ctx = self._scroll_store.get(scroll_id)
        if ctx is None or ctx["expires_at"] < time.time():
            self._scroll_store.pop(scroll_id, None)
            raise KeyError(scroll_id)
        node = ast_from_json(ctx["query_ast"])
        sort_by = tuple(tuple(x) for x in ctx["sort_by"]) \
            if ctx["sort_by"] else None
        res = self._page(node, ctx["page"], ctx["k"], sort_by)
        ctx["page"] += 1
        ctx["expires_at"] = time.time() + ctx["ttl"]
        return res

    def scroll_clear(self, scroll_id: str) -> bool:
        return self._scroll_store.pop(scroll_id, None) is not None

    def _page(self, node, page: int, k: int,
              sort_by: tuple | None) -> SearchResult:
        need = (page + 1) * k
        if sort_by:
            res = self.sort_search(node, k=need, sort_by=sort_by)
        else:
            res = self.search(node, k=need)
        return SearchResult(res.num_hits, res.hits[page * k:need],
                            max_score=res.max_score)
