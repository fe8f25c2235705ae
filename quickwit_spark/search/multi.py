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
    candidate index per pattern resolution. The top-level key is
    matched textually (checkpoint keys are partition ids / source
    names by construction, so the literal cannot occur earlier);
    falls back to a full parse if the pattern is not found."""
    import json
    import re
    with open(manifest_path, "rb") as f:
        raw = f.read()
    m = re.search(rb'"index_uid":\s*"((?:[^"\\]|\\.)*)"', raw)
    if m:
        return json.loads(b'"' + m.group(1) + b'"')
    return json.loads(raw)["index_uid"]


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
