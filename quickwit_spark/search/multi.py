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
