"""Index-management API: the reference's index/split/source REST
resources (quickwit-serve/src/index_api/*) over the manifest metastore,
driven both directly (mgmt_api functions) and over real loopback HTTP.

Covers the full lifecycle — create / list / metadata / describe /
ingest / splits / mark-for-deletion / clear / update / delete — plus
the analyze and parse-query helpers, source checkpoint resets, and the
read-only gating of every mutation route."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from quickwit_spark.index.manifest import Manifest
from quickwit_spark.search import mgmt_api as M
from quickwit_spark.search.http_api import SearchHttpServer


def _call(url, method="GET", body=None, ndjson=None):
    data = None
    if body is not None:
        data = json.dumps(body).encode()
    if ndjson is not None:
        data = "\n".join(json.dumps(x) for x in ndjson).encode()
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read() or b"null")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null")


def _config_doc(index_id="code", tokenizer="source_code_default"):
    return {
        "version": "0.8",
        "index_id": index_id,
        "doc_mapping": {
            "field_mappings": [
                {"name": "content", "type": "text",
                 "tokenizer": tokenizer, "record": "position"},
                {"name": "lang", "type": "text", "tokenizer": "raw",
                 "fast": True},
                {"name": "stars", "type": "u64", "fast": True},
            ],
            "tag_fields": ["lang"],
            "doc_id_fields": ["repo", "path", "commit"],
            "timestamp_field": "stars",
        },
        "search_settings": {"default_search_fields": ["content"]},
    }


def _docs(n, repo="r1", commit="c1", start=0):
    return [{"repo": repo, "path": f"f{start + i}.py", "commit": commit,
             "lang": "py" if i % 2 == 0 else "rs",
             "stars": 10 * (start + i),
             "content": f"def fooBar_{start + i}(): return {start + i}"}
            for i in range(n)]


@pytest.fixture()
def writable(tmp_path):
    with SearchHttpServer(str(tmp_path), writable=True) as srv:
        yield srv, str(tmp_path)


# ---------------------------------------------------------------------------
# config document translation
# ---------------------------------------------------------------------------

def test_config_roundtrip(tmp_path):
    cfg = M.config_from_json(_config_doc(), str(tmp_path))
    assert cfg.key_cols == ("repo", "path", "commit")
    assert cfg.text_col == "content"
    assert cfg.tokenizer == "source_code_default"
    assert cfg.record == "position"
    assert cfg.tag_cols == ("lang",)
    assert "stars" in cfg.store_cols
    # key/tag cols never leak into store_cols
    assert not (set(cfg.store_cols) & set(cfg.key_cols))
    assert not (set(cfg.store_cols) & set(cfg.tag_cols))
    doc2 = M.config_to_json(cfg, timestamp_field="stars")
    cfg2 = M.config_from_json(doc2, str(tmp_path))
    for attr in ("key_cols", "text_col", "tokenizer", "record",
                 "fieldnorms", "tag_cols", "field_types",
                 "partition_cols", "dynamic_col"):
        assert getattr(cfg2, attr) == getattr(cfg, attr), attr
    assert set(cfg2.store_cols) == set(cfg.store_cols)


def test_config_validation_errors(tmp_path):
    root = str(tmp_path)
    doc = _config_doc()
    del doc["doc_mapping"]["doc_id_fields"]
    # no doc key = reference-shaped config: parses through the doc
    # mapper with synthesized deterministic ids (not an error anymore)
    cfg_auto = M.config_from_json(doc, root)
    assert cfg_auto.key_cols == ("__doc_key",)
    doc = _config_doc()
    doc["doc_mapping"]["doc_id_fields"] = "repo"  # must be a list
    with pytest.raises(M.MgmtError, match="doc_id_fields"):
        M.config_from_json(doc, root)
    doc = _config_doc()
    doc["doc_mapping"]["field_mappings"][0]["tokenizer"] = "nope"
    with pytest.raises(M.MgmtError, match="unknown tokenizer"):
        M.config_from_json(doc, root)
    doc = _config_doc()
    doc["doc_mapping"]["field_mappings"][2]["type"] = "geo_point"
    with pytest.raises(M.MgmtError, match="unsupported field type"):
        M.config_from_json(doc, root)
    doc = _config_doc()
    doc["search_settings"]["default_search_fields"] = ["missing"]
    with pytest.raises(M.MgmtError, match="not a\n? ?mapped field"):
        M.config_from_json(doc, root)
    doc = _config_doc()
    doc["index_id"] = "/etc/passwd"
    with pytest.raises(M.MgmtError, match="index_id"):
        M.config_from_json(doc, root)
    doc = _config_doc()
    doc["doc_mapping"]["timestamp_field"] = "missing"
    with pytest.raises(M.MgmtError, match="timestamp_field"):
        M.config_from_json(doc, root)


def test_dynamic_and_concat_config(tmp_path):
    doc = _config_doc()
    doc["doc_mapping"]["mode"] = "dynamic"
    doc["doc_mapping"]["field_mappings"].append(
        {"name": "all", "type": "concatenate",
         "concatenate_fields": ["content", "lang"],
         "tokenizer": "default"})
    doc["search_settings"]["default_search_fields"] = ["all"]
    cfg = M.config_from_json(doc, str(tmp_path))
    assert cfg.dynamic_col == "_dynamic"
    assert cfg.text_col == "all"
    assert cfg.concat_cols == ("content", "lang")


try:
    from hypothesis import given, settings, strategies as st_
    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:
    _name = st_.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)

    @st_.composite
    def _config_docs(draw):
        names = draw(st_.lists(_name, min_size=4, max_size=9,
                               unique=True))
        text, rest = names[0], names[1:]
        n_keys = draw(st_.integers(1, min(3, len(rest) - 1)))
        keys, others = rest[:n_keys], rest[n_keys:]
        fms = [{"name": text, "type": "text",
                "tokenizer": draw(st_.sampled_from(
                    ("default", "en_stem", "source_code_default",
                     "whitespace"))),
                "record": draw(st_.sampled_from(
                    ("basic", "freq", "position"))),
                "fieldnorms": draw(st_.booleans())}]
        tag_fields = []
        for n in others:
            kind = draw(st_.sampled_from(
                ("tag", "u64", "ip", "bytes", "raw")))
            if kind == "tag":
                fms.append({"name": n, "type": "text",
                            "tokenizer": "raw", "fast": True})
                tag_fields.append(n)
            elif kind == "raw":
                fms.append({"name": n, "type": "text",
                            "tokenizer": "raw", "fast": True})
            else:
                fms.append({"name": n, "type": kind, "fast": True})
        dm = {"field_mappings": fms, "doc_id_fields": keys,
              "tag_fields": tag_fields,
              "mode": draw(st_.sampled_from(("strict", "dynamic")))}
        if draw(st_.booleans()) and others:
            dm["partition_key"] = others[0]
        return {"version": "0.8", "index_id": "ix", "doc_mapping": dm,
                "search_settings": {"default_search_fields": [text]}}

    @settings(max_examples=60, deadline=None)
    @given(_config_docs())
    def test_config_roundtrip_property(doc):
        """from_json(to_json(from_json(doc))) is a fixed point: every
        engine-relevant field survives one full round trip."""
        cfg1 = M.config_from_json(doc, "/tmp/r")
        cfg2 = M.config_from_json(M.config_to_json(cfg1), "/tmp/r")
        for attr in ("index_uid", "key_cols", "text_col", "tokenizer",
                     "record", "fieldnorms", "tag_cols", "field_types",
                     "partition_cols", "dynamic_col", "schema_rev"):
            assert getattr(cfg2, attr) == getattr(cfg1, attr), attr
        assert set(cfg2.store_cols) == set(cfg1.store_cols)


# ---------------------------------------------------------------------------
# lifecycle over HTTP
# ---------------------------------------------------------------------------

def test_create_list_metadata(writable):
    srv, root = writable
    st, meta = _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    assert st == 200 and meta["index_uid"] == "code"
    assert meta["index_config"]["doc_mapping"]["doc_id_fields"] == \
        ["repo", "path", "commit"]
    # direct call returns the same metadata view
    assert M.index_metadata(f"{root}/code")["index_config"] == \
        meta["index_config"]
    # duplicate create refused; overwrite replaces
    st, err = _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    assert st == 400 and "already exists" in err["error"]["reason"]
    st, _ = _call(f"{srv.url}/api/v1/indexes?overwrite=true", "POST",
                  _config_doc())
    assert st == 200
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc("zeta"))
    st, lst = _call(f"{srv.url}/api/v1/indexes")
    assert [m["index_uid"] for m in lst] == ["code", "zeta"]
    st, lst = _call(f"{srv.url}/api/v1/indexes?index_id_patterns=z*")
    assert [m["index_uid"] for m in lst] == ["zeta"]
    st, meta = _call(f"{srv.url}/api/v1/indexes/zeta")
    assert st == 200 and meta["index_uid"] == "zeta"
    st, err = _call(f"{srv.url}/api/v1/indexes/nope")
    assert st == 404
    assert err["error"]["type"] == "index_not_found_exception"


def test_ingest_search_describe_splits(writable):
    srv, root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    st, resp = _call(f"{srv.url}/api/v1/code/ingest", "POST",
                     ndjson=_docs(20))
    assert st == 200 and resp == {"num_docs_for_processing": 20}
    st, resp = _call(f"{srv.url}/api/v1/code/search"
                     "?query=foo+AND+bar&max_hits=5")
    assert st == 200 and resp["num_hits"] == 20

    st, desc = _call(f"{srv.url}/api/v1/indexes/code/describe")
    assert st == 200
    assert desc["num_published_docs"] == 20
    assert desc["num_published_splits"] == 1
    assert desc["timestamp_field_name"] == "stars"
    assert (desc["min_timestamp"], desc["max_timestamp"]) == (0, 190)
    assert desc["size_published_splits"] > 0
    assert desc == M.describe_index(f"{root}/code")

    # exactly-once: replaying the same payload publishes nothing
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(20))
    st, desc = _call(f"{srv.url}/api/v1/indexes/code/describe")
    assert desc["num_published_docs"] == 20

    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits")
    assert st == 200 and sp["size"] == 1 and sp["offset"] == 0
    row = sp["splits"][0]
    assert row["split_state"] == "Published"
    md = row["split_metadata"]
    assert md["num_docs"] == 20
    assert md["time_range"] == {"start": 0, "end": 190}
    assert "create_timestamp" in md
    assert any(t == "lang:py" for t in md["tags"])

    # second segment for filter coverage
    _call(f"{srv.url}/api/v1/code/ingest", "POST",
          ndjson=_docs(10, repo="r2", start=100))
    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits")
    assert sp["size"] == 2
    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits"
                   "?offset=1&limit=1")
    assert sp["offset"] == 1 and sp["size"] == 1
    # time filter: only the second segment covers stars >= 1000
    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits"
                   "?start_timestamp=1000")
    assert sp["size"] == 1
    assert sp["splits"][0]["split_metadata"]["num_docs"] == 10
    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits"
                   "?end_timestamp=200")
    assert sp["size"] == 1
    assert sp["splits"][0]["split_metadata"]["num_docs"] == 20
    # end_create_timestamp in the future matches everything
    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits"
                   "?end_create_timestamp=99999999999")
    assert sp["size"] == 2


def test_mark_for_deletion_and_clear(writable):
    srv, root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(8))
    _call(f"{srv.url}/api/v1/code/ingest", "POST",
          ndjson=_docs(4, repo="r2"))
    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits")
    sid = next(r["split_metadata"]["split_id"] for r in sp["splits"]
               if r["split_metadata"]["num_docs"] == 8)
    st, _ = _call(f"{srv.url}/api/v1/indexes/code/splits/"
                  "mark-for-deletion", "PUT", {"split_ids": [sid]})
    assert st == 200
    st, resp = _call(f"{srv.url}/api/v1/code/search"
                     "?query=foo&max_hits=30")
    assert resp["num_hits"] == 4  # retired split no longer searched
    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits"
                   "?split_states=MarkedForDeletion")
    assert sp["size"] == 1
    assert sp["splits"][0]["split_metadata"]["split_id"] == sid
    # idempotent; unknown id is a loud 400
    st, _ = _call(f"{srv.url}/api/v1/indexes/code/splits/"
                  "mark-for-deletion", "PUT", {"split_ids": [sid]})
    assert st == 200
    st, err = _call(f"{srv.url}/api/v1/indexes/code/splits/"
                    "mark-for-deletion", "PUT", {"split_ids": ["zz"]})
    assert st == 400 and "unknown segments" in err["error"]["reason"]

    st, _ = _call(f"{srv.url}/api/v1/indexes/code/clear", "PUT")
    assert st == 200
    st, desc = _call(f"{srv.url}/api/v1/indexes/code/describe")
    assert desc["num_published_docs"] == 0
    assert desc["num_published_splits"] == 0
    # config survives; checkpoints were reset so the SAME payload
    # re-ingests (clear resets every source, index.rs:457-466)
    st, resp = _call(f"{srv.url}/api/v1/code/ingest", "POST",
                     ndjson=_docs(8))
    assert resp == {"num_docs_for_processing": 8}
    st, desc = _call(f"{srv.url}/api/v1/indexes/code/describe")
    assert desc["num_published_docs"] == 8


def test_delete_index(writable):
    srv, root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(5))
    st, entries = _call(f"{srv.url}/api/v1/indexes/code?dry_run=true",
                        "DELETE")
    assert st == 200 and entries
    names = {e["file_name"] for e in entries}
    assert "manifest.json" in names and "index_config.json" in names
    assert all(isinstance(e["file_size_bytes"], int) for e in entries)
    # dry run deleted nothing
    st, _ = _call(f"{srv.url}/api/v1/indexes/code/describe")
    assert st == 200
    st, entries2 = _call(f"{srv.url}/api/v1/indexes/code", "DELETE")
    assert st == 200
    assert {e["file_name"] for e in entries2} == names
    st, _ = _call(f"{srv.url}/api/v1/indexes/code/describe")
    assert st == 404
    st, _ = _call(f"{srv.url}/api/v1/code/search?query=foo")
    assert st == 404


def test_update_doc_mapping_over_http(writable):
    srv, root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(6))
    # identity-level changes are refused
    bad = _config_doc()
    bad["doc_mapping"]["doc_id_fields"] = ["repo"]
    st, err = _call(f"{srv.url}/api/v1/indexes/code", "PUT", bad)
    assert st == 400 and "cannot be updated" in err["error"]["reason"]
    # analysis change bumps the mapping generation
    st, meta = _call(f"{srv.url}/api/v1/indexes/code", "PUT",
                     _config_doc(tokenizer="default"))
    assert st == 200
    rev2 = meta["index_config"]["schema_rev"]
    assert rev2 != "v1"
    docs2 = [{"repo": "r9", "path": f"h{i}.py", "commit": "c9",
              "lang": "py", "stars": 1,
              "content": f"fooBar_{i} alpha"} for i in range(3)]
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=docs2)
    # old generation still matches sub-tokens; new generation keeps
    # `foobar_0` whole (default tokenizer) — both served in one search
    st, resp = _call(f"{srv.url}/api/v1/code/search"
                     "?query=foo&max_hits=30")
    assert resp["num_hits"] == 6
    st, resp = _call(f"{srv.url}/api/v1/code/search"
                     "?query=foobar_0&max_hits=30")
    assert resp["num_hits"] == 1
    # per-generation revs visible in the split listing
    st, sp = _call(f"{srv.url}/api/v1/indexes/code/splits")
    revs = {r["split_metadata"]["doc_mapping_uid"] for r in sp["splits"]}
    assert revs == {"v1", rev2}
    # PUT ?create=true creates a missing index
    st, meta = _call(f"{srv.url}/api/v1/indexes/fresh?create=true",
                     "PUT", _config_doc("fresh"))
    assert st == 200 and meta["index_uid"] == "fresh"
    st, _ = _call(f"{srv.url}/api/v1/indexes/fresh")
    assert st == 200
    # without create, a missing index 404s
    st, _ = _call(f"{srv.url}/api/v1/indexes/nope", "PUT",
                  _config_doc("nope"))
    assert st == 404


def test_reset_source_checkpoint(writable):
    srv, root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(4))
    m = Manifest.load(f"{root}/code")
    keys = list(m.data["checkpoints"])
    assert keys and all(k.startswith("bulk-") for k in keys)
    st, resp = _call(f"{srv.url}/api/v1/indexes/code/sources/bulk/"
                     "reset-checkpoint", "PUT")
    assert st == 200 and sorted(resp["removed_checkpoints"]) == \
        sorted(keys)
    assert Manifest.load(f"{root}/code").data["checkpoints"] == {}
    # replaying the SAME payload after a reset converges onto the same
    # content-addressed segment id — no duplicate docs (stronger than
    # the reference, whose replayed split gets a fresh ULID); the
    # checkpoint is re-recorded
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(4))
    st, desc = _call(f"{srv.url}/api/v1/indexes/code/describe")
    assert desc["num_published_docs"] == 4
    assert Manifest.load(f"{root}/code").data["checkpoints"]
    # DIFFERENT content after the reset does publish
    _call(f"{srv.url}/api/v1/code/ingest", "POST",
          ndjson=_docs(4, repo="r2"))
    st, desc = _call(f"{srv.url}/api/v1/indexes/code/describe")
    assert desc["num_published_docs"] == 8


def test_reset_builder_checkpoints_ownership(tmp_path):
    """`_builder` resets only integer keys with builder positions and
    releases the router claim; stream/bulk keys survive."""
    d = str(tmp_path / "ix")
    m = Manifest.create(d, "ix", {"text_col": "content"})
    m.claim_router("spark-xxhash64:4")
    m.publish([], checkpoint_delta={
        0: (None, "docs=10"), 1: (None, "docs=5"),
        "stream-0": (None, "batch=1;n=3"),
        "bulk-ab": (None, "done")})
    removed = m.reset_checkpoints("_builder")
    assert sorted(removed) == ["0", "1"]
    m2 = Manifest.load(d)
    assert set(m2.data["checkpoints"]) == {"stream-0", "bulk-ab"}
    assert "router" not in m2.data
    # a fresh router claim succeeds now
    m2.claim_router("pandas-sha256:4")
    assert m2.reset_checkpoints("_all") == ["bulk-ab", "stream-0"]
    assert Manifest.load(d).data["checkpoints"] == {}


def test_read_only_gating(tmp_path):
    with SearchHttpServer(str(tmp_path), writable=True) as srv:
        _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    with SearchHttpServer(str(tmp_path)) as srv:
        for method, path, body in [
                ("POST", "/api/v1/indexes", _config_doc("x2")),
                ("PUT", "/api/v1/indexes/code", _config_doc()),
                ("DELETE", "/api/v1/indexes/code", None),
                ("PUT", "/api/v1/indexes/code/clear", None),
                ("PUT", "/api/v1/indexes/code/splits/"
                        "mark-for-deletion", {"split_ids": ["a"]}),
                ("PUT", "/api/v1/indexes/code/sources/bulk/"
                        "reset-checkpoint", None),
        ]:
            st, err = _call(f"{srv.url}{path}", method, body)
            assert st == 403, (method, path)
            assert err["error"]["type"] == "cluster_block_exception"
        st, _ = _call(f"{srv.url}/api/v1/code/ingest", "POST",
                      ndjson=_docs(1))
        assert st == 403
        # reads still work
        st, lst = _call(f"{srv.url}/api/v1/indexes")
        assert st == 200 and len(lst) == 1


def test_update_tag_fields_refused(writable):
    srv, _root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    doc = _config_doc()
    doc["doc_mapping"]["tag_fields"] = []
    st, err = _call(f"{srv.url}/api/v1/indexes/code", "PUT", doc)
    assert st == 400 and "tag_fields" in err["error"]["reason"]


def test_config_load_after_directory_rename(tmp_path):
    """A renamed/copied index directory must win over the index_dir the
    config doc was saved under — otherwise ingest writes to the old
    path (or recreates it)."""
    import shutil
    M.create_index(str(tmp_path), _config_doc())
    shutil.move(str(tmp_path / "code"), str(tmp_path / "moved"))
    cfg = M.load_index_config(str(tmp_path / "moved"))
    assert cfg.index_dir == str(tmp_path / "moved")


def test_ingest_missing_fields_is_loud(writable):
    srv, _root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    st, err = _call(f"{srv.url}/api/v1/code/ingest", "POST",
                    ndjson=[{"repo": "r", "content": "x"}])
    assert st == 400
    assert "missing required fields" in err["error"]["reason"]
    assert "'commit'" in err["error"]["reason"]


def test_vanished_index_mid_request(writable):
    """Deleting the index files behind the server's back returns an
    HTTP error, not a dead socket."""
    import shutil
    srv, root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(3))
    st, _ = _call(f"{srv.url}/api/v1/code/search?query=foo")
    assert st == 200  # searcher now cached
    shutil.rmtree(f"{root}/code")
    st, err = _call(f"{srv.url}/api/v1/code/search?query=foo")
    assert st in (404, 400)
    assert "error" in err


def test_delete_tasks_lifecycle(writable):
    """POST records a pending task (the reference queues for its
    janitor), the explicit janitor pass executes in opstamp order, and
    re-running is a no-op (delete_task_api/handler.rs)."""
    srv, root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(10))
    # invalid requests are loud
    st, _ = _call(f"{srv.url}/api/v1/code/delete-tasks", "POST", {})
    assert st == 400
    st, task = _call(f"{srv.url}/api/v1/code/delete-tasks", "POST",
                     {"query": "lang:rs"})
    assert st == 200 and task["opstamp"] == 1
    assert task["status"] == "pending"
    dq = task["delete_query"]
    assert dq["index_uid"] == "code"
    ast = json.loads(dq["query_ast"])
    assert ast == {"type": "full_text", "field": "lang", "text": "rs",
                   "params": {"mode": {"type": "bool",
                                       "operator": "and"}}}
    # time-bounded task folds the configured timestamp field in
    st, t2 = _call(f"{srv.url}/api/v1/code/delete-tasks", "POST",
                   {"query": "foo", "start_timestamp": 80})
    assert st == 200 and t2["opstamp"] == 2
    st, tasks = _call(f"{srv.url}/api/v1/code/delete-tasks")
    assert [t["opstamp"] for t in tasks] == [1, 2]
    # nothing deleted until the janitor pass runs
    st, resp = _call(f"{srv.url}/api/v1/code/search?query=foo"
                     "&max_hits=30")
    assert resp["num_hits"] == 10
    st, res = _call(f"{srv.url}/api/v1/code/delete-tasks/execute",
                    "PUT")
    assert st == 200 and res["tasks_executed"] == 2
    # task 1 removed the 5 lang:rs docs; task 2 removed stars>=80
    # among the survivors (stars 10*i, lang rs on odd i -> survivors
    # i in {0,2,4,6,8}, stars>=80 -> i=8): 10 - 5 - 1 = 4 left
    assert res["docs_deleted"] == 6
    st, resp = _call(f"{srv.url}/api/v1/code/search?query=foo"
                     "&max_hits=30")
    assert resp["num_hits"] == 4
    st, tasks = _call(f"{srv.url}/api/v1/code/delete-tasks")
    assert all(t["status"] == "done" for t in tasks)
    assert tasks[0]["result"]["docs_deleted"] == 5
    # idempotent re-run
    st, res = _call(f"{srv.url}/api/v1/code/delete-tasks/execute",
                    "PUT")
    assert res == {"tasks_executed": 0, "docs_deleted": 0}
    # read-only gating
    with SearchHttpServer(root) as ro:
        st, _ = _call(f"{ro.url}/api/v1/code/delete-tasks", "POST",
                      {"query": "x"})
        assert st == 403
        st, _ = _call(f"{ro.url}/api/v1/code/delete-tasks/execute",
                      "PUT")
        assert st == 403
        st, tasks = _call(f"{ro.url}/api/v1/code/delete-tasks")
        assert st == 200 and len(tasks) == 2


def _call_ct(url, method, data, ctype):
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, None, e.read()


def test_otlp_http_ingest(writable):
    """OTLP/HTTP ingestion (otlp_api/rest_handler.rs): protobuf and
    JSON encodings land identical rows in the auto-created OTEL index;
    identical payload replay is a publish no-op; attributes are
    queryable through the dynamic mapping; responses mirror the
    request encoding."""
    from quickwit_spark.pipeline import otlp_pb
    srv, root = writable
    payload = {"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name",
             "value": {"stringValue": "checkout"}}]},
        "scopeLogs": [{"scope": {"name": "lib", "version": "1.0"},
                       "logRecords": [
            {"timeUnixNano": "1700000000000000000",
             "severityText": "ERROR", "severityNumber": 17,
             "body": {"stringValue": "payment failed badly"},
             "attributes": [{"key": "http.status_code",
                             "value": {"intValue": "502"}}],
             "traceId": "0102030405060708090a0b0c0d0e0f10",
             "spanId": "0102030405060708"},
            {"timeUnixNano": "1700000001000000000",
             "severityText": "INFO", "severityNumber": 9,
             "body": {"stringValue": "payment retried"}}]}]}]}
    pb = otlp_pb.encode_logs_request(payload)
    st, ct, body = _call_ct(f"{srv.url}/api/v1/otlp/v1/logs", "POST",
                            pb, "application/x-protobuf")
    # empty Export*ServiceResponse protobuf = full success
    assert (st, ct, body) == (200, "application/x-protobuf", b"")
    st, desc = _call(f"{srv.url}/api/v1/indexes/otel-logs-v0_9/"
                     "describe")
    assert st == 200 and desc["num_published_docs"] == 2
    # identical payload replay is a no-op
    _call_ct(f"{srv.url}/api/v1/otlp/v1/logs", "POST",
             pb, "application/x-protobuf")
    st, desc = _call(f"{srv.url}/api/v1/indexes/otel-logs-v0_9/"
                     "describe")
    assert desc["num_published_docs"] == 2
    # search: body text, tag, dynamic attribute path, numeric range
    # over the dynamic attr (dynamic_num_key), time fast field
    for q, n in [("payment", 2), ("severity_text:ERROR", 1),
                 ("attributes.http.status_code:502", 1),
                 ("resource.service.name:checkout", 2),
                 ("timestamp_nanos:[1700000000500000000 TO *]", 1)]:
        st, resp = _call(f"{srv.url}/api/v1/otel-logs-v0_9/search"
                         f"?query={urllib.parse.quote(q)}&max_hits=5")
        assert (st, resp["num_hits"]) == (200, n), q
    # JSON encoding: same rows (parity-pinned encode/decode), JSON
    # response; different payload bytes = new deterministic keys, so
    # this is a second batch (the reference's at-least-once ingest)
    st, ct, body = _call_ct(f"{srv.url}/api/v1/otlp/v1/logs", "POST",
                            json.dumps(payload).encode(),
                            "application/json")
    assert (st, json.loads(body)) == (200, {})
    st, desc = _call(f"{srv.url}/api/v1/indexes/otel-logs-v0_9/"
                     "describe")
    assert desc["num_published_docs"] == 4
    # traces signal + index-scoped route
    tr = {"resourceSpans": [{
        "resource": {"attributes": [
            {"key": "service.name",
             "value": {"stringValue": "checkout"}}]},
        "scopeSpans": [{"spans": [
            {"traceId": "0102030405060708090a0b0c0d0e0f10",
             "spanId": "0102030405060708", "name": "charge card",
             "kind": 2, "startTimeUnixNano": "1700000000000000000",
             "endTimeUnixNano": "1700000000500000000"}]}]}]}
    st, ct, _b = _call_ct(f"{srv.url}/api/v1/mytraces/otlp/v1/traces",
                          "POST", otlp_pb.encode_spans_request(tr),
                          "application/x-protobuf")
    assert st == 200
    st, resp = _call(f"{srv.url}/api/v1/mytraces/search?query=charge")
    assert resp["num_hits"] == 1
    # the auto-created index is fully manageable (config persisted)
    st, meta = _call(f"{srv.url}/api/v1/indexes/mytraces")
    assert st == 200
    assert meta["index_config"]["doc_mapping"]["mode"] == "dynamic"
    # hostile payload is a loud 400; read-only server refuses
    st, _, body = _call_ct(f"{srv.url}/api/v1/otlp/v1/logs", "POST",
                           b"\xff\xfe\x01garbage",
                           "application/x-protobuf")
    assert st == 400 and b"parsing_exception" in body
    st, _, _b = _call_ct(f"{srv.url}/api/v1/otlp/v1/logs", "POST",
                         pb, "text/plain")
    assert st == 400
    with SearchHttpServer(root) as ro:
        st, _, _b = _call_ct(f"{ro.url}/api/v1/otlp/v1/logs", "POST",
                             pb, "application/x-protobuf")
        assert st == 403


def _template_doc(tid="logs-tpl", patterns=("logs-*",), priority=0):
    return {"template_id": tid, "index_id_patterns": list(patterns),
            "priority": priority,
            "doc_mapping": _config_doc()["doc_mapping"],
            "search_settings": {"default_search_fields": ["content"]}}


def test_index_templates(writable):
    """Template CRUD + auto-create on ingest to a matching index id
    (template_api/rest_handler.rs; IndexTemplate::apply_template)."""
    srv, root = writable
    st, t = _call(f"{srv.url}/api/v1/templates", "POST",
                  _template_doc(patterns=["logs-*", "-logs-secret*"],
                                priority=5))
    assert st == 200 and t["template_id"] == "logs-tpl"
    # duplicate POST refused; PUT upserts; invalid template refused
    st, _ = _call(f"{srv.url}/api/v1/templates", "POST",
                  _template_doc())
    assert st == 400
    st, _ = _call(f"{srv.url}/api/v1/templates/logs-tpl", "PUT",
                  _template_doc(patterns=["logs-*", "-logs-secret*"],
                                priority=5))
    assert st == 200
    bad = _template_doc(tid="bad")
    bad["doc_mapping"]["field_mappings"][0]["tokenizer"] = "nope"
    st, err = _call(f"{srv.url}/api/v1/templates", "POST", bad)
    assert st == 400 and "unknown tokenizer" in err["error"]["reason"]
    st, lst = _call(f"{srv.url}/api/v1/templates")
    assert [t["template_id"] for t in lst] == ["logs-tpl"]
    # ingest to a matching, missing index auto-creates it
    st, r = _call(f"{srv.url}/api/v1/logs-app1/ingest", "POST",
                  ndjson=_docs(4))
    assert st == 200 and r == {"num_docs_for_processing": 4}
    st, r = _call(f"{srv.url}/api/v1/logs-app1/search?query=foo")
    assert r["num_hits"] == 4
    st, meta = _call(f"{srv.url}/api/v1/indexes/logs-app1")
    assert st == 200  # fully manageable, config persisted
    # exclusion pattern and non-matching ids do NOT auto-create
    for bad_id in ("logs-secret1", "other"):
        st, _ = _call(f"{srv.url}/api/v1/{bad_id}/ingest", "POST",
                      ndjson=_docs(1))
        assert st == 403, bad_id
    # priority: higher wins
    hi = _template_doc(tid="hi-tpl", patterns=["logs-*"], priority=9)
    hi["doc_mapping"] = dict(hi["doc_mapping"],
                             tag_fields=[])  # distinguishable
    _call(f"{srv.url}/api/v1/templates", "POST", hi)
    assert M.find_template(root, "logs-x")["template_id"] == "hi-tpl"
    st, _ = _call(f"{srv.url}/api/v1/templates/logs-tpl", "DELETE")
    assert st == 200
    st, _ = _call(f"{srv.url}/api/v1/templates/logs-tpl")
    assert st == 404
    # read-only gating
    with SearchHttpServer(root) as ro:
        st, _ = _call(f"{ro.url}/api/v1/templates", "POST",
                      _template_doc(tid="x"))
        assert st == 403
        st, lst = _call(f"{ro.url}/api/v1/templates")
        assert st == 200 and len(lst) == 1


def test_gzip_bodies_and_node_endpoints(writable):
    """Content-Encoding support (decompression.rs analog): gzip/deflate
    bodies on any route, bounded during inflation; node endpoints."""
    import gzip
    import zlib
    srv, _root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    nd = "\n".join(json.dumps(d) for d in _docs(3)).encode()
    st, _, body = _call_ct(f"{srv.url}/api/v1/code/ingest", "POST",
                           gzip.compress(nd), "application/json")
    # header routing: Content-Encoding, not Content-Type
    req = urllib.request.Request(
        f"{srv.url}/api/v1/code/ingest", data=gzip.compress(nd),
        method="POST", headers={"Content-Encoding": "gzip"})
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read()) == {"num_docs_for_processing": 3}
    # deflate on an ES route
    q = zlib.compress(b'{"query": {"match_all": {}}}')
    req = urllib.request.Request(
        f"{srv.url}/api/v1/_elastic/code/_count", data=q,
        method="POST", headers={"Content-Encoding": "deflate",
                                "Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["count"] == 3
    # a 300 MB bomb is refused DURING inflation (413), corrupt is 400
    bomb = gzip.compress(b"\0" * (300 * 1024 * 1024))
    req = urllib.request.Request(
        f"{srv.url}/api/v1/code/ingest", data=bomb, method="POST",
        headers={"Content-Encoding": "gzip"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "bomb accepted"
    except urllib.error.HTTPError as e:
        assert e.code == 413
    req = urllib.request.Request(
        f"{srv.url}/api/v1/code/ingest", data=b"notgzip",
        method="POST", headers={"Content-Encoding": "gzip"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "corrupt accepted"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown encoding
    req = urllib.request.Request(
        f"{srv.url}/api/v1/code/ingest", data=b"x", method="POST",
        headers={"Content-Encoding": "br"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 415
    # node endpoints (node_info_handler / health_check / cluster)
    st, v = _call(f"{srv.url}/api/v1/version")
    assert st == 200 and "version" in v["build"]
    for probe in ("livez", "readyz"):
        st, ok = _call(f"{srv.url}/health/{probe}")
        assert (st, ok) == (200, True)
    st, c = _call(f"{srv.url}/api/v1/cluster")
    assert st == 200 and "code" in c["indexes"]


def test_search_plan_route(writable):
    """GET/POST /{index}/search-plan (search_api/rest_handler.rs:
    312-330): the plan without execution, pinned to engine.explain."""
    from quickwit_spark.search.engine import IndexSearcher
    srv, root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(6))
    st, plan = _call(f"{srv.url}/api/v1/code/search-plan"
                     "?query=foo+AND+bar")
    assert st == 200
    assert plan["segments_total"] == 1
    direct = IndexSearcher(f"{root}/code").explain("foo AND bar")
    assert plan == json.loads(json.dumps(direct))  # tuples -> lists
    st, plan2 = _call(f"{srv.url}/api/v1/code/search-plan", "POST",
                      {"query": "stars:[100 TO *]"})
    assert st == 200 and "query_ast" in plan2
    st, _ = _call(f"{srv.url}/api/v1/code/search-plan", "POST", {})
    assert st == 400


def test_prometheus_metrics(writable):
    """GET /metrics (metrics_api.rs): the reference's serve metrics in
    Prometheus text format — request counters by method/status, a
    duration histogram with the exponential bucket ladder, ongoing
    gauges by endpoint group."""
    srv, _root = writable
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc())
    _call(f"{srv.url}/api/v1/code/ingest", "POST", ndjson=_docs(2))
    _call(f"{srv.url}/api/v1/code/search?query=foo")
    _call(f"{srv.url}/api/v1/nope/search?query=x")  # a 404
    req = urllib.request.Request(f"{srv.url}/metrics")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers.get("Content-Type").startswith("text/plain")
        text = r.read().decode()
    assert '# TYPE quickwit_http_requests_total counter' in text
    assert 'quickwit_http_requests_total{method="POST",' \
           'status_code="200"}' in text
    assert 'status_code="404"' in text
    assert 'quickwit_request_duration_secs_bucket{method="GET",' in text
    assert 'le="+Inf"' in text
    # histogram invariant: count == +Inf bucket, sum present
    assert "quickwit_request_duration_secs_count" in text
    assert "quickwit_request_duration_secs_sum" in text
    # all requests finished: every ongoing gauge shows 0 except the
    # /metrics request currently being served
    for line in text.splitlines():
        if line.startswith("quickwit_ongoing_requests"):
            val = int(line.rsplit(" ", 1)[1])
            assert val == (1 if 'endpoint_group="admin"' in line
                           else 0), line


def test_review_fixes_traversal_and_contracts(writable, tmp_path):
    """Regression tests for the session's code-review findings."""
    import os
    srv, root = writable
    # 1. path traversal via the index-scoped OTLP route is refused and
    #    writes nothing outside root_dir
    from quickwit_spark.pipeline import otlp_pb, otlp_ingest
    payload = otlp_pb.encode_logs_request({"resourceLogs": [
        {"scopeLogs": [{"logRecords": [
            {"body": {"stringValue": "x"}}]}]}]})
    st, _, body = _call_ct(
        f"{srv.url}/api/v1/..%2Fescaped/otlp/v1/logs", "POST",
        payload, "application/x-protobuf")
    assert st == 400
    with pytest.raises(ValueError, match="invalid index id"):
        otlp_ingest.ingest_otlp(root, "logs", payload,
                                index_id="../escaped")
    assert not os.path.exists(os.path.join(os.path.dirname(root),
                                           "escaped"))
    # ...and via ingest/search routes
    for path in ("..%2Fx/ingest", "..%2Fx/search"):
        st, _ = _call(f"{srv.url}/api/v1/{path}",
                      "POST" if "ingest" in path else "GET",
                      ndjson=[{"a": 1}] if "ingest" in path else None)
        assert st == 400, path
    # 2. OTLP ingest into an existing foreign-mapped index is refused
    _call(f"{srv.url}/api/v1/indexes", "POST", _config_doc("app"))
    st, _, body = _call_ct(f"{srv.url}/api/v1/app/otlp/v1/logs",
                           "POST", payload, "application/x-protobuf")
    assert st == 400 and b"different doc mapping" in body
    # 3. reserved route words cannot become index ids
    st, err = _call(f"{srv.url}/api/v1/indexes", "POST",
                    _config_doc("templates"))
    assert st == 400 and "reserved" in err["error"]["reason"]
    # 4. a template named 'search' stays readable (route no longer
    #    shadowed by native search)
    _call(f"{srv.url}/api/v1/templates", "POST",
          _template_doc(tid="search", patterns=["zz-*"]))
    st, t = _call(f"{srv.url}/api/v1/templates/search")
    assert st == 200 and t["template_id"] == "search"
    # 5. PUT ?create=true accepts a config without index_id
    doc = _config_doc("ignored")
    del doc["index_id"]
    st, meta = _call(f"{srv.url}/api/v1/indexes/fresh2?create=true",
                     "PUT", doc)
    assert st == 200 and meta["index_uid"] == "fresh2"
    # 6. oversized Content-Length is refused before buffering
    req = urllib.request.Request(
        f"{srv.url}/api/v1/app/ingest", data=b"x", method="POST",
        headers={"Content-Length": str(500 * 1024 * 1024)})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except (urllib.error.HTTPError, ConnectionError, OSError) as e:
        assert not isinstance(e, urllib.error.HTTPError) \
            or e.code == 413


# ---------------------------------------------------------------------------
# analyze + parse-query
# ---------------------------------------------------------------------------

def test_analyze_spans_and_parity(writable):
    srv, _root = writable
    from quickwit_spark.functions.tokenizers import (ascii_fold,
                                                     tokenize_one)
    text = "getFooBar x9_test Ünïcode\tsplit"
    for tok in ("source_code_default", "source_code_with_hex",
                "default", "en_stem", "whitespace", "raw"):
        st, rows = _call(f"{srv.url}/api/v1/analyze", "POST",
                         {"text": text, "tokenizer": tok})
        assert st == 200, tok
        assert [r["text"] for r in rows] == tokenize_one(text, tok), tok
        assert [r["position"] for r in rows] == list(range(len(rows)))
        # offsets are exact spans of the source text where present
        # (token text = fold(lower(span)) modulo stemming)
        for r in rows:
            if r["offset_from"] is None:
                continue
            span = text[r["offset_from"]:r["offset_to"]]
            if tok in ("default", "en_stem") \
                    or tok.startswith("source_code"):
                span = span.lower()  # whitespace/raw keep case
            if tok.startswith("source_code"):
                span = ascii_fold(span)  # only these analyzers fold
            assert r["text"] == span or tok == "en_stem", (tok, r, span)
    # default tokenizer: spans reproduce the token exactly
    st, rows = _call(f"{srv.url}/api/v1/analyze", "POST",
                     {"text": "Hello,World_x", "tokenizer": "default"})
    assert [(r["text"],
             "Hello,World_x"[r["offset_from"]:r["offset_to"]].lower())
            for r in rows] == [(r["text"], r["text"]) for r in rows]
    # CJK composite emission: no offsets, but tokens match
    st, rows = _call(f"{srv.url}/api/v1/analyze", "POST",
                     {"text": "你好世界", "tokenizer": "chinese_compatible"})
    assert st == 200
    assert [r["text"] for r in rows] == \
        tokenize_one("你好世界", "chinese_compatible")
    assert all(r["offset_from"] is None for r in rows)
    st, err = _call(f"{srv.url}/api/v1/analyze", "POST",
                    {"text": "x", "tokenizer": "nope"})
    assert st == 400
    st, err = _call(f"{srv.url}/api/v1/analyze", "POST", {})
    assert st == 400


def test_parse_query_json(writable):
    srv, _root = writable
    st, ast = _call(f"{srv.url}/api/v1/parse-query", "POST",
                    {"query": "(foo AND bar) OR lang:py"})
    assert st == 200 and ast["type"] == "bool"
    inner = ast["should"][0]
    assert inner["type"] == "bool"
    assert [c["text"] for c in inner["must"]] == ["foo", "bar"]
    assert all(c["type"] == "full_text" for c in inner["must"])
    st, ast = _call(f"{srv.url}/api/v1/parse-query", "POST",
                    {"query": "stars:[10 TO 20}"})
    assert ast == {"type": "range", "field": "stars",
                   "lower_bound": {"included": "10"},
                   "upper_bound": {"excluded": "20"}}
    st, ast = _call(f"{srv.url}/api/v1/parse-query", "POST",
                    {"query": '"exact phrase"~2'})
    assert ast["params"]["mode"] == {"type": "phrase", "slop": 2}
    # multi-field: OR over per-field parses
    st, ast = _call(f"{srv.url}/api/v1/parse-query", "POST",
                    {"query": "foo", "search_field": ["a", "b"]})
    assert ast["type"] == "bool"
    assert [c["field"] for c in ast["should"]] == ["a", "b"]
    st, ast = _call(f"{srv.url}/api/v1/parse-query", "POST",
                    {"query": "*"})
    assert ast == {"type": "match_all"}
    st, _ = _call(f"{srv.url}/api/v1/parse-query", "POST", {})
    assert st == 400
