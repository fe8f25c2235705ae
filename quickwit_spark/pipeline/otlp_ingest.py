"""OTLP HTTP ingestion: the reference's OTLP service endpoints
(`POST /api/v1/otlp/v1/{logs,traces}` and the `{index}`-scoped
variants, quickwit-serve/src/otlp_api/rest_handler.rs) bridged onto
the engine's bulk build path.

Payloads are the OTLP/HTTP bindings: `application/x-protobuf`
(ExportLogsServiceRequest / ExportTraceServiceRequest, decoded by the
dependency-free pipeline/otlp_pb.py wire decoder) or
`application/json` (the spec's JSON encoding — routed through
encode_*_request -> decode_*_request, whose equivalence with the
Spark from_json path is already parity-pinned in tests/test_otlp_pb).

Indexes auto-create on first ingest like the reference's
OtlpGrpcLogsService (logs.rs:205-214): `otel-logs-v0_9` /
`otel-traces-v0_9` (logs.rs:44, traces.rs OTEL_TRACES_INDEX_ID), with
a doc mapping mirroring the reference's OTEL index configs — body /
span_name indexed, severity + service tags, timestamp fast fields for
range pruning, and attributes under the DYNAMIC column so
`attrs.attributes.<key>:<value>` term queries work without schema
changes (the reference maps attributes as a dynamic JSON field too).

Divergence, by design: the reference autogenerates ULID doc ids; this
engine's ids must be deterministic (replayable builds, exactly-once
checkpoints), so each record's key is the sha of (payload sha, record
ordinal). Replaying an identical payload is therefore a checkpoint
no-op instead of a duplicate batch — strictly stronger than the
reference's at-least-once OTLP ingestion.
"""

from __future__ import annotations

import hashlib
import json
import os

from ..config import IndexConfig
from . import otlp_pb

__all__ = ["OTEL_LOGS_INDEX_ID", "OTEL_TRACES_INDEX_ID",
           "otel_logs_config", "otel_traces_config", "ingest_otlp"]

# the reference's current OTEL index generation (logs.rs:44)
OTEL_LOGS_INDEX_ID = "otel-logs-v0_9"
OTEL_TRACES_INDEX_ID = "otel-traces-v0_9"


def otel_logs_config(root_dir: str,
                     index_id: str = OTEL_LOGS_INDEX_ID) -> IndexConfig:
    """Doc mapping mirroring the reference's OTEL_LOGS_INDEX_CONFIG
    (logs.rs:47-130): body indexed with the default tokenizer,
    severity_text + service_name as tags, nanosecond timestamps as
    numeric fast fields (range pruning), ids/scope stored, attributes
    dynamic."""
    return IndexConfig(
        index_uid=index_id,
        index_dir=os.path.join(root_dir, index_id),
        key_cols=("_otlp_key",),
        text_col="body_message",
        tokenizer="default",
        tag_cols=("severity_text", "service_name"),
        sha_col=None,
        # body_message is stored as well as indexed (the reference's
        # OTEL doc store keeps the full record for fetch)
        store_cols=("timestamp_nanos", "observed_timestamp_nanos",
                    "severity_number", "trace_id", "span_id",
                    "scope_name", "body_message"),
        dynamic_col="attrs",
        record="freq",
    )


def otel_traces_config(root_dir: str,
                       index_id: str = OTEL_TRACES_INDEX_ID
                       ) -> IndexConfig:
    """Doc mapping mirroring OTEL_TRACES_INDEX_CONFIG (traces.rs):
    span_name indexed, service as tag, span timing as numeric fast
    fields, span ids stored, span_attributes dynamic."""
    return IndexConfig(
        index_uid=index_id,
        index_dir=os.path.join(root_dir, index_id),
        key_cols=("_otlp_key",),
        text_col="span_name",
        tokenizer="default",
        tag_cols=("service_name",),
        sha_col=None,
        # span_name is stored as well as indexed: the Jaeger layer
        # (GetOperations, exact operation filters) reads it back
        store_cols=("trace_id", "span_id", "parent_span_id",
                    "span_kind", "span_start_timestamp_nanos",
                    "span_end_timestamp_nanos", "span_duration_millis",
                    "span_status_code", "span_attributes_json",
                    "span_name"),
        dynamic_col="attrs",
        record="freq",
    )


def _decode(kind: str, data: bytes, content_type: str) -> list[dict]:
    if kind == "logs":
        decode, encode = (otlp_pb.decode_logs_request,
                          otlp_pb.encode_logs_request)
    else:
        decode, encode = (otlp_pb.decode_spans_request,
                          otlp_pb.encode_spans_request)
    ct = (content_type or "").split(";")[0].strip().lower()
    if ct == "application/json":
        payload = json.loads(data)
        if not isinstance(payload, dict):
            raise ValueError("OTLP JSON payload must be an object")
        # JSON -> wire -> rows: the encode/decode pair is parity-pinned
        # against the Spark from_json path, so both content types
        # produce byte-identical row dicts
        return decode(encode(payload))
    if ct in ("application/x-protobuf", "application/protobuf", ""):
        return decode(data)
    raise ValueError(f"unsupported content type {content_type!r} "
                     "(expected application/x-protobuf or "
                     "application/json)")


def _docs_from_rows(kind: str, rows: list[dict],
                    payload_sha: str) -> list[dict]:
    docs = []
    for i, r in enumerate(rows):
        key = hashlib.sha256(
            f"{payload_sha}:{i}".encode()).hexdigest()[:32]
        if kind == "logs":
            doc = {
                "_otlp_key": key,
                "body_message": r.get("body_message") or "",
                "severity_text": r.get("severity_text") or "",
                "service_name": r.get("service_name") or "",
                "timestamp_nanos": r.get("timestamp_nanos"),
                "observed_timestamp_nanos":
                    r.get("observed_timestamp_nanos"),
                "severity_number": r.get("severity_number"),
                "trace_id": r.get("trace_id"),
                "span_id": r.get("span_id"),
                "scope_name": r.get("scope_name"),
                "attrs": {
                    "attributes": r.get("attributes") or {},
                    "resource": r.get("resource_attributes") or {},
                },
            }
        else:
            doc = {
                "_otlp_key": key,
                "span_name": r.get("span_name") or "",
                "service_name": r.get("service_name") or "",
                "trace_id": r.get("trace_id"),
                "span_id": r.get("span_id"),
                "parent_span_id": r.get("parent_span_id"),
                "span_kind": r.get("span_kind"),
                "span_start_timestamp_nanos":
                    r.get("span_start_timestamp_nanos"),
                "span_end_timestamp_nanos":
                    r.get("span_end_timestamp_nanos"),
                "span_duration_millis": r.get("span_duration_millis"),
                "span_status_code": r.get("span_status_code"),
                # stored copy feeds the Jaeger span tags on fetch; the
                # dynamic copy makes attribute paths term-searchable
                "span_attributes_json": json.dumps(
                    r.get("span_attributes") or {}, sort_keys=True),
                "attrs": {"attributes": r.get("span_attributes") or {}},
            }
        docs.append(doc)
    return docs


def ingest_otlp(root_dir: str, kind: str, data: bytes,
                content_type: str = "application/x-protobuf",
                index_id: str | None = None) -> dict:
    """Decode one OTLP export request and index its records.

    Returns {"num_records", "index_id"}. The index auto-creates on
    first use (OtlpGrpcLogsService::initialize analog); an explicit
    index_id serves the reference's `{index}/otlp/v1/...` routes.
    Replaying an identical payload is a publish no-op (the bulk path's
    content-addressed checkpoint)."""
    if kind not in ("logs", "traces"):
        raise ValueError(f"unknown OTLP signal {kind!r}")
    from ..index.manifest import Manifest
    from ..search.mgmt_api import _INDEX_ID_RE
    if index_id is not None and not _INDEX_ID_RE.match(index_id):
        raise ValueError(f"invalid index id {index_id!r}")
    rows = _decode(kind, data, content_type)
    cfg = (otel_logs_config(root_dir, index_id or OTEL_LOGS_INDEX_ID)
           if kind == "logs"
           else otel_traces_config(root_dir,
                                   index_id or OTEL_TRACES_INDEX_ID))
    first_ingest = not os.path.isfile(Manifest.path(cfg.index_dir))
    if not first_ingest:
        # the target EXISTS: refuse unless its mapping is the OTEL one
        # — es_bulk's load_or_create would otherwise publish
        # OTEL-schema segments into a foreign index whose manifest
        # config (text col, doc id fields) disagrees with the docs
        mc = Manifest.load(cfg.index_dir).data.get("config", {})
        want = cfg.manifest_config()
        for k in ("text_col", "key_cols"):
            if mc.get(k) != want[k]:
                raise ValueError(
                    f"index {cfg.index_uid!r} exists with a different "
                    f"doc mapping ({k}={mc.get(k)!r}); OTLP ingest "
                    "targets OTEL-mapped indexes only — pick another "
                    "index id")
    if not rows:
        return {"num_records": 0, "index_id": cfg.index_uid}
    payload_sha = hashlib.sha256(data).hexdigest()
    docs = _docs_from_rows(kind, rows, payload_sha)
    from ..search.es_dsl import es_bulk
    lines: list[dict] = []
    for d in docs:
        lines.append({"index": {}})
        lines.append(d)
    es_bulk(cfg, lines)
    if first_ingest:
        # persist the full config like API-created indexes, so the
        # management routes (describe/update/delete) and a restarted
        # server can operate on the OTEL index without registration
        from ..search import mgmt_api
        mgmt_api.save_index_config(cfg)
    return {"num_records": len(docs), "index_id": cfg.index_uid}
