"""Jaeger-query HTTP API over an OTEL traces index.

The reference serves the jaeger-query REST surface in front of its
otel-traces index (`quickwit-serve/src/jaeger_api/rest_handler.rs`:
GET {index}/jaeger/api/services, .../services/{service}/operations,
.../traces?service=..&operation=..&start=..&end=..&limit=..,
.../traces/{trace_id}; response model `jaeger_api/model.rs`, trace
selection `quickwit-search find_trace_ids_collector.rs`: per-trace max
span timestamp, k most recent, timestamp-desc / trace-asc tie-break).

This implementation answers the same queries directly from the index
the OTLP ingest route builds (pipeline/otlp_ingest.otel_traces_config):

  - services: the union of per-segment `service_name` tag sets from the
    manifest — zero IO; a segment whose tag set overflowed
    max_tag_values falls back to a doc-store column scan of just that
    segment.
  - operations / trace search: per-segment posting evaluation
    (SegmentReader.eval, the same in-process matcher the delete
    pipeline uses) + doc-store column reads for the matched ids only,
    with segments pruned by their span-start min/max stats before any
    IO (the reference prunes splits by time_range the same way).
  - trace selection follows the find-trace-ids collector contract and
    is bounded: per segment only (trace_id, timestamp) pairs of
    matched docs are aggregated, and only the chosen <=limit trace ids
    are fetched in full.

Timestamps: Jaeger's REST API speaks epoch MICROseconds; the index
stores OTLP nanoseconds. Durations accept Jaeger's "100ms"/"1.2s"
forms (parse_duration.rs analog).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pandas as pd

from ..index.manifest import Manifest
from . import ast as A
from .engine import get_reader

__all__ = ["jaeger_services", "jaeger_operations", "jaeger_find_traces",
           "jaeger_get_trace", "parse_duration_us"]

_DUR_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(us|µs|ms|s|m|h)?\s*$")
_DUR_US = {"us": 1, "µs": 1, "ms": 1_000, "s": 1_000_000,
           "m": 60_000_000, "h": 3_600_000_000}

# OTLP SpanKind -> Jaeger span.kind tag value (the reference's
# otlp-to-jaeger conversion; kind 0/1 carry no tag)
_KIND_TAG = {2: "server", 3: "client", 4: "producer", 5: "consumer"}


def parse_duration_us(s: str) -> int:
    """'100ms' / '1.2s' / '250' (defaults to us) -> microseconds
    (jaeger_api/parse_duration.rs)."""
    m = _DUR_RE.match(s or "")
    if not m:
        raise ValueError(f"invalid duration {s!r}")
    return int(float(m.group(1)) * _DUR_US.get(m.group(2) or "us", 1))


def _response(data, total=None):
    """The jaeger-query REST envelope (model.rs JaegerResponseBody)."""
    return {"data": data, "total": total if total is not None
            else len(data), "limit": 0, "offset": 0, "errors": None}


def _segments(index_dir: str) -> tuple[Manifest, list[dict]]:
    m = Manifest.load(index_dir)
    return m, m.segments()


def _reader(index_dir: str, m: Manifest, seg: dict):
    tokenizer = seg.get("tokenizer",
                        m.data["config"].get("tokenizer", "default"))
    return get_reader(os.path.join(index_dir, "segments",
                                   seg["segment_id"]), tokenizer)


_TS_COL = "span_start_timestamp_nanos"


def _num_col(a: np.ndarray, missing, dtype) -> np.ndarray:
    """Numeric view of a doc-store column slice: parquet yields int64/
    float64 directly when null-free; object arrays (nulls present) are
    converted with `missing` substituted — vectorized via pandas, no
    per-row Python."""
    if a.dtype != object:
        return a.astype(dtype, copy=False)
    s = pd.Series(a)
    return s.fillna(missing).astype(dtype).to_numpy()


def _prune(segs: list[dict], start_us: int | None,
           end_us: int | None) -> list[dict]:
    """Drop segments whose span-start [min,max] cannot intersect the
    window (split time_range pruning, leaf.rs:697-810 analog).
    Segments without stats are kept (conservative)."""
    out = []
    for s in segs:
        stats = s.get("col_stats", {}).get(_TS_COL)
        if stats is not None:
            lo_us, hi_us = float(stats[0]) / 1e3, float(stats[1]) / 1e3
            if start_us is not None and hi_us < start_us:
                continue
            if end_us is not None and lo_us > end_us:
                continue
        out.append(s)
    return out


def jaeger_services(index_dir: str) -> dict:
    """GET {index}/jaeger/api/services."""
    m, segs = _segments(index_dir)
    services: set[str] = set()
    for seg in segs:
        tags = (seg.get("tags") or {}).get("service_name")
        if tags is not None:
            services.update(tags)
        else:  # tag set overflowed max_tag_values: scan this segment
            col = _reader(index_dir, m, seg).doc_column("service_name")
            for v in np.unique(col[pd.notna(col)]):
                services.add(str(v))
    services.discard("")
    return _response(sorted(services))


def jaeger_operations(index_dir: str, service: str) -> dict:
    """GET {index}/jaeger/api/services/{service}/operations."""
    m, segs = _segments(index_dir)
    ops: set[str] = set()
    for seg in segs:
        tags = (seg.get("tags") or {}).get("service_name")
        if tags is not None and service not in tags:
            continue  # segment-level tag pruning
        reader = _reader(index_dir, m, seg)
        ids = reader.eval(A.Term("service_name", service), "span_name",
                          scoring=False).docids
        if len(ids) == 0:
            continue
        names = reader.doc_column("span_name")[ids]
        for v in np.unique(names[pd.notna(names)]):
            if v:
                ops.add(str(v))
    return _response(sorted(ops))


def _match_spans(index_dir: str, m: Manifest, seg: dict,
                 service: str | None, operation: str | None,
                 start_us: int | None, end_us: int | None,
                 min_dur_us: int | None, max_dur_us: int | None
                 ) -> tuple:
    """Matched doc ids + their (trace_id, start_ns) for one segment."""
    reader = _reader(index_dir, m, seg)
    node: A.Node = (A.Term("service_name", service) if service
                    else A.MatchAll())
    ids = reader.eval(node, "span_name", scoring=False).docids
    if len(ids) == 0:
        return None
    starts = _num_col(reader.doc_column(_TS_COL)[ids], -1, np.int64)
    keep = np.ones(len(ids), dtype=bool)
    if operation is not None:
        names = reader.doc_column("span_name")[ids]
        keep &= (names == operation) if names.dtype == object \
            else (names.astype(object) == operation)
    if start_us is not None:
        keep &= starts >= start_us * 1000
    if end_us is not None:
        keep &= starts <= end_us * 1000
    if min_dur_us is not None or max_dur_us is not None:
        durs_us = _num_col(reader.doc_column("span_duration_millis")[ids],
                           -1.0, np.float64) * 1e3
        if min_dur_us is not None:
            keep &= durs_us >= min_dur_us
        if max_dur_us is not None:
            keep &= durs_us <= max_dur_us
    ids = ids[keep]
    if len(ids) == 0:
        return None
    traces = reader.doc_column("trace_id")[ids]
    return ids, traces, starts[keep]


def jaeger_find_traces(index_dir: str, service: str | None = None,
                       operation: str | None = None,
                       start_us: int | None = None,
                       end_us: int | None = None,
                       limit: int = 20,
                       min_duration: str | None = None,
                       max_duration: str | None = None) -> dict:
    """GET {index}/jaeger/api/traces: select the `limit` most recent
    matching trace ids (find_trace_ids_collector.rs ordering: max span
    timestamp desc, trace id asc tie-break), then return their FULL
    traces in that order."""
    limit = max(1, int(limit))
    min_us = parse_duration_us(min_duration) if min_duration else None
    max_us = parse_duration_us(max_duration) if max_duration else None
    m, segs = _segments(index_dir)
    best: dict[str, int] = {}  # trace_id -> max start_ns over matches
    for seg in _prune(segs, start_us, end_us):
        got = _match_spans(index_dir, m, seg, service, operation,
                           start_us, end_us, min_us, max_us)
        if got is None:
            continue
        _ids, traces, starts = got
        # per-segment partial agg (trace -> max start), then a bounded
        # dict merge: O(distinct traces), not O(matched spans), Python
        seg_max = pd.Series(starts).groupby(pd.Series(traces)).max()
        for t, ts in seg_max.items():
            if t is None:
                continue
            t = str(t)
            if ts > best.get(t, -1):
                best[t] = int(ts)
    chosen = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    order = [t for t, _ts in chosen]
    if not order:
        return _response([])
    traces = _fetch_traces(index_dir, m, segs, order)
    return _response([traces[t] for t in order if t in traces])


def jaeger_get_trace(index_dir: str, trace_id: str) -> dict:
    """GET {index}/jaeger/api/traces/{trace_id}."""
    m, segs = _segments(index_dir)
    traces = _fetch_traces(index_dir, m, segs, [trace_id])
    if trace_id not in traces:
        return {"data": [], "total": 0, "limit": 0, "offset": 0,
                "errors": [{"code": 404,
                            "msg": f"trace id not found: {trace_id}"}]}
    return _response([traces[trace_id]])


_SPAN_COLS = ("trace_id", "span_id", "parent_span_id", "span_name",
              "service_name", "span_kind", _TS_COL,
              "span_duration_millis", "span_status_code",
              "span_attributes_json")


def _fetch_traces(index_dir: str, m: Manifest, segs: list[dict],
                  trace_ids: list[str]) -> dict[str, dict]:
    """All spans of the chosen traces, grouped into the Jaeger trace
    model ({traceID, spans, processes}, model.rs JaegerTrace)."""
    spans_by_trace: dict[str, list[dict]] = {}
    want = A.TermSet("trace_id", tuple(trace_ids))
    for seg in segs:
        reader = _reader(index_dir, m, seg)
        if "trace_id" not in reader.doc_fields():
            continue
        ids = reader.eval(want, "span_name", scoring=False).docids
        if len(ids) == 0:
            continue
        cols = {c: (reader.doc_column(c)[ids]
                    if c in reader.doc_fields() else [None] * len(ids))
                for c in _SPAN_COLS}
        for i in range(len(ids)):
            row = {c: cols[c][i] for c in _SPAN_COLS}
            spans_by_trace.setdefault(str(row["trace_id"]), []).append(
                _jaeger_span(row))
    out: dict[str, dict] = {}
    for tid, spans in spans_by_trace.items():
        spans.sort(key=lambda s: (s["startTime"], s["spanID"]))
        processes, pid_of = {}, {}
        for s in spans:
            svc = s.pop("_service")
            if svc not in pid_of:
                pid_of[svc] = f"p{len(pid_of) + 1}"
                processes[pid_of[svc]] = {"serviceName": svc,
                                          "tags": []}
            s["processID"] = pid_of[svc]
        out[tid] = {"traceID": tid, "spans": spans,
                    "processes": processes, "warnings": None}
    return out


def _jaeger_span(row: dict) -> dict:
    """One doc-store row -> the Jaeger span model (model.rs
    JaegerSpan; OTLP attribute/kind/status conversion mirroring the
    reference's otlp-to-jaeger mapping)."""
    start_ns = row[_TS_COL]
    dur_ms = row["span_duration_millis"]
    tags = []
    kind_tag = _KIND_TAG.get(int(row["span_kind"] or 0))
    if kind_tag:
        tags.append({"key": "span.kind", "type": "string",
                     "value": kind_tag})
    status = int(row["span_status_code"] or 0)
    if status == 2:
        tags.append({"key": "error", "type": "bool", "value": True})
    try:
        attrs = json.loads(row["span_attributes_json"] or "{}")
    except (TypeError, ValueError):
        attrs = {}
    for k in sorted(attrs):
        tags.append({"key": k, "type": "string",
                     "value": "" if attrs[k] is None else str(attrs[k])})
    parent = row["parent_span_id"]
    refs = ([{"refType": "CHILD_OF", "traceID": str(row["trace_id"]),
              "spanID": str(parent)}] if parent else [])
    return {
        "traceID": str(row["trace_id"]),
        "spanID": str(row["span_id"]),
        "operationName": str(row["span_name"] or ""),
        "references": refs,
        "startTime": 0 if start_ns is None else int(start_ns) // 1000,
        "duration": 0 if dur_ms is None else int(float(dur_ms) * 1000),
        "tags": tags,
        "logs": [],
        "warnings": None,
        "_service": str(row["service_name"] or ""),
    }
