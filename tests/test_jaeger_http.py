"""Jaeger-query REST over the OTLP-ingested traces index
(jaeger_api/rest_handler.rs routes, find_trace_ids_collector.rs trace
selection, model.rs response shapes) — driven over real loopback HTTP
against documents ingested through the OTLP protobuf route."""

import json
import urllib.error
import urllib.request

import pytest

from quickwit_spark.pipeline import otlp_pb
from quickwit_spark.index.manifest import Manifest
from quickwit_spark.search.http_api import SearchHttpServer
from quickwit_spark.search import jaeger_http as J

T1, T2, T3 = "a" * 32, "b" * 32, "c" * 32


def _spans_payload(svc, rows):
    return {"resourceSpans": [{"resource": {"attributes": [
        {"key": "service.name", "value": {"stringValue": svc}}]},
        "scopeSpans": [{"spans": rows}]}]}


def _span(tid, sid, name, start_s, dur_ms, parent=None, kind=2,
          attrs=None, status=0):
    d = {"traceId": tid, "spanId": sid, "name": name, "kind": kind,
         "startTimeUnixNano": str(start_s * 10**9),
         "endTimeUnixNano": str(start_s * 10**9 + dur_ms * 10**6),
         "status": {"code": status}}
    if parent:
        d["parentSpanId"] = parent
    if attrs:
        d["attributes"] = [{"key": k, "value": {"stringValue": v}}
                           for k, v in attrs.items()]
    return d


def _call(u, data=None, ctype=None):
    req = urllib.request.Request(
        u, data=data, method="POST" if data else "GET",
        headers={"Content-Type": ctype} if ctype else {})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read() or b"null")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null")


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("jaeger"))
    p1 = otlp_pb.encode_spans_request(_spans_payload("checkout", [
        _span(T1, "1111111111111111", "charge card", 1000, 50,
              attrs={"cc": "visa"}),
        _span(T1, "2222222222222222", "db write", 1000, 20,
              parent="1111111111111111", kind=3),
        _span(T2, "3333333333333333", "charge card", 2000, 400,
              status=2)]))
    p2 = otlp_pb.encode_spans_request(_spans_payload("frontend", [
        _span(T3, "4444444444444444", "render page", 3000, 9)]))
    with SearchHttpServer(root, writable=True) as srv:
        for p in (p1, p2):
            st, _ = _call(f"{srv.url}/api/v1/otlp/v1/traces", p,
                          "application/x-protobuf")
            assert st == 200
        yield srv, root


def _base(srv):
    return f"{srv.url}/api/v1/otel-traces-v0_9/jaeger/api"


def test_services_and_operations(served):
    srv, root = served
    st, r = _call(f"{_base(srv)}/services")
    assert st == 200
    assert r["data"] == ["checkout", "frontend"] and r["total"] == 2
    st, r = _call(f"{_base(srv)}/services/checkout/operations")
    assert r["data"] == ["charge card", "db write"]
    st, r = _call(f"{_base(srv)}/services/nope/operations")
    assert r["data"] == []
    # HTTP answers equal the direct functions
    d = f"{root}/otel-traces-v0_9"
    assert _call(f"{_base(srv)}/services")[1] == J.jaeger_services(d)


def test_find_traces_filters_and_order(served):
    srv, _root = served
    # most-recent-first (max span start desc): T2 (2000s) before
    # T1 (1000s); full traces returned with all spans
    st, r = _call(f"{_base(srv)}/traces?service=checkout&limit=10")
    assert [t["traceID"] for t in r["data"]] == [T2, T1]
    assert [len(t["spans"]) for t in r["data"]] == [1, 2]
    # operation filter is exact (stored span_name, not tokenized)
    st, r = _call(f"{_base(srv)}/traces?service=checkout"
                  "&operation=db+write")
    assert [t["traceID"] for t in r["data"]] == [T1]
    st, r = _call(f"{_base(srv)}/traces?service=checkout"
                  "&operation=db")
    assert r["data"] == []
    # duration filter (Jaeger duration grammar)
    st, r = _call(f"{_base(srv)}/traces?service=checkout"
                  "&minDuration=100ms")
    assert [t["traceID"] for t in r["data"]] == [T2]
    # time window in epoch MICROseconds
    st, r = _call(f"{_base(srv)}/traces?start=500000000"
                  "&end=1500000000")
    assert [t["traceID"] for t in r["data"]] == [T1]
    # limit keeps the most recent across services
    st, r = _call(f"{_base(srv)}/traces?limit=2")
    assert [t["traceID"] for t in r["data"]] == [T3, T2]


def test_get_trace_model(served):
    srv, _root = served
    st, r = _call(f"{_base(srv)}/traces/{T1}")
    assert st == 200
    tr = r["data"][0]
    assert tr["traceID"] == T1 and len(tr["spans"]) == 2
    assert tr["processes"] == {"p1": {"serviceName": "checkout",
                                      "tags": []}}
    s0, s1 = tr["spans"]  # start-time then span-id order
    assert s0["operationName"] == "charge card"
    assert s0["startTime"] == 1000 * 10**6 and s0["duration"] == 50000
    assert {"key": "span.kind", "type": "string",
            "value": "server"} in s0["tags"]
    assert {"key": "cc", "type": "string", "value": "visa"} in s0["tags"]
    assert s1["references"] == [{"refType": "CHILD_OF", "traceID": T1,
                                 "spanID": "1111111111111111"}]
    assert s1["processID"] == "p1"
    # status code 2 -> error tag (T2's span)
    st, r = _call(f"{_base(srv)}/traces/{T2}")
    assert {"key": "error", "type": "bool",
            "value": True} in r["data"][0]["spans"][0]["tags"]
    # unknown trace: jaeger-style 404 envelope
    st, r = _call(f"{_base(srv)}/traces/{'f' * 32}")
    assert st == 404 and r["errors"][0]["code"] == 404


def test_services_tag_overflow_fallback(served):
    """A segment whose service tag set overflowed max_tag_values
    (tags=None in the manifest) falls back to scanning that segment's
    doc-store column."""
    srv, root = served
    d = f"{root}/otel-traces-v0_9"
    m = Manifest.load(d)
    seg = m.segments()[0]
    before = J.jaeger_services(d)["data"]
    try:
        m.data["segments"][seg["segment_id"]]["tags"]["service_name"] \
            = None
        m._write()
        assert J.jaeger_services(d)["data"] == before
    finally:
        m2 = Manifest.load(d)
        m2.data["segments"][seg["segment_id"]]["tags"] = seg["tags"]
        m2._write()


def test_parse_duration():
    assert J.parse_duration_us("100ms") == 100_000
    assert J.parse_duration_us("1.2s") == 1_200_000
    assert J.parse_duration_us("250") == 250
    assert J.parse_duration_us("2m") == 120_000_000
    with pytest.raises(ValueError):
        J.parse_duration_us("abc")
