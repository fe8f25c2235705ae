"""OTLP input formats + trace-ID collector (doc_processor.rs:142-190,
logs.rs:142-190/:531, traces.rs:184-230, find_trace_ids_collector.rs)."""

import json

from quickwit_spark.pipeline.otlp import (
    find_trace_ids, otlp_logs_to_rows, otlp_spans_to_rows)


def _span(trace, span, name, start, end):
    return {"traceId": trace, "spanId": span, "parentSpanId": "",
            "name": name, "kind": 2,
            "startTimeUnixNano": str(start), "endTimeUnixNano": str(end),
            "attributes": [{"key": "k", "value": {"intValue": "7"}}],
            "status": {"code": 1, "message": ""}}


def _trace_payload(spans, service="svc"):
    return json.dumps({"resourceSpans": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": service}}]},
        "scopeSpans": [{"scope": {"name": "s", "version": "1"},
                        "spans": spans}]}]})


def test_otlp_spans_flatten_and_collect(spark):
    t1, t2 = "a" * 32, "b" * 32
    payloads = [
        _trace_payload([_span(t1, "1" * 16, "root", 100, 5_100_000),
                        _span(t1, "2" * 16, "child", 900, 1_000)]),
        _trace_payload([_span(t2, "3" * 16, "other", 500, 600)]),
        "{not json",  # malformed payload -> NULL struct, dropped
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    rows = otlp_spans_to_rows(df)
    pdf = rows.toPandas().sort_values("span_id").reset_index(drop=True)
    assert len(pdf) == 3
    assert set(pdf["service_name"]) == {"svc"}
    assert pdf.loc[0, "span_name"] == "root"
    assert pdf.loc[0, "span_duration_millis"] == 5  # (5.1e6-100) ns -> ms
    assert pdf.loc[0, "span_attributes"]["k"] == "7"
    assert pdf.loc[0, "span_status_code"] == 1

    # collector: per-trace MAX start, recency order, trace asc tie-break
    top = find_trace_ids(rows, k=2).toPandas()
    assert list(top["trace_id"]) == [t1, t2]
    assert list(top["span_timestamp_nanos"]) == [900, 500]
    top1 = find_trace_ids(rows, k=1).toPandas()
    assert list(top1["trace_id"]) == [t1]


def test_otlp_logs_flatten(spark):
    payload = json.dumps({"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "api"}}]},
        "scopeLogs": [{"scope": {"name": "lib", "version": "2"},
                       "logRecords": [
            {"timeUnixNano": "123", "severityText": "WARN",
             "severityNumber": 13,
             "body": {"stringValue": "disk nearly full"},
             "attributes": [
                 {"key": "host", "value": {"stringValue": "h1"}},
                 {"key": "ratio", "value": {"doubleValue": 0.9}},
                 {"key": "up", "value": {"boolValue": True}}],
             "traceId": "AB" * 16, "spanId": "CD" * 8},
            {"timeUnixNano": "456", "severityNumber": 9},  # minimal
        ]}]}]})
    df = spark.createDataFrame([(payload,)], "payload string")
    pdf = (otlp_logs_to_rows(df).toPandas()
           .sort_values("timestamp_nanos").reset_index(drop=True))
    assert len(pdf) == 2
    r = pdf.loc[0]
    assert r["service_name"] == "api" and r["severity_text"] == "WARN"
    assert r["body_message"] == "disk nearly full"
    assert r["attributes"]["host"] == "h1"
    assert r["attributes"]["ratio"] == "0.9"
    assert r["attributes"]["up"] == "true"
    assert r["trace_id"] == "ab" * 16  # normalized lowercase
    assert r["scope_name"] == "lib" and r["scope_version"] == "2"
    m = pdf.loc[1]  # defaults for the minimal record
    assert m["observed_timestamp_nanos"] == 456
    assert m["severity_number"] == 9 and m["body_message"] is None
    assert len(m["attributes"]) == 0


def test_jaeger_query_surface(spark):
    """GetServices / GetOperations / FindTraces / GetTrace over Span
    rows (quickwit-jaeger/src/lib.rs:89-243)."""
    from quickwit_spark.pipeline.otlp import (
        jaeger_find_traces, jaeger_get_operations, jaeger_get_services,
        jaeger_get_trace)

    t1, t2, t3 = "a" * 32, "b" * 32, "c" * 32
    payloads = [
        _trace_payload([_span(t1, "1" * 16, "GET /users", 100, 200)],
                       service="api"),
        _trace_payload([_span(t1, "2" * 16, "db.query", 150, 160)],
                       service="db"),
        _trace_payload([_span(t2, "3" * 16, "GET /users", 900, 950)],
                       service="api"),
        _trace_payload([_span(t3, "4" * 16, "GET /health", 500, 501)],
                       service="api"),
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    from quickwit_spark.pipeline.otlp import otlp_spans_to_rows
    spans = otlp_spans_to_rows(df).persist()

    assert [r["service_name"] for r in
            jaeger_get_services(spans).collect()] == ["api", "db"]
    ops = jaeger_get_operations(spans, "api").toPandas()
    assert list(ops["span_name"]) == ["GET /health", "GET /users"]
    assert jaeger_get_operations(spans, "api", span_kind=3).count() == 0

    got = jaeger_find_traces(spans, k=2).toPandas()
    # two most recent traces: t2 (900) and t3 (500); t1 excluded
    assert set(got["trace_id"]) == {t2, t3}
    one = jaeger_get_trace(spans, t1.upper()).toPandas()
    assert len(one) == 2 and set(one["service_name"]) == {"api", "db"}


def test_traces_index_end_to_end(spark, tmp_path):
    """The otel-traces story end-to-end: OTLP payloads -> Span rows ->
    inverted index (span_name text, service_name tag) -> matched-docs
    query -> find_trace_ids over the MATCHED set (the reference runs its
    collector over the query's doc set, collector.rs:597-631)."""
    import json as _json

    import pandas as pd

    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index_pandas
    from quickwit_spark.pipeline.otlp import (find_trace_ids,
                                              otlp_spans_to_rows)
    from quickwit_spark.search import ast as A
    from quickwit_spark.search.engine import IndexSearcher

    names = ["fetch users", "fetch orders", "update cache",
             "fetch users", "fetch invoices"]
    payloads = [
        _trace_payload([_span(ch * 32, str(i) * 16, names[i],
                              (i + 1) * 1000, (i + 1) * 1000 + 50)],
                       service="api" if i % 2 == 0 else "worker")
        for i, ch in enumerate("abcde")
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    spans = otlp_spans_to_rows(df).toPandas()

    cfg = IndexConfig(
        index_uid="otel-traces", index_dir=str(tmp_path / "ti"),
        text_col="span_name", key_cols=("trace_id", "span_id"),
        tag_cols=("service_name",),
        store_cols=("trace_id", "span_start_timestamp_nanos",
                    "service_name"),
        tokenizer="default", sha_col=None)
    build_index_pandas(spans, cfg, num_partitions=2)

    s = IndexSearcher(cfg.index_dir)
    # query: span_name contains "fetch", service api only (tag filter)
    node = A.Bool(must=(A.Term("span_name", "fetch"),),
                  filter=(A.Term("service_name", "api"),))
    res = s.search(node, k=100, fetch_fields=True)
    matched = pd.DataFrame([h.doc for h in res.hits])
    assert set(matched["trace_id"]) == {"a" * 32, "e" * 32}

    mspans = spark.createDataFrame(
        matched[["trace_id", "span_start_timestamp_nanos"]])
    top = find_trace_ids(mspans, k=1).toPandas()
    assert list(top["trace_id"]) == ["e" * 32]  # most recent matched
    assert top["span_timestamp_nanos"][0] == 5000


def test_otlp_attrs_tolerate_duplicate_and_null_keys(spark):
    """Duplicate attribute keys (legal on the wire — OTLP only says
    keys SHOULD be unique) and entries missing 'key' must degrade to
    one degraded row, not abort the batch in map_from_entries
    (DUPLICATED_MAP_KEY / null map key). First occurrence wins."""
    sp = _span("c" * 32, "4" * 16, "dup", 100, 200)
    sp["attributes"] = [
        {"key": "k", "value": {"stringValue": "first"}},
        {"key": "k", "value": {"stringValue": "second"}},   # dup key
        {"value": {"stringValue": "orphan"}},               # null key
        {"key": "other", "value": {"intValue": "3"}},
    ]
    df = spark.createDataFrame([(_trace_payload([sp]),)],
                               "payload string")
    pdf = otlp_spans_to_rows(df).toPandas()
    assert len(pdf) == 1
    attrs = pdf.loc[0, "span_attributes"]
    assert attrs == {"k": "first", "other": "3"}
