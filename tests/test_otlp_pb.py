"""OTLP protobuf input format (doc_processor.rs:143-177
SourceInputFormat::OtlpLogsProtobuf / OtlpTracesProtobuf; logs.rs:537,
traces.rs:877). The decisive check is CROSS-DECODER PARITY: the
hand-rolled wire decoder over encode(x) must produce exactly the same
rows as the independent from_json path over json.dumps(x) — two decoders
written against two different public specs of the same data. A
hand-computed byte fixture additionally pins the wire format itself
(tag/varint/length framing and the opentelemetry-proto field numbers)
so encoder and decoder cannot share a systematic bias."""

import json
import struct

import pytest

from quickwit_spark.pipeline import otlp, otlp_pb

# --- payload corpus: plain, hostile, and edge shapes ----------------------

LOG_PAYLOADS = [
    {  # plain
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "api"}},
                {"key": "region", "value": {"stringValue": "eu"}}]},
            "scopeLogs": [{
                "scope": {"name": "qw", "version": "1"},
                "logRecords": [{
                    "timeUnixNano": "1700000000000000001",
                    "observedTimeUnixNano": "1700000000000000002",
                    "severityText": "INFO", "severityNumber": 9,
                    "body": {"stringValue": "hello world"},
                    "attributes": [
                        {"key": "k", "value": {"intValue": "42"}},
                        {"key": "neg", "value": {"intValue": "-7"}},
                        {"key": "b", "value": {"boolValue": True}},
                        {"key": "f", "value": {"boolValue": False}}],
                    "traceId": "0af7651916cd43dd8448eb211c80319c",
                    "spanId": "b7ad6b7169203331"}]}]}],
    },
    {  # hostile: duplicate keys (first wins), kvlist coerces to NULL,
       # observed missing (falls back to time), no ids, no scope
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "w1"}},
                {"key": "service.name", "value": {"stringValue": "w2"}}]},
            "scopeLogs": [{
                "logRecords": [{
                    "timeUnixNano": "1700000000000000009",
                    "severityText": "WARN",
                    "body": {"kvlistValue": {"values": []}},
                    "attributes": [
                        {"key": "dup", "value": {"intValue": "1"}},
                        {"key": "dup", "value": {"intValue": "2"}}]}]}]}],
    },
    {  # two resources, multiple records, empty record
        "resourceLogs": [
            {"resource": {"attributes": []},
             "scopeLogs": [{"scope": {"name": "s2"},
                            "logRecords": [
                {"timeUnixNano": "1700000000000000003",
                 "severityNumber": 17, "severityText": "ERROR",
                 "body": {"stringValue": "boom"}},
                {"timeUnixNano": "1700000000000000004",
                 "severityText": "DEBUG"}]}]},
            {"resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "b"}}]},
             "scopeLogs": [{"logRecords": [
                 {"timeUnixNano": "1700000000000000005",
                  "severityText": "INFO",
                  "body": {"stringValue": "second resource"}}]}]}],
    },
]

SPAN_PAYLOADS = [
    {
        "resourceSpans": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "api"}}]},
            "scopeSpans": [{
                "scope": {"name": "qw", "version": "1"},
                "spans": [{
                    "traceId": "0af7651916cd43dd8448eb211c80319c",
                    "spanId": "b7ad6b7169203331",
                    "parentSpanId": "00f067aa0ba902b7",
                    "name": "GET /users", "kind": 2,
                    "startTimeUnixNano": "1700000000000000000",
                    "endTimeUnixNano": "1700000000123456789",
                    "attributes": [
                        {"key": "http.status",
                         "value": {"intValue": "200"}}],
                    "status": {"code": 2, "message": "err"}},
                    {"traceId": "0af7651916cd43dd8448eb211c80319d",
                     "spanId": "b7ad6b7169203332",
                     "name": "child", "kind": 1,
                     "startTimeUnixNano": "1700000000000000010",
                     "endTimeUnixNano": "1700000000000000020"}]}]}],
    },
    {  # no status / kind / parent, dup attr keys
        "resourceSpans": [{
            "resource": {"attributes": []},
            "scopeSpans": [{"spans": [{
                "traceId": "aa" * 16, "spanId": "bb" * 8,
                "name": "lonely",
                "startTimeUnixNano": "1700000001000000000",
                "endTimeUnixNano": "1700000001999999999",
                "attributes": [
                    {"key": "d", "value": {"stringValue": "x"}},
                    {"key": "d", "value": {"stringValue": "y"}}]}]}]}],
    },
]


def _rowset(df):
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        for k, v in list(d.items()):
            if isinstance(v, dict):
                d[k] = tuple(sorted((kk, "" if vv is None else str(vv))
                                    for kk, vv in v.items()))
        out.append(tuple(sorted(d.items(), key=lambda kv: kv[0])))
    return sorted(out, key=repr)


def test_logs_parity_pb_vs_json(spark):
    json_df = spark.createDataFrame(
        [(json.dumps(p),) for p in LOG_PAYLOADS], "payload string")
    pb_df = spark.createDataFrame(
        [(otlp_pb.encode_logs_request(p),) for p in LOG_PAYLOADS],
        "payload binary")
    j = _rowset(otlp.otlp_logs_to_rows(json_df))
    p = _rowset(otlp_pb.otlp_logs_pb_to_rows(pb_df))
    assert len(j) == 5
    assert j == p


def test_spans_parity_pb_vs_json(spark):
    json_df = spark.createDataFrame(
        [(json.dumps(p),) for p in SPAN_PAYLOADS], "payload string")
    pb_df = spark.createDataFrame(
        [(otlp_pb.encode_spans_request(p),) for p in SPAN_PAYLOADS],
        "payload binary")
    j = _rowset(otlp.otlp_spans_to_rows(json_df))
    p = _rowset(otlp_pb.otlp_spans_pb_to_rows(pb_df))
    assert len(j) == 3
    assert j == p


def test_hand_computed_wire_fixture():
    """Pin the wire format against hand-assembled bytes (no code path of
    this repo involved in producing the expectation): one request ->
    one resourceLogs -> one scopeLogs -> one record {time=1 (fixed64,
    field 1), severityText='INFO' (field 3)}."""
    record = bytes([0x09]) + (1).to_bytes(8, "little") \
        + bytes([0x1A, 0x04]) + b"INFO"
    scope_logs = bytes([0x12, len(record)]) + record      # log_records=2
    resource_logs = bytes([0x12, len(scope_logs)]) + scope_logs
    request = bytes([0x0A, len(resource_logs)]) + resource_logs
    rows = otlp_pb.decode_logs_request(request)
    assert len(rows) == 1
    r = rows[0]
    assert r["timestamp_nanos"] == 1
    assert r["observed_timestamp_nanos"] == 1
    assert r["severity_text"] == "INFO"
    assert r["severity_number"] == 0 and r["trace_id"] is None
    # and the encoder emits exactly the hand-assembled bytes for the
    # same payload (it always writes the resource/scope submessages,
    # possibly empty — include those 2-byte frames in the expectation)
    enc = otlp_pb.encode_logs_request({"resourceLogs": [{
        "scopeLogs": [{"logRecords": [
            {"timeUnixNano": "1", "severityText": "INFO"}]}]}]})
    sl_body = bytes([0x0A, 0x00]) + bytes([0x12, len(record)]) + record
    rl_body = (bytes([0x0A, 0x00])
               + bytes([0x12, len(sl_body)]) + sl_body)
    expected = bytes([0x0A, len(rl_body)]) + rl_body
    assert enc == expected


def test_int64_negative_roundtrip():
    p = {"resourceLogs": [{"scopeLogs": [{"logRecords": [{
        "timeUnixNano": "5",
        "attributes": [
            {"key": "n", "value": {"intValue": str(-(2**62))}},
            {"key": "m", "value": {"intValue": str(2**62)}}]}]}]}]}
    rows = otlp_pb.decode_logs_request(otlp_pb.encode_logs_request(p))
    assert rows[0]["attributes"] == {"n": str(-(2**62)),
                                     "m": str(2**62)}


def test_malformed_payloads_dropped_not_fatal(spark):
    good = otlp_pb.encode_logs_request(LOG_PAYLOADS[0])
    bad = [b"\xff\xff\xff\xff", b"\x0a\xff\x01short", b"", None,
           good[:len(good) // 2]]
    df = spark.createDataFrame([(b,) for b in [good] + bad],
                               "payload binary")
    rows = otlp_pb.otlp_logs_pb_to_rows(df).collect()
    assert len(rows) == 1 and rows[0]["severity_text"] == "INFO"


def test_jaeger_surface_over_pb_spans(spark):
    """Format-agnostic downstream: the Jaeger collector runs unchanged
    over protobuf-decoded spans."""
    pb_df = spark.createDataFrame(
        [(otlp_pb.encode_spans_request(p),) for p in SPAN_PAYLOADS],
        "payload binary")
    spans = otlp_pb.otlp_spans_pb_to_rows(pb_df)
    top = otlp.find_trace_ids(spans, k=2).collect()
    assert [t["trace_id"] for t in top] == [
        "aa" * 16, "0af7651916cd43dd8448eb211c80319d"]
    svc = otlp.jaeger_get_services(spans).collect()
    assert [s["service_name"] for s in svc] == ["api"]


def test_decoder_rejects_unsupported_wire_type():
    with pytest.raises(ValueError):
        list(otlp_pb._fields(bytes([0x0B])))  # wt=3 (group) unsupported


# --- property fuzz (hypothesis): codec invariants without Spark -----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _txt = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1, max_size=30)
    _any_val = st.one_of(
        st.builds(lambda s: {"stringValue": s}, _txt),
        st.builds(lambda n: {"intValue": n},
                  st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        st.builds(lambda b: {"boolValue": b}, st.booleans()),
    )
    _attrs = st.lists(
        st.fixed_dictionaries({"key": _txt, "value": _any_val}),
        max_size=4, unique_by=lambda kv: kv["key"])
    _record = st.fixed_dictionaries({
        "timeUnixNano": st.integers(min_value=1, max_value=2**62),
        "severityNumber": st.integers(min_value=1, max_value=24),
        "severityText": _txt,
        "body": st.builds(lambda s: {"stringValue": s}, _txt),
        "attributes": _attrs,
        "traceId": st.binary(min_size=16, max_size=16).map(bytes.hex),
        "spanId": st.binary(min_size=8, max_size=8).map(bytes.hex),
    })
    _payload = st.fixed_dictionaries({
        "resourceLogs": st.lists(st.fixed_dictionaries({
            "resource": st.fixed_dictionaries({"attributes": _attrs}),
            "scopeLogs": st.lists(st.fixed_dictionaries({
                "logRecords": st.lists(_record, max_size=3),
            }), max_size=2),
        }), min_size=1, max_size=2),
    })

    @given(_payload)
    @settings(max_examples=150, deadline=None)
    def test_fuzz_logs_roundtrip(payload):
        rows = otlp_pb.decode_logs_request(
            otlp_pb.encode_logs_request(payload))
        recs = [(rl, r)
                for rl in payload["resourceLogs"]
                for sl in rl["scopeLogs"]
                for r in sl["logRecords"]]
        assert len(rows) == len(recs)
        for row, (rl, rec) in zip(rows, recs):
            assert row["timestamp_nanos"] == rec["timeUnixNano"]
            assert row["severity_number"] == rec["severityNumber"]
            assert row["severity_text"] == rec["severityText"]
            assert row["body_message"] == rec["body"]["stringValue"]
            assert row["trace_id"] == rec["traceId"]
            assert row["span_id"] == rec["spanId"]
            want = {}
            for kv in rec["attributes"]:
                v = kv["value"]
                if "stringValue" in v:
                    s = v["stringValue"]
                elif "intValue" in v:
                    s = str(v["intValue"])
                else:
                    s = "true" if v["boolValue"] else "false"
                want[kv["key"]] = s
            assert row["attributes"] == want

    @given(_payload, st.integers(min_value=0, max_value=200))
    @settings(max_examples=150, deadline=None)
    def test_fuzz_truncation_never_hangs_or_misparses_silently(payload, cut):
        data = otlp_pb.encode_logs_request(payload)
        try:
            rows = otlp_pb.decode_logs_request(data[:min(cut, len(data))])
        except (ValueError, struct.error):
            return  # loud rejection is the contract
        assert isinstance(rows, list)

    @given(st.binary(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_fuzz_random_bytes_raise_or_return_list(data):
        try:
            rows = otlp_pb.decode_logs_request(data)
        except (ValueError, struct.error):
            return
        assert isinstance(rows, list)


def test_hostile_u64_timestamp_does_not_kill_the_batch(spark):
    """A fixed64 timestamp >= 2^63 (unsigned on the wire, `long` in the
    row schema) must fold to NULL like the JSON path's cast('long'),
    not overflow in the pandas->Arrow conversion OUTSIDE the per-payload
    try/except and fail the whole mapInPandas task. Same for varint enum
    fields beyond int32 (severity/kind/status): fold to 0=UNSPECIFIED."""
    rec = (otlp_pb._enc_tag(1, 1) + struct.pack("<Q", 2**64 - 1)
           + otlp_pb._enc_varint_field(2, 2**40)  # severity >> int32
           + otlp_pb._enc_len(3, b"ERROR"))
    sl = otlp_pb._enc_len(2, rec)
    rl = otlp_pb._enc_len(2, sl)
    hostile = otlp_pb._enc_len(1, rl)
    good = otlp_pb.encode_logs_request(LOG_PAYLOADS[0])
    df = spark.createDataFrame([(hostile,), (good,)], "payload binary")
    rows = otlp_pb.otlp_logs_pb_to_rows(df).collect()
    assert len(rows) == 2  # hostile row decoded (sanitized), not dropped
    by_sev = {r["severity_text"]: r for r in rows}
    assert by_sev["ERROR"]["timestamp_nanos"] is None
    assert by_sev["ERROR"]["severity_number"] == 0
    assert by_sev["INFO"]["timestamp_nanos"] == 1700000000000000001

    # spans: hostile start/end fixed64 + kind varint out of int32 range
    sp = (otlp_pb._enc_len(1, bytes(16)) + otlp_pb._enc_len(2, bytes(8))
          + otlp_pb._enc_len(5, b"op")
          + otlp_pb._enc_varint_field(6, 2**33)
          + otlp_pb._enc_tag(7, 1) + struct.pack("<Q", 2**63)
          + otlp_pb._enc_tag(8, 1) + struct.pack("<Q", 2**64 - 1))
    ss = otlp_pb._enc_len(2, sp)
    rs = otlp_pb._enc_len(2, ss)
    sdf = spark.createDataFrame([(otlp_pb._enc_len(1, rs),)],
                                "payload binary")
    srows = otlp_pb.otlp_spans_pb_to_rows(sdf).collect()
    assert len(srows) == 1
    assert srows[0]["span_start_timestamp_nanos"] is None
    assert srows[0]["span_end_timestamp_nanos"] is None
    assert srows[0]["span_duration_millis"] is None
    assert srows[0]["span_kind"] == 0
