"""Zipkin protobuf decode: wire-level tables mirroring
receiver/zipkinreceiver/proto_parse_test.go's payload shapes."""

import pytest

from opentelemetry_collector_contrib_spark.operators.zipkin_pb import (
    decode_zipkin_list,
    enc_zipkin_list,
    enc_zipkin_span,
)


def test_two_span_list_roundtrip():
    trace = bytes(range(16))
    s1 = enc_zipkin_span(
        trace, b"\x01" * 8, "ProtoSpan1", 1_541_015_015_000_789, 12_000_000,
        kind=4, service="svc-1", remote_service="memcached",
        tags={"a": "1", "b": "2"}, annotations=[(7, "DB reset"), (3, "GC Cycle 39")],
    )
    s2 = enc_zipkin_span(
        trace, b"\x02" * 8, "CacheWarmUp", 10, 7_000_000,
        kind=3, parent_id=b"\x01" * 8, debug=True, shared=True,
    )
    rows = decode_zipkin_list(enc_zipkin_list([s1, s2]))
    assert len(rows) == 2
    r1, r2 = rows
    assert r1["zk_trace_id"] == trace.hex()
    assert r1["zk_kind"] == "CONSUMER" and r2["zk_kind"] == "PRODUCER"
    assert r1["zk_ts_us"] == 1_541_015_015_000_789
    assert r1["zk_duration_us"] == 12_000_000
    assert r1["zk_service"] == "svc-1" and r1["zk_remote_service"] == "memcached"
    assert r1["zk_tags_csv"] == "a=1,b=2"
    # annotations sort by timestamp
    assert r1["zk_anno_csv"] == "3:GC Cycle 39,7:DB reset"
    assert r1["zk_parent_span_id"] is None and r2["zk_parent_span_id"] == ("01" * 8)
    assert (r1["zk_debug"], r1["zk_shared"]) == (False, False)
    assert (r2["zk_debug"], r2["zk_shared"]) == (True, True)


def test_kind_unspecified_and_unknown_rank_null():
    t, s = b"\x00" * 16, b"\x01" * 8
    row = decode_zipkin_list(enc_zipkin_list([enc_zipkin_span(t, s, "x", 1, 1, kind=0)]))[0]
    assert row["zk_kind"] is None
    # forward-compat: an enum value this decoder doesn't know -> NULL, not error
    row = decode_zipkin_list(enc_zipkin_list([enc_zipkin_span(t, s, "x", 1, 1, kind=9)]))[0]
    assert row["zk_kind"] is None


def test_malformed_payloads_raise():
    with pytest.raises(ValueError):
        decode_zipkin_list(b"")  # empty ListOfSpans
    with pytest.raises(ValueError):
        # span missing trace_id/id
        decode_zipkin_list(enc_zipkin_list([b""]))


# --- property: bounded failure or well-formed rows on arbitrary bytes --------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from opentelemetry_collector_contrib_spark.operators.zipkin_pb import _ZK_FIELDS  # noqa: E402

_ZK_KEYS = {f.name for f in _ZK_FIELDS}


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_decoder_total_on_arbitrary_bytes(data):
    try:
        rows = decode_zipkin_list(data)
    except Exception:
        return
    for r in rows:
        assert set(r) == _ZK_KEYS


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=120))
def test_decoder_total_with_valid_span_prefix(tail):
    good = enc_zipkin_list([enc_zipkin_span(bytes(range(16)), b"\x01" * 8, "op", 1, 2)])
    try:
        rows = decode_zipkin_list(good + tail)
    except Exception:
        return
    for r in rows:
        assert set(r) == _ZK_KEYS
