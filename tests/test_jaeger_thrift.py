"""Thrift compact-protocol decode tables: field-header forms, typed tags,
unknown-field skip, malformed payloads (receiver/jaegerreceiver
thrift_compact semantics)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_spark.operators.jaeger_thrift import (
    _JT_FIELDS,
    _W,
    decode_jaeger_batch,
    enc_jaeger_thrift_batch,
    enc_jaeger_thrift_span,
    enc_tag,
)


def _batch(*spans, service="svc", ptags=None):
    return enc_jaeger_thrift_batch(service, list(spans), process_tags=ptags)


def test_typed_tags_render_like_protobuf_path():
    sp = enc_jaeger_thrift_span(
        1, 0, 2, "op", 5, 6,
        tags={"s": "str", "b": True, "n": False, "i": -42, "d": 1.5, "raw": b"\xde\xad"},
    )
    row = decode_jaeger_batch(_batch(sp))[0]
    assert row["jt_tags_csv"] == "b=true,d=1.5,i=-42,n=false,raw=dead,s=str"


def test_trace_id_128_bit_and_unset_parent():
    sp = enc_jaeger_thrift_span(0x0102, 0xA0B0, 9, "op", 1, 2)
    row = decode_jaeger_batch(_batch(sp))[0]
    assert row["jt_trace_id"] == format(0xA0B0, "016x") + format(0x0102, "016x")
    assert row["jt_parent_span_id"] is None  # 0 = unset


def test_long_form_field_header_and_big_list():
    # field ids with delta > 15 force the long (zigzag id) header form
    w = _W()
    w.i(1, 7)
    w.i(20, 99)  # delta 19 -> long form
    raw = w.done()
    from opentelemetry_collector_contrib_spark.operators.jaeger_thrift import _read_struct

    fields, _ = _read_struct(raw, 0)
    assert fields == {1: 7, 20: 99}
    # >=15 tags exercises the 0xF long list header
    sp = enc_jaeger_thrift_span(1, 0, 2, "op", 1, 2, tags={f"k{i:02d}": i for i in range(20)})
    row = decode_jaeger_batch(_batch(sp))[0]
    assert row["jt_tags_csv"].count("=") == 20


def test_unknown_fields_skip_by_type():
    # a span with extra fields from a "future IDL": double f20, string f21,
    # struct f22, list f23 — decoder must skip all and still read the span
    w = _W()
    w.i(1, 5)
    w.i(2, 0)
    w.i(3, 6)
    w.s(5, "op")
    w.i(8, 100)
    w.i(9, 200)
    w.d(20, 3.5)
    w.s(21, "future")
    inner = _W()
    inner.i(1, 1)
    w.st(22, inner.done())
    w.lst(23, [enc_tag("x", 1)])
    row = decode_jaeger_batch(_batch(w.done()))[0]
    assert row["jt_span_id"] == format(6, "016x")
    assert row["jt_start_us"] == 100 and row["jt_duration_us"] == 200


def test_span_logs_sorted_by_timestamp():
    sp = enc_jaeger_thrift_span(
        1, 0, 2, "op", 1, 2,
        logs=[(300, {"b": 2}), (100, {"a": 1})],
    )
    row = decode_jaeger_batch(_batch(sp))[0]
    assert row["jt_logs_csv"] == "100:a=1,300:b=2"


def _roundtrip(protocol):
    sp = enc_jaeger_thrift_span(
        0x0102, 0xA0B0, 9, "op", 100, 200, parent_id=5, flags=1,
        tags={"s": "str", "b": True, "n": False, "i": -42, "d": 1.5, "raw": b"\xde\xad"},
        logs=[(300, {"b": 2}), (100, {"a": 1})],
        protocol=protocol,
    )
    batch = enc_jaeger_thrift_batch("svc", [sp], process_tags={"host": "h1"}, protocol=protocol)
    return decode_jaeger_batch(batch, protocol=protocol)


def test_binary_protocol_decodes_same_rows_as_compact():
    # the two wire grammars carry the same Batch: decoded rows must be equal
    assert _roundtrip("binary") == _roundtrip("compact")


def test_binary_protocol_negative_and_bool_fields():
    sp = enc_jaeger_thrift_span(-1, 0, 2, "op", 1, 2, tags={"neg": -9999999999}, protocol="binary")
    row = decode_jaeger_batch(enc_jaeger_thrift_batch("s", [sp], protocol="binary"), protocol="binary")[0]
    assert row["jt_trace_id"].endswith("ffffffffffffffff")  # -1 low word renders unsigned
    assert row["jt_tags_csv"] == "neg=-9999999999"


def test_binary_unknown_fields_skip_by_type():
    from opentelemetry_collector_contrib_spark.operators.jaeger_thrift import _WB

    w = _WB()
    w.i(1, 5)
    w.i(2, 0)
    w.i(3, 6)
    w.s(5, "op")
    w.i(8, 100)
    w.i(9, 200)
    w.d(20, 3.5)
    w.s(21, "future")
    inner = _WB()
    inner.i(1, 1)
    w.st(22, inner.done())
    w.lst(23, [enc_tag("x", 1, protocol="binary")])
    batch = enc_jaeger_thrift_batch("s", [w.done()], protocol="binary")
    row = decode_jaeger_batch(batch, protocol="binary")[0]
    assert row["jt_span_id"] == format(6, "016x")
    assert row["jt_start_us"] == 100 and row["jt_duration_us"] == 200


def test_binary_hostile_declared_sizes_fail_fast():
    import time

    # an 8-byte payload declaring a 4.29e9-element i64 list must raise
    # immediately, not iterate the declared size (buf slices past the end
    # return b'' and int.from_bytes(b'') == 0 raises nothing by itself)
    hostile = bytes([15, 0, 1, 10]) + (0xFFFFFFFF).to_bytes(4, "big")
    t0 = time.monotonic()
    with pytest.raises(ValueError):
        decode_jaeger_batch(hostile, protocol="binary")
    assert time.monotonic() - t0 < 0.1
    # same for a hostile map header and the compact long-form list size
    hostile_map = bytes([13, 0, 1, 10, 10]) + (0xFFFFFFFF).to_bytes(4, "big")
    with pytest.raises(ValueError):
        decode_jaeger_batch(hostile_map, protocol="binary")
    compact = bytes([0x19, 0xF6]) + b"\xff\xff\xff\xff\x0f"  # field 1 LIST, size 2^32-1
    t0 = time.monotonic()
    with pytest.raises(Exception):
        decode_jaeger_batch(compact)
    assert time.monotonic() - t0 < 0.1


def test_binary_malformed_truncated_string_raises():
    bad = bytes([11, 0, 1]) + (127).to_bytes(4, "big") + b"x"  # claims 127 bytes, has 1
    with pytest.raises(Exception):
        decode_jaeger_batch(bad, protocol="binary")


def test_malformed_payloads_raise():
    with pytest.raises(Exception):
        decode_jaeger_batch(b"")  # no struct at all
    with pytest.raises(ValueError):
        decode_jaeger_batch(_batch())  # empty span list
    # truncated binary length
    bad = bytes([0x18, 0x7F]) + b"x"  # field 1 BINARY claims 127 bytes, has 1
    with pytest.raises(Exception):
        decode_jaeger_batch(bad)


_JT_KEYS = {f.name for f in _JT_FIELDS}


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200), st.sampled_from(["compact", "binary"]))
def test_decoder_total_on_arbitrary_bytes(data, protocol):
    """Same contract as the other wire readers: bounded failure (raise) or
    a well-formed row list — never a hang, never a partial row. Every list
    element consumes >= 1 byte in both grammars, so iteration is bounded
    by payload length even for hostile declared sizes."""
    try:
        rows = decode_jaeger_batch(data, protocol=protocol)
    except Exception:
        return
    for r in rows:
        assert set(r) == _JT_KEYS


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=120), st.sampled_from(["compact", "binary"]))
def test_decoder_total_with_valid_batch_prefix(tail, protocol):
    # splice arbitrary bytes after a valid process struct header so the
    # fuzz reaches deep into the span-list walk, not just the first byte
    sp = enc_jaeger_thrift_span(1, 0, 2, "op", 1, 2, protocol=protocol)
    good = enc_jaeger_thrift_batch("svc", [sp], protocol=protocol)
    try:
        rows = decode_jaeger_batch(good[:-1] + tail, protocol=protocol)
    except Exception:
        return
    for r in rows:
        assert set(r) == _JT_KEYS
