"""Envoy ALS StreamAccessLogsMessage decode vs the public data-plane-api
protos (data/accesslog/v3/accesslog.proto) and the envoyalsreceiver's
per-entry fan-out (internal/als/server.go:63-99)."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.envoy_als import (
    decode_als_message,
    enc_als_message,
    enc_http_entry,
    enc_tcp_entry,
    parse_envoy_als,
    synthesize_envoy_als,
)


def _http(**kw):
    base = dict(
        start_us=1_700_000_123_000_000, duration_us=250_000, method=3,
        scheme="https", authority="svc.internal", path="/api/x",
        user_agent="ua/1", request_id="req-9", req_bytes=1234, code=503,
        resp_bytes=999, down_addr="10.1.2.9", down_port=40123,
        cluster="cl-1", route="route-2", protocol=2,
    )
    base.update(kw)
    return enc_http_entry(**base)


def test_http_entry_surface():
    r, = decode_als_message(enc_als_message("als-0", [_http()]))
    assert r["ea_type"] == "http" and r["ea_log_name"] == "als-0"
    assert r["ea_start_us"] == 1_700_000_123_000_000
    assert r["ea_duration_us"] == 250_000
    assert (r["ea_protocol"], r["ea_method"]) == ("HTTP11", "POST")
    assert (r["ea_scheme"], r["ea_authority"], r["ea_path"]) == ("https", "svc.internal", "/api/x")
    assert (r["ea_user_agent"], r["ea_request_id"]) == ("ua/1", "req-9")
    assert (r["ea_down_addr"], r["ea_down_port"]) == ("10.1.2.9", 40123)
    assert (r["ea_upstream_cluster"], r["ea_route_name"]) == ("cl-1", "route-2")
    assert (r["ea_req_body_bytes"], r["ea_resp_code"], r["ea_resp_body_bytes"]) == (1234, 503, 999)


def test_method_and_version_enums():
    for m, name in ((1, "GET"), (9, "PATCH"), (0, "METHOD_UNSPECIFIED")):
        r, = decode_als_message(enc_als_message("l", [_http(method=m)]))
        assert r["ea_method"] == name
    for p, name in ((1, "HTTP10"), (3, "HTTP2"), (4, "HTTP3")):
        r, = decode_als_message(enc_als_message("l", [_http(protocol=p)]))
        assert r["ea_protocol"] == name


def test_tcp_entries_and_mixed_message():
    tcp = enc_tcp_entry(5_000_000, rx=111, tx=222, down_addr="10.0.0.1",
                        down_port=9000, cluster="cl-9")
    rows = decode_als_message(enc_als_message("mix", [_http()], [tcp]))
    assert [r["ea_type"] for r in rows] == ["http", "tcp"]
    t = rows[1]
    assert (t["ea_rx_bytes"], t["ea_tx_bytes"]) == (111, 222)
    assert t["ea_upstream_cluster"] == "cl-9" and t["ea_method"] is None


def test_spark_roundtrip_and_malformed_drop(spark):
    from pyspark.sql import functions as F

    df = spark.range(6).selectExpr("id AS event_id", "id % 2 AS user_id")
    out = parse_envoy_als(synthesize_envoy_als(df), "payload")
    assert out.count() == 12  # http + tcp per message
    assert out.filter("ea_type = 'http' AND ea_resp_code = 0").count() == 0
    bad = synthesize_envoy_als(df).withColumn(
        "payload", F.when(F.col("event_id") == 3, F.lit(b"\xff\xff\xff")).otherwise(F.col("payload"))
    )
    assert parse_envoy_als(bad, "payload").count() == 10
