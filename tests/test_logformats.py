"""CEF / LEEF / CLF parsers vs the reference test tables
(processor/transformprocessor/internal/logparsingfuncs/func_parse_*_test.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.logformats import (
    parse_cef,
    parse_clf,
    parse_leef,
    render_cef,
    render_clf,
    render_leef,
)


def _one(spark, line, parser, **kw):
    df = spark.createDataFrame([(line,)], "body string")
    return parser(df, "body", **kw).collect()[0]


# ---------------------------------------------------------------------------
# CEF
# ---------------------------------------------------------------------------

def test_cef_simple(spark):
    r = _one(spark, "CEF:0|Security|threatmanager|1.0|100|worm successfully stopped|10|"
                    "src=10.0.0.1 dst=2.1.2.2 spt=1232", parse_cef)
    assert r.cef_version == "0"
    assert r.cef_device_vendor == "Security"
    assert r.cef_device_product == "threatmanager"
    assert r.cef_device_version == "1.0"
    assert r.cef_device_event_class_id == "100"
    assert r.cef_name == "worm successfully stopped"
    assert r.cef_severity == "10"
    assert dict(r.cef_extensions) == {"src": "10.0.0.1", "dst": "2.1.2.2", "spt": "1232"}


@pytest.mark.parametrize(
    "line,name,ext",
    [
        ("CEF:0|Vendor|Product|1.0|EventID|EventName|5", "EventName", {}),
        ("CEF:0|Vendor|Product|1.0|EventID|EventName|5|", "EventName", {}),
        (r"CEF:0|Security|threatmanager|1.0|100|detected a \| in name|10|src=10.0.0.1",
         "detected a | in name", {"src": "10.0.0.1"}),
        (r"CEF:0|Security|threatmanager|1.0|100|detected a \\ in name|10|src=10.0.0.1",
         "detected a \\ in name", {"src": "10.0.0.1"}),
        ("CEF:0|Vendor|Product|1.0|100|Event|5|src=10.0.0.1 msg=this is a message with spaces dst=1.2.3.4",
         "Event", {"src": "10.0.0.1", "msg": "this is a message with spaces", "dst": "1.2.3.4"}),
        (r"CEF:0|Vendor|Product|1.0|100|Event|5|src=10.0.0.1 cs1=value with \= equals dst=1.2.3.4",
         "Event", {"src": "10.0.0.1", "cs1": "value with = equals", "dst": "1.2.3.4"}),
        (r"CEF:0|Vendor|Product|1.0|100|Event|5|fname=C:\\Windows\\System32\\cmd.exe",
         "Event", {"fname": r"C:\Windows\System32\cmd.exe"}),
        (r"CEF:0|Vendor|Product|1.0|100|Event|5|msg=line one\nline two",
         "Event", {"msg": "line one\nline two"}),
        ("<134>Sep 19 08:26:10 host CEF:0|Security|threatmanager|1.0|100|worm successfully stopped|10|src=10.0.0.1 dst=2.1.2.2",
         "worm successfully stopped", {"src": "10.0.0.1", "dst": "2.1.2.2"}),
        ("CEF:0|Vendor|Product|1.0|100|Event|5|cs1Label=Username cs1=jdoe cs2Label=Role cs2=admin",
         "Event", {"cs1Label": "Username", "cs1": "jdoe", "cs2Label": "Role", "cs2": "admin"}),
    ],
)
def test_cef_reference_vectors(spark, line, name, ext):
    r = _one(spark, line, parse_cef)
    assert r.cef_name == name
    assert dict(r.cef_extensions or {}) == ext


def test_cef_malformed_yields_nulls(spark):
    for bad in ["", "no cef marker here", "CEF:0|only|three|fields"]:
        r = _one(spark, bad, parse_cef)
        assert r.cef_version is None and r.cef_extensions is None


def test_cef_render_parse_roundtrip(spark):
    df = spark.createDataFrame([("x",)], "seed string")
    rendered = render_cef(
        df,
        vendor=F.lit("Acme|Corp"),
        product=F.lit("threat\\manager"),
        device_version=F.lit("1.0"),
        event_class_id=F.lit("100"),
        name=F.lit("pipe | and \\ slash"),
        severity=F.lit("7"),
        extensions=[("msg", F.lit("a=b\nc")), ("src", F.lit("1.2.3.4"))],
    )
    r = parse_cef(rendered, "body").collect()[0]
    assert r.cef_device_vendor == "Acme|Corp"
    assert r.cef_device_product == "threat\\manager"
    assert r.cef_name == "pipe | and \\ slash"
    assert dict(r.cef_extensions) == {"msg": "a=b\nc", "src": "1.2.3.4"}


# ---------------------------------------------------------------------------
# LEEF
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "line,version,vendor,attrs",
    [
        ("LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|src=10.50.1.1\tdst=2.10.20.20\tsev=5",
         "1.0", "Microsoft", {"src": "10.50.1.1", "dst": "2.10.20.20", "sev": "5"}),
        ("LEEF:1.0|Vendor|Product|1.0|EventID|", "1.0", "Vendor", {}),
        ("LEEF:1.0|Vendor|Product|1.0|EventID", "1.0", "Vendor", {}),
        ("LEEF:2.0|Lancope|StealthWatch|1.0|41|^|src=10.0.1.8^dst=10.0.0.5^sev=5",
         "2.0", "Lancope", {"src": "10.0.1.8", "dst": "10.0.0.5", "sev": "5"}),
        ("LEEF:2.0|Vendor|Product|1.0|100|0x09|key1=val1\tkey2=val2",
         "2.0", "Vendor", {"key1": "val1", "key2": "val2"}),
        ("LEEF:2.0|Vendor|Product|1.0|100|0X5E|key1=val1^key2=val2",
         "2.0", "Vendor", {"key1": "val1", "key2": "val2"}),
        # empty delimiter field -> tab (parseDelimiter(""))
        ("LEEF:2.0|Vendor|Product|1.0|100||key1=val1\tkey2=val2",
         "2.0", "Vendor", {"key1": "val1", "key2": "val2"}),
        ("LEEF:2.0|Vendor|Product|1.0|EventID|^|", "2.0", "Vendor", {}),
        ("LEEF:2.0|Vendor|Product|1.0|EventID|^", "2.0", "Vendor", {}),
        ("LEEF:2.0|Vendor|Product|1.0|EventID", "2.0", "Vendor", {}),
        ("May 11 11:27:23 SERVER-1 LEEF:2.0|Vendor|Product|1.0|EventID",
         "2.0", "Vendor", {}),
        # delimiter field omitted but attributes present ('=' disambiguation)
        ("LEEF:2.0|Vendor|Product|1.0|100|key1=val1\tkey2=val2",
         "2.0", "Vendor", {"key1": "val1", "key2": "val2"}),
        # whitespace inside values preserved verbatim
        ("LEEF:1.0|Vendor|Product|1.0|Event|msg=hello world \tsrc=1.2.3.4",
         "1.0", "Vendor", {"msg": "hello world ", "src": "1.2.3.4"}),
        # '=' inside value: first '=' splits
        ("LEEF:1.0|Vendor|Product|1.0|Event|url=http://example.com?foo=bar\tsrc=1.2.3.4",
         "1.0", "Vendor", {"url": "http://example.com?foo=bar", "src": "1.2.3.4"}),
        # empty value kept
        ("LEEF:1.0|Vendor|Product|1.0|Event|key1=\tkey2=value2",
         "1.0", "Vendor", {"key1": "", "key2": "value2"}),
    ],
)
def test_leef_reference_vectors(spark, line, version, vendor, attrs):
    r = _one(spark, line, parse_leef)
    assert r.leef_version == version
    assert r.leef_vendor == vendor
    assert dict(r.leef_attributes or {}) == attrs


def test_leef_malformed(spark):
    for bad in ["", "not leef", "LEEF:3.0|V|P|1|E", "LEEF:1.0|only|two"]:
        r = _one(spark, bad, parse_leef)
        assert r.leef_version is None


def test_leef_render_roundtrip_both_versions(spark):
    df = spark.createDataFrame([("1.0",), ("2.0",)], "ver string")
    rendered = render_leef(
        df,
        vendor=F.lit("IBM"),
        product=F.lit("QRadar"),
        product_version=F.lit("7.3"),
        event_id=F.lit("Auth"),
        attributes=[("usrName", F.lit("admin")), ("msg", F.lit("hello world"))],
        version=F.col("ver"),
        delimiter_spec="0x5e",
    )
    rows = {r.ver: r for r in parse_leef(rendered, "body").collect()}
    for v in ("1.0", "2.0"):
        assert rows[v].leef_version == v
        assert dict(rows[v].leef_attributes) == {"usrName": "admin", "msg": "hello world"}


# ---------------------------------------------------------------------------
# CLF / Combined
# ---------------------------------------------------------------------------

def test_clf_basic(spark):
    r = _one(spark, '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326',
             parse_clf)
    assert r.clf_remote_host == "127.0.0.1"
    assert r.clf_rfc931 == "-"
    assert r.clf_auth_user == "frank"
    assert r.clf_timestamp == "10/Oct/2000:13:55:36 -0700"
    assert r.clf_request == "GET /apache_pb.gif HTTP/1.0"
    assert (r.clf_method, r.clf_request_uri, r.clf_protocol) == ("GET", "/apache_pb.gif", "HTTP/1.0")
    assert r.clf_status == 200 and r.clf_bytes == 2326


def test_clf_dash_bytes_and_combined(spark):
    r = _one(spark, '127.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.1" 200 -', parse_clf)
    assert r.clf_status == 200 and r.clf_bytes is None
    c = _one(spark, '127.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.1" 200 42 '
                    '"http://www.example.com/" "curl/8.0"', parse_clf, format="combined")
    assert c.clf_referer == "http://www.example.com/"
    assert c.clf_user_agent == "curl/8.0"
    assert c.clf_bytes == 42


def test_clf_escapes_unescaped(spark):
    line = r'1.2.3.4 - - [10/Oct/2000:13:55:36 -0700] "GET /a\"b\\c\x7ed HTTP/1.1" 200 1'
    r = _one(spark, line, parse_clf)
    assert r.clf_request == 'GET /a"b\\c~d HTTP/1.1'
    assert r.clf_request_uri == '/a"b\\c~d'


def test_clf_malformed_and_validation(spark):
    r = _one(spark, "definitely not a log line", parse_clf)
    assert r.clf_remote_host is None and r.clf_status is None
    with pytest.raises(ValueError, match="invalid format"):
        parse_clf(spark.createDataFrame([("x",)], "body string"), "body", format="bogus")


def test_clf_render_roundtrip(spark):
    df = spark.createDataFrame([("x",)], "seed string")
    rendered = render_clf(
        df,
        remote_host=F.lit("10.0.0.9"),
        auth_user=F.lit("alice"),
        timestamp=F.lit("10/Oct/2000:13:55:36 -0700"),
        request=F.lit('GET /q?s="a b" HTTP/1.1'),
        status=F.lit(404),
        nbytes=F.lit(None).cast("bigint"),
        referer=F.lit('http://r.example/"quoted"'),
        user_agent=F.lit("agent\\v1"),
    )
    r = parse_clf(rendered, "body", format="combined").collect()[0]
    assert r.clf_remote_host == "10.0.0.9"
    assert r.clf_request == 'GET /q?s="a b" HTTP/1.1'
    assert r.clf_status == 404 and r.clf_bytes is None
    assert r.clf_referer == 'http://r.example/"quoted"'
    assert r.clf_user_agent == "agent\\v1"
