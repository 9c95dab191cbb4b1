"""OTTL function registry tests — the e2e-language-test mirror
(pkg/ottl/e2e/e2e_test.go): every mapped converter evaluated on data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import OTTL_FUNCTIONS as O


@pytest.fixture(scope="module")
def row(spark):
    df = spark.createDataFrame(
        [("Hello World", "a,b,c", 42, 2.5, "2025-03-01T10:20:30", "https://example.com/p?q=1")],
        "s string, csv string, i long, d double, iso string, url string",
    )
    def ev(col):
        return df.select(col.alias("r")).collect()[0]["r"]
    return ev


def test_string_fns(row):
    assert row(O["ToUpperCase"]("s")) == "HELLO WORLD"
    assert row(O["ToLowerCase"]("s")) == "hello world"
    assert row(O["Substring"]("s", 0, 5)) == "Hello"
    assert row(O["Len"]("s")) == 11
    # value varargs: plain str is a LITERAL (OTTL string semantics);
    # columns must be passed as Columns
    assert row(O["Concat"]("-", F.col("s"), F.col("s"))) == "Hello World-Hello World"
    assert row(O["Concat"](":", F.col("s"), "lit")) == "Hello World:lit"
    assert row(O["Split"]("csv", ",")) == ["a", "b", "c"]
    assert row(O["HasPrefix"]("s", "Hello")) is True
    assert row(O["HasSuffix"]("s", "xx")) is False
    assert row(O["IsMatch"]("s", "^H.*d$")) is True
    assert row(O["Find"]("s", "World")) == 6  # 0-based like OTTL
    assert row(O["TrimPrefix"]("s", "Hello ")) == "World"
    assert row(O["TrimSuffix"]("s", " World")) == "Hello"


def test_type_fns(row):
    assert row(O["Int"]("d")) == 2
    assert row(O["Double"]("i")) == 42.0
    assert row(O["String"]("i")) == "42"
    assert row(O["IsInt"]("i")) is True


def test_time_fns(row):
    assert row(O["Year"](O["Time"]("iso", "yyyy-MM-dd'T'HH:mm:ss"))) == 2025
    assert row(O["Hour"](O["Time"]("iso", "yyyy-MM-dd'T'HH:mm:ss"))) == 10
    assert row(O["UnixSeconds"](O["Time"]("iso", "yyyy-MM-dd'T'HH:mm:ss"))) > 0


def test_hash_fns(row):
    assert len(row(O["SHA256"]("s"))) == 64
    assert len(row(O["MD5"]("s"))) == 32
    assert isinstance(row(O["Murmur3Hash"]("s")), int)
    assert isinstance(row(O["XXH64"]("s")), int)


def test_url_fn(row):
    assert row(O["URL"]("url", "HOST")) == "example.com"
    assert row(O["URL"]("url", "PATH")) == "/p"


def test_map_array_fns(spark):
    df = spark.createDataFrame([([3, 1, 2], {"a": "1"})], "arr array<int>, m map<string,string>")
    def ev(col):
        return df.select(col.alias("r")).collect()[0]["r"]
    assert ev(O["Sort"]("arr")) == [1, 2, 3]
    assert ev(O["Index"]("arr", 0)) == 3
    assert ev(O["Keys"]("m")) == ["a"]
    assert ev(O["ContainsValue"]("arr", 2)) is True
    assert ev(O["Reduce"]("arr", F.lit(0), lambda acc, x: acc + x)) == 6
    assert ev(O["Any"]("arr", lambda x: x > 2)) is True
    assert ev(O["All"]("arr", lambda x: x > 0)) is True


def test_when_duration_severity(row):
    assert row(O["When"](F.lit(True), F.lit("a"), F.lit("b"))) == "a"
    assert row(O["When"](F.lit(False), F.lit("a"), F.lit("b"))) == "b"
    assert row(O["Duration"](F.lit("1h2m3.5s"))) == pytest.approx(3723.5)
    assert row(O["Duration"](F.lit("250ms"))) == pytest.approx(0.25)
    assert row(O["Duration"](F.lit("2m30s"))) == pytest.approx(150.0)
    assert row(O["Duration"](F.lit("10us"))) == pytest.approx(1e-5)
    # malformed durations are NULL (reference errors; on_error=send -> null),
    # distinguishable from a genuine 0s duration
    assert row(O["Duration"](F.lit("not a duration"))) is None
    assert row(O["Duration"](F.lit("12"))) is None
    assert row(O["Duration"](F.lit("3x"))) is None
    assert row(O["Duration"](F.lit("0s"))) == 0.0
    assert row(O["ParseSeverity"](F.lit("WARNING"))) == "WARN"
    assert row(O["ParseSeverity"](F.lit("emerg"))) == "FATAL"
    assert row(O["ParseSeverity"](F.lit("nope"))) is None


def test_hex_ids(row):
    t = "0123456789abcdef0123456789ABCDEF"
    assert row(O["TraceID"](F.lit(t))) == t.lower()
    assert row(O["TraceID"](F.lit("xyz"))) is None
    assert row(O["SpanID"](F.lit("00f067aa0ba902b7"))) == "00f067aa0ba902b7"
    assert row(O["SpanID"](F.lit("short"))) is None


def test_community_id_matches_reference_algorithm(row):
    import base64
    import hashlib
    import socket
    import struct

    def ref_cid(sip, dip, sp, dp, proto=6, seed=0):
        a = (socket.inet_aton(sip), sp)
        b = (socket.inet_aton(dip), dp)
        if a > b:
            a, b = b, a
        payload = struct.pack("!H", seed) + a[0] + b[0] + struct.pack("!BBHH", proto, 0, a[1], b[1])
        return "1:" + base64.b64encode(hashlib.sha1(payload).digest()).decode()

    got = row(O["CommunityID"](F.lit("1.2.3.4"), F.lit("5.6.7.8"), F.lit(1122), F.lit(3344)))
    assert got == ref_cid("1.2.3.4", "5.6.7.8", 1122, 3344)
    # direction symmetry: both flow directions hash identically
    rev = row(O["CommunityID"](F.lit("5.6.7.8"), F.lit("1.2.3.4"), F.lit(3344), F.lit(1122)))
    assert rev == got


def test_user_agent_reduced(row):
    ua_chrome = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
    ua_ff = "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0"
    ua_curl = "curl/8.4.0"
    got = row(O["UserAgent"](F.lit(ua_chrome)))
    assert (got["browser"], got["os"]) == ("Chrome", "Windows") and got["version"].startswith("120")
    got2 = row(O["UserAgent"](F.lit(ua_ff)))
    assert (got2["browser"], got2["os"]) == ("Firefox", "Linux")
    got3 = row(O["UserAgent"](F.lit(ua_curl)))
    assert got3["browser"] == "curl" and got3["version"] == "8.4.0"


def test_map_keys_lambda(row):
    m = F.create_map(F.lit("a"), F.lit("1"), F.lit("b"), F.lit("2"))
    got = row(O["MapKeys"](m, lambda k: F.upper(k)))
    assert dict(got) == {"A": "1", "B": "2"}


def test_user_agent_edge_opera_versions(row):
    edge = "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/120.0.0.0 Safari/537.36 Edg/121.0.2277.83"
    got = row(O["UserAgent"](F.lit(edge)))
    assert got["browser"] == "Edge" and got["version"].startswith("121")
    opera = "Mozilla/5.0 (X11; Linux) AppleWebKit/537.36 Chrome/119.0.0.0 Safari/537.36 OPR/105.0.4970.34"
    got2 = row(O["UserAgent"](F.lit(opera)))
    assert got2["browser"] == "Opera" and got2["version"].startswith("105")


def test_user_agent_legacy_opera(row):
    legacy = "Opera/9.80 (Windows NT 6.1) Presto/2.12.388 Version/12.16"
    got = row(O["UserAgent"](F.lit(legacy)))
    assert got["browser"] == "Opera" and got["version"] == "12.16"


def test_duration_signs_repeats_and_micro(row):
    # Go time.ParseDuration accepts a whole-duration sign, repeated units,
    # bare '0', and the µs spelling
    assert row(O["Duration"](F.lit("-1h30m"))) == pytest.approx(-5400.0)
    assert row(O["Duration"](F.lit("+2m"))) == pytest.approx(120.0)
    assert row(O["Duration"](F.lit("1h2h"))) == pytest.approx(10800.0)
    assert row(O["Duration"](F.lit("0"))) == 0.0
    assert row(O["Duration"](F.lit("300µs"))) == pytest.approx(3e-4)
    assert row(O["Duration"](F.lit(".5s"))) == pytest.approx(0.5)
    assert row(O["Duration"](F.lit("-"))) is None


def test_numeric_converters_ansi_safe(row):
    # Int/Double/Bool and their Is* predicates take the per-record-NULL
    # path on garbage input instead of aborting under ANSI mode
    assert row(O["Int"](F.lit("42"))) == 42
    assert row(O["Int"](F.lit("42.5"))) is None
    assert row(O["Int"](F.lit("abc"))) is None
    assert row(O["Double"](F.lit("abc"))) is None
    assert row(O["Bool"](F.lit("maybe"))) is None
    assert row(O["IsInt"](F.lit("abc"))) is False
    assert row(O["IsDouble"](F.lit("1.5"))) is True
    assert row(O["IsBool"](F.lit("zzz"))) is False
    assert row(O["ParseInt"](F.lit("xyz"))) is None
