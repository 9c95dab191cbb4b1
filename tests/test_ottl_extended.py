"""Tests for the extended OTTL surface: map editors, duration converters,
CIDR/Luhn predicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import call


@pytest.fixture(scope="module")
def mdf(spark):
    return spark.createDataFrame(
        [(1, {"http.method": "GET", "http.status": "200", "user": "alice"})],
        "id int, attrs map<string,string>",
    )


def _one(df, col):
    return df.select(col.alias("x")).collect()[0]["x"]


def test_map_key_editors(mdf):
    kept = _one(mdf, call("KeepMatchingKeys", "attrs", "^http\\."))
    assert set(kept) == {"http.method", "http.status"}
    dropped = _one(mdf, call("DeleteMatchingKeys", "attrs", "^http\\."))
    assert set(dropped) == {"user"}


def test_limit_and_merge(mdf):
    lim = _one(mdf, call("Limit", "attrs", 2))
    assert len(lim) == 2
    merged = _one(mdf, call("MergeMaps", "attrs", F.create_map(F.lit("user"), F.lit("bob"), F.lit("new"), F.lit("1"))))
    assert merged["user"] == "bob" and merged["new"] == "1" and merged["http.method"] == "GET"


def test_replace_editors(mdf):
    rep = _one(mdf, call("ReplaceAllMatches", "attrs", "2*", "redacted"))
    assert rep["http.status"] == "redacted" and rep["user"] == "alice"
    pat = _one(mdf, call("ReplaceAllPatterns", "attrs", "[0-9]", "#"))
    assert pat["http.status"] == "###"
    assert _one(mdf, call("ReplaceMatch", F.lit("GET"), "G*", "verb")) == "verb"
    assert _one(mdf, call("ReplacePattern", F.lit("a1b2"), r"\d", "_")) == "a_b_"


def test_stringify_truncate_kvstring(mdf):
    t = _one(mdf, call("TruncateAll", "attrs", 3))
    assert t["user"] == "ali"
    kv = _one(mdf, call("ToKeyValueString", call("KeepMatchingKeys", "attrs", "^user")))
    assert kv == "user=alice"


def test_delete_index(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], "xs array<string>")
    assert _one(df, call("DeleteIndex", "xs", 1)) == ["a", "c"]


def test_duration_family(spark):
    df = spark.createDataFrame([(5400,)], "secs bigint")
    assert _one(df, call("Hours", "secs")) == 1.5
    assert _one(df, call("Minutes", "secs")) == 90.0
    assert _one(df, call("Nanoseconds", "secs")) == 5400 * 10**9


def test_is_in_cidr(spark):
    df = spark.createDataFrame([("10.1.2.3",), ("10.2.0.1",), ("192.168.1.1",)], "ip string")
    out = [r["x"] for r in df.select(call("IsInCIDR", "ip", "10.1.0.0/16").alias("x")).collect()]
    assert out == [True, False, False]
    out24 = [r["x"] for r in df.select(call("IsInCIDR", "ip", "192.168.1.0/24").alias("x")).collect()]
    assert out24 == [False, False, True]


def test_luhn(spark):
    # 4539578763621486 is a valid Luhn number; flipping a digit breaks it
    df = spark.createDataFrame([("4539578763621486",), ("4539578763621487",), ("",)], "card string")
    out = [r["x"] for r in df.select(call("IsValidLuhn", "card").alias("x")).collect()]
    assert out == [True, False, False]
