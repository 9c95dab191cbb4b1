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
    assert row(O["Concat"]("-", "s", "s")) == "Hello World-Hello World"
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
