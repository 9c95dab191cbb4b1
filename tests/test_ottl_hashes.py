"""Hash converters, UUIDv7, and XML editors — the final 9 registry names
(→ 121/121). Vectors from the reference test tables:
func_fnv_test.go, func_murmur3_hash128_test.go, func_xxh3_test.go,
func_xxh128_test.go, func_insert_xml_test.go, func_remove_xml_test.go,
func_convert_*_xml_test.go."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.hashes import (
    fnv1a_64,
    murmur3_128_hex,
    xxh3_64,
    xxh3_64_hex,
    xxh3_128_hex,
)
from opentelemetry_collector_contrib_spark.functions.ottl import OTTL_FUNCTIONS as O
from opentelemetry_collector_contrib_spark.functions.xmledit import (
    convert_attributes_to_elements_value,
    convert_text_to_elements_value,
    insert_xml_value,
    remove_xml_value,
)


def test_registry_complete():
    # every reference factory name is present (editors Set/DeleteKey/
    # KeepKeys live in the statement compiler, not the converter registry)
    assert len(O) >= 121
    for name in ("FNV", "Murmur3Hash128", "XXH3", "XXH128", "UUIDv7",
                 "InsertXML", "RemoveXML", "ConvertAttributesToElementsXML",
                 "ConvertTextToElementsXML", "IsList", "IsMap",
                 "ExtractGrokPatterns"):
        assert name in O, name


# --- pure hash vectors (reference test tables) ------------------------------

def test_fnv_vectors():
    assert fnv1a_64(b"hello world") == 8618312879776256743      # func_fnv_test.go:26
    assert fnv1a_64(b"") == -3750763034362895579                # func_fnv_test.go:31


def test_murmur3_128_vectors():
    assert murmur3_128_hex(b"Hello World") == "dbc2a0c1ab26631a27b4c09fcf1fe683"
    assert murmur3_128_hex(b"") == "00000000000000000000000000000000"


def test_xxh3_vectors():
    assert xxh3_64_hex(b"hello world") == "d447b1ea40e6988b"    # func_xxh3_test.go:26
    assert xxh3_64_hex(b"") == "2d06800538d394c2"               # func_xxh3_test.go:31


def test_xxh128_vectors():
    assert xxh3_128_hex(b"hello world") == "df8d09e93f874900a99b8775cc15b6c7"
    assert xxh3_128_hex(b"") == "99aa06d3014798d86001c324468d497f"


def test_xxh3_all_length_paths_deterministic():
    """Every XXH3 size class (0/1-3/4-8/9-16/17-128/129-240/>240, incl.
    multi-block >1024) runs and is self-consistent. The ≤16-byte classes
    are reference-vector-validated above; longer classes share the same
    validated secret + primitives."""
    outs = set()
    for n in (1, 3, 4, 8, 9, 16, 17, 128, 129, 240, 241, 1024, 5000):
        data = bytes((i * 131 + 7) % 256 for i in range(n))
        h = xxh3_64(data)
        assert 0 <= h < (1 << 64)
        assert xxh3_64(data) == h
        outs.add(h)
    assert len(outs) == 13  # no accidental collisions between classes


# --- Column-level (pandas UDF) ---------------------------------------------

def test_hash_converters_on_spark(spark):
    df = spark.createDataFrame([("hello world",), (None,)], ["s"])
    r = df.select(
        O["FNV"]("s").alias("fnv"),
        O["XXH3"]("s").alias("x3"),
        O["XXH128"]("s").alias("x128"),
        O["Murmur3Hash128"](F.lit("Hello World")).alias("m3"),
    ).collect()
    assert r[0]["fnv"] == 8618312879776256743
    assert r[0]["x3"] == "d447b1ea40e6988b"
    assert r[0]["x128"] == "df8d09e93f874900a99b8775cc15b6c7"
    assert r[0]["m3"] == "dbc2a0c1ab26631a27b4c09fcf1fe683"
    assert r[1]["fnv"] is None and r[1]["x3"] is None


def test_uuid_v7_shape(spark):
    df = spark.range(50)
    rows = [r[0] for r in df.select(O["UUIDv7"]().alias("u")).collect()]
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
    assert all(pat.match(u) for u in rows)
    assert len(set(rows)) == 50  # random bits differ per row
    # time-ordered prefix: all rows share the query timestamp
    assert len({u[:13] for u in rows}) == 1


# --- XML editors ------------------------------------------------------------

def test_insert_xml():
    # func_insert_xml_test.go "insert single element"
    assert insert_xml_value("<a><b/></a>", "/a", "<c/>") == "<a><b /><c /></a>"
    # into deeper path, multiple targets
    assert insert_xml_value("<a><b/><b/></a>", "/a/b", "<c/>") == "<a><b><c /></b><b><c /></b></a>"
    assert insert_xml_value(None, "/a", "<c/>") is None


def test_remove_xml():
    # func_remove_xml_test.go "remove element"
    assert remove_xml_value("<a><b/><c/></a>", "/a/b") == "<a><c /></a>"
    # attribute removal via /@
    assert remove_xml_value('<a foo="bar"><b/></a>', "/a/@foo") == "<a><b /></a>"
    # text() removal
    assert remove_xml_value("<a>hello<b/></a>", "/a/text()") == "<a><b /></a>"
    # //-descendant form
    assert remove_xml_value("<a><x><b/></x><b/></a>", "//b") == "<a><x /></a>"


def test_convert_attributes_to_elements():
    # func_convert_attributes_to_elements_xml.go:44 docstring example
    out = convert_attributes_to_elements_value('<a foo="bar" hello="world"><b/></a>')
    assert out == "<a><b /><foo>bar</foo><hello>world</hello></a>"


def test_convert_text_to_elements():
    # mixed content wraps text runs; pure-text elements stay untouched
    assert convert_text_to_elements_value("<a>1<b/></a>") == "<a><value>1</value><b /></a>"
    assert convert_text_to_elements_value("<a>only text</a>") == "<a>only text</a>"
    assert (
        convert_text_to_elements_value("<a>x<b/>y</a>", element_name="t")
        == "<a><t>x</t><b /><t>y</t></a>"
    )


def test_xml_editors_on_spark(spark):
    df = spark.createDataFrame([("<a><b/></a>",)], ["x"])
    r = df.select(
        O["InsertXML"]("x", "/a", F.lit("<c/>")).alias("ins"),
        O["RemoveXML"]("x", "/a/b").alias("rm"),
    ).collect()[0]
    assert r["ins"] == "<a><b /><c /></a>"
    assert r["rm"] == "<a />"
