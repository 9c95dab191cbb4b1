"""JPEG header decode (bounded marker walk) and registrable-domain
extraction / per-domain caps — adversarial cases the SQL oracles don't
reach: hostile declared segment sizes, marker-less junk, PSL edge rules.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.curation import (
    domain_cap,
    registrable_domain,
)
from opentelemetry_collector_contrib_spark.operators.multimodal import (
    _jpeg_bytes,
    decode_jpeg_meta,
    synthesize_jpeg,
)


def _decode_one(spark, payload: bytes):
    df = spark.createDataFrame([(payload,)], "jpeg binary")
    return decode_jpeg_meta(df).select("jpeg_meta.*").first()


def test_jpeg_roundtrip_fields(spark):
    ids = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    out = decode_jpeg_meta(synthesize_jpeg(ids)).select("doc_id", "jpeg_meta.*")
    bad = out.filter(
        (F.col("valid") != (F.pmod("doc_id", F.lit(13)) != 0))
        | (F.col("valid") & (F.col("width") != 1 + F.pmod("doc_id", F.lit(200))))
        | (F.col("valid") & (F.col("height") != 1 + F.pmod("doc_id", F.lit(120))))
        | (F.col("valid") & (F.col("progressive") != (F.pmod("doc_id", F.lit(4)) == 0)))
    ).count()
    assert bad == 0


def test_jpeg_hostile_declared_length(spark):
    # APP0 claims 0xFFFF bytes but the buffer holds 20 — the walk must
    # fail the row fast (bounds check), not scan past the end.
    hostile = b"\xff\xd8\xff\xe0\xff\xff" + b"\x00" * 14
    row = _decode_one(spark, hostile)
    assert row.valid is False and row.width is None


def test_jpeg_zero_length_segment(spark):
    # declared length < 2 is malformed (length includes itself)
    row = _decode_one(spark, b"\xff\xd8\xff\xe0\x00\x01\x00")
    assert row.valid is False


def test_jpeg_junk_and_empty(spark):
    assert _decode_one(spark, b"").valid is False
    assert _decode_one(spark, b"GIF89a").valid is False
    assert _decode_one(spark, b"\xff\xd8").valid is False  # SOI then EOF


def test_jpeg_rst_markers_skipped(spark):
    # stand-alone RST/TEM markers between segments must not desync the walk
    base = _jpeg_bytes(5)
    patched = base[:2] + b"\xff\xd0\xff\x01" + base[2:]
    row = _decode_one(spark, patched)
    assert row.valid is True and row.width == 6 and row.height == 6


def _rd(spark, host: str | None):
    df = spark.createDataFrame([(host,)], "host string")
    return registrable_domain(df, "host").first().rd_domain


@pytest.mark.parametrize(
    ("host", "want"),
    [
        ("news.example.com", "example.com"),
        ("a.b.news.example.com", "example.com"),
        ("shop.example.co.uk", "example.co.uk"),
        ("sub.project.github.io", "project.github.io"),
        ("github.io", None),  # host IS a public suffix
        ("co.uk", None),
        ("example.com", "example.com"),
        ("EXAMPLE.Com", "example.com"),  # case-normalized
        ("node7.internal-corp", "node7.internal-corp"),  # PSL default rule
        ("localhost", None),  # single unknown label
        (None, None),
    ],
)
def test_registrable_domain_rules(spark, host, want):
    assert _rd(spark, host) == want


def test_domain_cap_keeps_null_domains_and_caps_big(spark):
    rows = (
        [(i, "x.bulk.com") for i in range(30)]
        + [(100 + i, "y.small.org") for i in range(3)]
        + [(200, "co.uk"), (201, "co.uk")]
    )
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = domain_cap(df, "host", cap=10, order_col="doc_id")
    got = {r.doc_id: r.dc_keep for r in out.collect()}
    kept_bulk = [i for i in range(30) if got[i]]
    assert kept_bulk == list(range(10))  # deterministic: lowest doc_ids win
    assert all(got[100 + i] for i in range(3))
    assert got[200] and got[201]  # unattributable rows always kept
