"""Bloom-filter join pruning (operators/enrich.py).

The contract under test: (1) the filter NEVER drops a true match (same
seeded-xxhash64 family on both sides → no false negatives), so bloom_join
is exactly the plain join; (2) the prune is real — the surviving probe
fraction is close to match-fraction + fpp; (3) sizing math is sane.
Mirrors the guarantees Spark's runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.*) provides implicitly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.enrich import (
    bloom_build,
    bloom_join,
    bloom_might_contain,
    bloom_parameters,
)


def test_bloom_parameters_sizing():
    bits, hashes = bloom_parameters(1000, 0.01)
    assert bits % 64 == 0
    # textbook sizing: ~9.6 bits/key and ~7 hashes at 1% fpp
    assert 9 * 1000 <= bits <= 11 * 1000
    assert hashes == 7
    with pytest.raises(ValueError):
        bloom_parameters(0, 0.01)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bits, hashes = bloom_parameters(500, 0.01)
    bitmap = bloom_build(keys, "k", bits, hashes)
    assert len(bitmap) == bits // 64
    # every inserted key must test positive
    hits = keys.filter(bloom_might_contain(F.col("k"), bitmap, hashes)).count()
    assert hits == 500


def test_bloom_fpp_bounded(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    bits, hashes = bloom_parameters(1000, 0.01)
    bitmap = bloom_build(keys, "k", bits, hashes)
    # disjoint probe domain: observed fp rate should be near 1%
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probe.filter(bloom_might_contain(F.col("k"), bitmap, hashes)).count()
    assert fp / 20_000 < 0.03


def test_bloom_join_exact_vs_plain(spark):
    big = spark.range(0, 20_000).select(
        (F.col("id") % 997).alias("key"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 50).select(
        (F.col("id") * 7).alias("dkey"), (F.col("id") * 100).alias("attr")
    )
    out = bloom_join(big, dim, "key", "dkey").select("key", "payload", "attr")
    plain = big.join(dim, big["key"] == dim["dkey"]).select("key", "payload", "attr")
    assert out.exceptAll(plain).count() == 0
    assert plain.exceptAll(out).count() == 0


def test_bloom_join_left_keeps_misses(spark):
    big = spark.range(0, 100).select(F.col("id").alias("key"))
    dim = spark.range(0, 10).select(F.col("id").alias("key2"), F.lit("x").alias("attr"))
    out = bloom_join(big, dim, "key", "key2", how="left")
    # left join must preserve every probe row even when bloom-pruning
    # would have dropped it for an inner join
    assert out.count() == 100
    assert out.filter(F.col("attr").isNull()).count() == 90


def test_bloom_prunes_probe_side(spark):
    big = spark.range(0, 50_000).select((F.col("id") % 10_000).alias("key"))
    dim = spark.range(0, 100).select(F.col("id").alias("key"))
    bits, hashes = bloom_parameters(100, 0.01)
    bitmap = bloom_build(dim, "key", bits, hashes)
    kept = big.filter(bloom_might_contain(F.col("key"), bitmap, hashes)).count()
    # true match fraction is 1% (100 of 10k key values); with 1% fpp the
    # surviving fraction must stay well under 5%
    assert kept >= 500  # all true matches survive (5 rows per key value)
    assert kept <= 0.05 * 50_000


def test_bloom_join_left_shared_key_name(spark):
    # right_key defaults to left_key: dim's key column shares the probe's
    # name — the misses branch must neither clobber probe keys with NULL
    # nor break the union on duplicate names
    big = spark.range(0, 50).select(F.col("id").alias("key"), (F.col("id") * 2).alias("payload"))
    dim = spark.range(0, 10).select(F.col("id").alias("key"), F.lit("x").alias("attr"))
    out = bloom_join(big, dim, "key", how="left")
    rows = {r["key"]: r for r in out.collect()}
    assert len(rows) == 50
    assert rows[5]["attr"] == "x"
    assert rows[45]["attr"] is None and rows[45]["key"] == 45  # key survives
    assert rows[45]["payload"] == 90
