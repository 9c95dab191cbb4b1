"""Bucketed co-location plan assertions: the conv_id shuffle is paid
once at write time, then per-conversation plans contain ZERO Exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.bucketing import (
    exchange_count,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, t1, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    name = "t1_bucketed_conv"
    write_bucketed(t1, name, str(base / "t1"), n_buckets=8)
    yield read_bucketed(spark, name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_roundtrip_preserves_rows(spark, t1, bucketed):
    assert bucketed.count() == t1.count()
    a = sorted(r.conv_id for r in t1.select("conv_id").distinct().collect())
    b = sorted(r.conv_id for r in bucketed.select("conv_id").distinct().collect())
    assert a == b


def test_groupby_on_bucket_key_has_no_exchange(t1, bucketed):
    agg = bucketed.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    assert exchange_count(agg) == 0
    # the same aggregate over the plain parquet scan DOES shuffle
    plain = t1.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    plain.collect()
    assert exchange_count(plain) >= 1


def test_window_on_bucket_key_has_no_exchange(bucketed):
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    df = bucketed.select("conv_id", "turn_idx", F.row_number().over(w).alias("rn"))
    df.collect()
    assert exchange_count(df) == 0


def test_bucketed_self_join_has_no_exchange(spark, bucketed):
    """Two tables bucketed the same way sort-merge join with zero
    shuffles on either side (dimension-scale broadcast disabled to
    force the join strategy the 100 TB case would use)."""
    convs = bucketed.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.join(convs, "conv_id").select(
            "conv_id", "turn_idx", "n_turns"
        )
        joined.collect()
        assert exchange_count(joined) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_matches_unbucketed(t1, bucketed):
    a = {
        r.conv_id: r.n
        for r in t1.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    b = {
        r.conv_id: r.n
        for r in bucketed.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert a == b
