"""HLL sketch rollup guarantees: lossless merge + bounded error.

DuckDB cannot reproduce DataSketches binary state, so this family is
pytest-gated (like the exponential→native-histogram kernel): the merge
identity is checked EXACTLY and the accuracy against exact distinct is
checked within the published HLL error bound.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.sketches import (
    distinct_sketch_rollup,
    merge_sketch_rollup,
    sketch_estimates,
)

LG_K = 12


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet").withColumn(
        "day", F.date_trunc("day", "ts")
    )


def test_merged_hourly_equals_direct_daily(spark, events):
    hourly = distinct_sketch_rollup(
        events,
        ["day", F.date_trunc("hour", "ts").alias("hour"), "event_type"],
        "user_id",
        lg_k=LG_K,
    )
    rolled = sketch_estimates(merge_sketch_rollup(hourly, ["day", "event_type"]))
    direct = sketch_estimates(
        distinct_sketch_rollup(events, ["day", "event_type"], "user_id", lg_k=LG_K)
    )
    a = {
        (r.day, r.event_type): (r.distinct_estimate, r.n_rows)
        for r in rolled.collect()
    }
    b = {
        (r.day, r.event_type): (r.distinct_estimate, r.n_rows)
        for r in direct.collect()
    }
    assert a == b  # lossless merge: identical estimates AND row counts


def test_estimates_within_hll_error_bound(spark, events):
    est = {
        r.event_type: r.distinct_estimate
        for r in sketch_estimates(
            distinct_sketch_rollup(events, ["event_type"], "user_id", lg_k=LG_K)
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    # published HLL relative standard error ~1.04/sqrt(2^lg_k); allow 3 sigma
    bound = 3 * 1.04 / math.sqrt(2**LG_K)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, bound * n), (k, est[k], n)


def test_global_rollup_from_fine_tier(spark, events):
    """The cube shape: the global distinct comes from the stored fine
    tier by one more union, never from raw data."""
    fine = distinct_sketch_rollup(events, ["day", "event_type"], "user_id", lg_k=LG_K)
    total = sketch_estimates(
        fine.groupBy().agg(
            F.hll_union_agg("hll").alias("hll"), F.sum("n_rows").alias("n_rows")
        )
    ).collect()[0]
    exact_total = events.select(F.count_distinct("user_id")).collect()[0][0]
    bound = 3 * 1.04 / math.sqrt(2**LG_K)
    assert abs(total.distinct_estimate - exact_total) <= max(2, bound * exact_total)
    assert total.n_rows == events.count()
