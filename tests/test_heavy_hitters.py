"""Heavy hitters: the Misra-Gries candidates -> exact-recount pattern.

Guarantees under test:
* output EQUALS the exact > n*frac answer (the superset guarantee makes
  verification exact, not approximate) — on uniform, Zipf-skewed, and
  adversarially partition-split inputs;
* the candidate set actually prunes (<< distinct items) on skewed data,
  i.e. the shuffle never carries the full cardinality;
* the aggregation collapses non-candidates into one key (plan-level:
  at most |candidates|+1 groups reach the final filter).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opentelemetry_collector_contrib_spark.operators.sketches import (
    heavy_hitter_candidates,
    heavy_hitters,
)


def _exact(items, frac):
    return (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("total", F.sum("cnt").over(Window.partitionBy()))
        .filter(F.col("cnt") > F.col("total") * F.lit(frac))
        .select(
            "item",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 9).alias("freq"),
        )
    )


def _assert_equal(got, want):
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.fixture(scope="module")
def zipf_items(spark):
    # Deterministic Zipf-ish stream: item i appears ~ N/(i+1) times,
    # 2000 distinct items, ~15k rows, scattered over 8 partitions by a
    # hash-unfriendly interleaving (repartition on the value itself would
    # presort items into partitions and make MG's job artificially easy).
    n_items = 2000
    ids = spark.range(0, n_items, numPartitions=4)
    rows = ids.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.lit(2000) / (F.col("id") + 1)).cast("int")),
                lambda r: F.concat(F.lit("w"), F.col("id").cast("string")),
            )
        ).alias("item"),
        (F.col("id") % 97).alias("salt"),
    )
    return rows.repartition(8, "salt").select("item").persist()


def test_exact_on_zipf(zipf_items):
    got = heavy_hitters(zipf_items, "item", 0.01)
    _assert_equal(got, _exact(zipf_items, 0.01))
    assert got.count() > 0


def test_candidates_prune_and_cover(zipf_items):
    k = 101  # 1/frac + 1
    cand = heavy_hitter_candidates(zipf_items, "item", k)
    n_cand = cand.count()
    n_distinct = zipf_items.distinct().count()
    # bounded by k * partitions, and far below the vocabulary
    assert n_cand <= k * zipf_items.rdd.getNumPartitions()
    assert n_cand < n_distinct / 2
    # superset guarantee: every exact heavy hitter is a candidate
    missing = (
        _exact(zipf_items, 0.01)
        .join(cand, "item", "left_anti")
        .count()
    )
    assert missing == 0


def test_uniform_below_threshold_yields_empty(spark):
    items = spark.range(0, 5000, numPartitions=6).select(
        F.concat(F.lit("u"), (F.col("id") % 500).cast("string")).alias("item")
    )
    # every item is exactly 10/5000 = 0.002 of the stream; > 0.002 is empty
    assert heavy_hitters(items, "item", 0.002).count() == 0
    # and at half that threshold every item qualifies (exactness both ways)
    got = heavy_hitters(items, "item", 0.001)
    _assert_equal(got, _exact(items, 0.001))
    assert got.count() == 500


def test_adversarial_partition_split(spark):
    # A heavy item spread thinly across every partition must still
    # surface: 12 partitions, item "hot" is 30% globally but mixed with
    # partition-local noise that MG must burn counters on.
    hot = spark.range(0, 3000, numPartitions=12).select(F.lit("hot").alias("item"))
    noise = spark.range(0, 7000, numPartitions=12).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("item")
    )
    items = hot.unionAll(noise)
    got = heavy_hitters(items, "item", 0.25)
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["item"] == "hot" and rows[0]["cnt"] == 3000


def test_single_shuffle_small_keyspace(zipf_items):
    plan = (
        heavy_hitters(zipf_items, "item", 0.01)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one broadcast join for the candidate flag, never a sort-merge join
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
