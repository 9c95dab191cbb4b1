"""AQE skew-join evidence: the north rule names "AQE skew-join handling"
explicitly — this pins that the session config actually produces a
skew-split sort-merge join on a pathologically skewed key, not just that
the flag is set.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    # shrink the thresholds so the test fixture's skew (one conv with 200k
    # turns vs 1-row convs) crosses them the same way a monster
    # conversation crosses the defaults at 100 TB
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        hot = spark.range(200_000).select(
            F.lit("conv-hot").alias("conv_id"), F.col("id").alias("turn_idx")
        )
        cold = spark.range(100).select(
            F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
        )
        facts = hot.unionByName(cold)
        # dim built independently (not via distinct()): AQE's
        # OptimizeSkewedJoin only splits when the join's children are plain
        # Sort + shuffle stages — an aggregate in between disqualifies it,
        # exactly as it would in the real per-conv dim-join topology
        dim = spark.range(101).select(
            F.when(F.col("id") == 100, F.lit("conv-hot"))
            .otherwise(F.concat(F.lit("conv-"), F.col("id")))
            .alias("conv_id"),
            F.lit(1.0).alias("w"),
        )
        joined = facts.join(dim, "conv_id")
        # execute THIS DataFrame's own QueryExecution (count()/write() run
        # clones whose adaptive plans we can't inspect), then read the
        # finalized adaptive plan
        assert len(joined.collect()) == 200_100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, "AQE did not mark the skewed join"
    finally:
        for k, v in saved.items():
            conf.set(k, v)
