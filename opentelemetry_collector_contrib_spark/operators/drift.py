"""Distribution-drift monitoring: population stability index between a
reference window and a current window.

A 100 TB ingest pipeline needs a cheap daily answer to "did the data
change shape?" before bad upstream pushes poison training corpora — the
curation-side counterpart of the reference's threshold alerting (our
`threshold_transitions`), watching distributions instead of levels. PSI
is the standard gate: bucket a feature identically on both sides,
compare proportions; psi < 0.1 stable, 0.1-0.25 moderate shift, > 0.25
investigate.

Plan shape: one tiny global min/max aggregate (broadcast back via a
literal-key join — never a collect, never a crossJoin), then ONE hash
aggregate over (side, bucket) and a pivot-free reshape. The shuffle
carries `2 × n_buckets` rows per feature regardless of input size.
Smoothing: proportions are floored at ``eps`` so empty buckets
contribute a large-but-finite term instead of ±inf (the standard PSI
practice), keeping the statistic engine-portable and NaN-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_drift(
    df: DataFrame,
    feature: Column,
    is_current: Column,
    n_buckets: int = 10,
    eps: float = 1e-6,
    feature_name: str = "feature",
) -> DataFrame:
    """Per-bucket PSI terms between the reference side
    (``is_current`` false) and the current side (true).

    Buckets are fixed-width over the COMBINED min/max (both sides see
    identical bucket edges — bucketing per side would hide drift);
    rows with a NULL feature are excluded on both sides alike. Output:
    one row per bucket with both proportions and the PSI term
    (rounded to 6 for engine portability); sum(psi_term) is the PSI.
    """
    base = df.select(
        feature.cast("double").alias("x"), is_current.alias("cur")
    ).filter(F.col("x").isNotNull())
    bounds = base.groupBy().agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    ).withColumn("k", F.lit(1))
    b = base.withColumn("k", F.lit(1)).join(F.broadcast(bounds), "k").drop("k")
    width = (F.col("mx") - F.col("mn")) / F.lit(n_buckets)
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("x") - F.col("mn")) / width).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    counts = b.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_cur"),
    )
    tot = counts.groupBy().agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
    ).withColumn("k", F.lit(1))
    out = counts.withColumn("k", F.lit(1)).join(F.broadcast(tot), "k").drop("k")
    p_ref = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    p_cur = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    return out.select(
        F.lit(feature_name).alias("feature"),
        "bucket",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * (F.log(p_cur) - F.log(p_ref)), 6).alias(
            "psi_term"
        ),
    )


def psi_drift_categorical(
    df: DataFrame,
    feature: Column,
    is_current: Column,
    eps: float = 1e-6,
    feature_name: str = "feature",
) -> DataFrame:
    """Categorical PSI: one bucket per category value (NULL categories
    tracked as their own bucket — a surge of NULLs IS drift). Same
    smoothing and output contract as the numeric variant; categories are
    their own edges, so no bounds pass is needed."""
    base = df.select(
        F.coalesce(feature.cast("string"), F.lit("<null>")).alias("cat"),
        is_current.alias("cur"),
    )
    counts = base.groupBy("cat").agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_cur"),
    )
    tot = counts.groupBy().agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
    ).withColumn("k", F.lit(1))
    out = counts.withColumn("k", F.lit(1)).join(F.broadcast(tot), "k").drop("k")
    p_ref = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    p_cur = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    return out.select(
        F.lit(feature_name).alias("feature"),
        "cat",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * (F.log(p_cur) - F.log(p_ref)), 6).alias(
            "psi_term"
        ),
    )
