"""Distribution-drift monitoring: population stability index between a
reference window and a current window.

A 100 TB ingest pipeline needs a cheap daily answer to "did the data
change shape?" before bad upstream pushes poison training corpora — the
curation-side counterpart of the reference's threshold alerting (our
`threshold_transitions`), watching distributions instead of levels. PSI
is the standard gate: bucket a feature identically on both sides,
compare proportions; psi < 0.1 stable, 0.1-0.25 moderate shift, > 0.25
investigate.

Plan shape: the numeric variant's bucket edges come from a two-scalar
min/max aggregate collected driver-side and inlined as literals (the
same justified-tiny-collect pattern as the IVF centroid inlining —
2 doubles, never data rows; a literal-key join would plan a
BroadcastNestedLoopJoin and a global window would funnel every row to
one partition). After that: ONE hash aggregate over buckets; side
totals are an unpartitioned window over the n_buckets-row counts frame
(bounded by bucket count, not input). The shuffle carries
``2 × n_buckets`` rows per feature regardless of input size.
Smoothing: proportions are floored at ``eps`` so empty buckets
contribute a large-but-finite term instead of ±inf (standard PSI
practice), keeping the statistic engine-portable and NaN-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _psi_select(counts: DataFrame, bucket_col: str, feature_name: str, eps: float):
    tot = Window.partitionBy()  # over the tiny counts frame only — never raw rows
    t_ref = F.sum("n_ref").over(tot)
    t_cur = F.sum("n_cur").over(tot)
    p_ref = F.greatest(F.col("n_ref") / t_ref, F.lit(eps))
    p_cur = F.greatest(F.col("n_cur") / t_cur, F.lit(eps))
    return counts.select(
        F.lit(feature_name).alias("feature"),
        bucket_col,
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * (F.log(p_cur) - F.log(p_ref)), 6).alias(
            "psi_term"
        ),
    )


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
    one row per non-empty bucket with both proportions and the PSI term
    (rounded to 6 for engine portability); sum(psi_term) is the PSI.
    """
    base = df.select(
        feature.cast("double").alias("x"), is_current.alias("cur")
    ).filter(F.col("x").isNotNull())
    row = base.agg(F.min("x").alias("mn"), F.max("x").alias("mx")).first()
    mn, mx = row["mn"], row["mx"]
    if mn is None or mx is None or mx == mn:
        bucket = F.lit(0)
    else:
        width = (mx - mn) / n_buckets
        bucket = F.least(
            F.floor((F.col("x") - F.lit(mn)) / F.lit(width)).cast("int"),
            F.lit(n_buckets - 1),
        )
    counts = base.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_cur"),
    )
    return _psi_select(counts, "bucket", feature_name, eps)


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
    their own edges, so no bounds pass is needed and the whole statistic
    is ONE hash aggregate + a window over the category-count frame."""
    base = df.select(
        F.coalesce(feature.cast("string"), F.lit("<null>")).alias("cat"),
        is_current.alias("cur"),
    )
    counts = base.groupBy("cat").agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_cur"),
    )
    return _psi_select(counts, "cat", feature_name, eps)


def ks_drift(
    df: DataFrame,
    feature: Column,
    is_current: Column,
    grid: int = 10_000,
    feature_name: str = "feature",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic on a bounded
    quantization grid — the exact-ECDF complement to the bucketed PSI.

    A true KS needs the global ECDF, which at 100 TB would mean a global
    sort; instead the feature is quantized onto a ``grid``-cell lattice
    over the combined range (bounds inlined driver-side, two scalars),
    so the running-sum window runs over AT MOST ``grid`` count rows
    regardless of input size — the quantization error is ≤ range/grid.
    Output: ONE row — side totals, the KS statistic (max |ECDF gap|,
    rounded to 6), and the first grid cell where the max gap occurs.
    """
    base = df.select(
        feature.cast("double").alias("x"), is_current.alias("cur")
    ).filter(F.col("x").isNotNull())
    row = base.agg(F.min("x").alias("mn"), F.max("x").alias("mx")).first()
    mn, mx = row["mn"], row["mx"]
    if mn is None or mx is None or mx == mn:
        cell = F.lit(0)
    else:
        w = (mx - mn) / grid
        cell = F.least(
            F.floor((F.col("x") - F.lit(mn)) / F.lit(w)).cast("int"),
            F.lit(grid - 1),
        )
    counts = base.groupBy(cell.alias("cell")).agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).cast("bigint").alias("n_cur"),
    )
    tot = Window.partitionBy()  # ≤ grid rows
    run = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, 0)
    d = counts.select(
        "cell",
        "n_ref",
        "n_cur",
        (
            F.sum("n_ref").over(run) / F.sum("n_ref").over(tot)
            - F.sum("n_cur").over(run) / F.sum("n_cur").over(tot)
        ).alias("gap"),
    )
    return d.groupBy().agg(
        F.lit(feature_name).alias("feature"),
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"),
        F.round(F.max(F.abs(F.col("gap"))), 6).alias("ks_stat"),
        F.min_by("cell", F.struct((-F.abs(F.col("gap"))).alias("g"), F.col("cell"))).alias("ks_at"),
    )


def window_diff(
    df: DataFrame,
    keys: list[str],
    is_current: Column,
    min_total: int = 1,
) -> DataFrame:
    """Key-population diff between a reference window (``is_current``
    false) and a current window (true) — the "what changed" companion of
    PSI/KS above, which answer "did it change". Applied to masked log
    templates this is the incident primitive ("which error shape is NEW
    since the deploy"); applied to plain keys it is the top-movers table
    a daily corpus/telemetry report leads with. A key's verdict:

      new    — absent from reference, present now
      gone   — present in reference, absent now
      grew / shrank / stable — both sides present, by count comparison

    plus ``ratio`` = n_cur/n_ref rounded 6 (NULL for new keys, where no
    reference denominator exists — NULL is honest; 'inf' is not
    portable). ``min_total`` drops keys whose combined count is below the
    noise floor BEFORE any verdict, so one stray row doesn't report a
    "new" template per log line.

    Scale: exactly ONE hash aggregate over the key columns (both side
    counts are conditional sums inside it, map-side combined); the
    verdict/ratio are projections on the aggregated frame (rows =
    distinct keys). No joins, no windows, no second pass — the two-frame
    full-outer-join formulation this replaces shuffles the input twice
    and loses map-side combine on the join key."""
    sided = df.select(*[F.col(k) for k in keys], is_current.alias("_cur"))
    counts = sided.groupBy(*keys).agg(
        F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("_cur"), 1).otherwise(0)).cast("bigint").alias("n_cur"),
    )
    status = (
        F.when(F.col("n_ref") == 0, F.lit("new"))
        .when(F.col("n_cur") == 0, F.lit("gone"))
        .when(F.col("n_cur") > F.col("n_ref"), F.lit("grew"))
        .when(F.col("n_cur") < F.col("n_ref"), F.lit("shrank"))
        .otherwise(F.lit("stable"))
    )
    ratio = F.when(
        F.col("n_ref") > 0, F.round(F.col("n_cur") / F.col("n_ref"), 6)
    )
    return (
        counts.filter(F.col("n_ref") + F.col("n_cur") >= min_total)
        .withColumn("status", status)
        .withColumn("ratio", ratio)
    )


def embedding_drift(
    emb: DataFrame,
    group_col: str,
    is_current: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift per group: cosine between the REFERENCE
    window's centroid (mean vector) and the CURRENT window's — the check
    a retrieval/dedup pipeline runs when the upstream embedding model or
    content mix changes (PSI/KS above watch scalar distributions; vector
    spaces drift by direction, which only the centroid angle sees).
    centroid_cos ≈ 1 means the space is stable; a drop flags re-indexing
    (IVF centroids, ANN thresholds) before recall silently decays.

    Output: (group, n_ref, n_cur, centroid_cos double) — NULL cosine when
    either side is empty or a centroid is all-zero (honest absence).

    Scale: one posexplode melt (dim× rows, fused into the scan) → ONE
    (group, side, dim) hash aggregate (map-side combined, fixed-width
    rows) → per-(group, side) sorted re-assembly into an array — the
    shuffle carries groups × sides × dims rows, never vectors — then a
    self-join ON GROUP of the tiny centroid frame. The sequential-fold
    cosine pins float order, matching the DuckDB oracle exactly."""
    from .dedup import cosine

    sided = emb.select(
        F.col(group_col).alias("grp"),
        is_current.alias("_cur"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    cents = (
        sided.groupBy("grp", "_cur", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("m"), F.count(F.lit(1)).alias("n"))
        .groupBy("grp", "_cur")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("entries"),
            F.max("n").alias("n_rows"),
        )
        .select(
            "grp",
            "_cur",
            F.transform(F.col("entries"), lambda e: e["m"]).alias("centroid"),
            "n_rows",
        )
    )
    ref = cents.filter(~F.col("_cur")).select(
        "grp", F.col("centroid").alias("c_ref"), F.col("n_rows").alias("n_ref")
    )
    cur = cents.filter(F.col("_cur")).select(
        "grp", F.col("centroid").alias("c_cur"), F.col("n_rows").alias("n_cur")
    )
    joined = ref.join(cur, "grp", "full")
    return joined.select(
        F.col("grp").alias(group_col),
        F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        F.when(
            F.col("c_ref").isNotNull() & F.col("c_cur").isNotNull(),
            F.round(cosine(F.col("c_ref"), F.col("c_cur")), 6),
        ).alias("centroid_cos"),
    )
