"""Distributed two-pass global rank / prefix-sum.

An unpartitioned ``Window.orderBy(...)`` is the classic corpus-scale
trap: Spark plans it as ``Exchange SinglePartition`` + one-executor sort
(and warns "No Partition Defined for Window operation"), so a 10^12-row
rank funnels the whole table through one task. These helpers produce the
SAME integer-exact answer with no single-partition stage:

1. freeze range boundaries on the driver (seeded sample of the leading
   order key, collected ONCE — after that every job sees identical
   literals, so the repartitionByRange resample hazard can't bite);
2. assign each row a bucket = #boundaries strictly below its key — a
   monotone, deterministic, whole-stage-codegen fold over a literal
   array (ties on the key always share a bucket, so any tiebreaker
   ordering stays entirely within one bucket);
3. count (or sum) per bucket, collect the ≤``buckets``-row result, and
   turn it into broadcast cumulative offsets;
4. rank = per-bucket ``row_number()`` (window partitioned by bucket —
   a balanced hash exchange, never SinglePartition) + broadcast offset.

Cost: two extra scans of the input (count/boundary sample + per-bucket
counts) instead of a single-executor sort of the entire corpus — the
right trade at scale; callers with expensive upstreams should persist
before ranking. Skew note: a single key value with billions of
duplicates lands in one bucket by construction; for such inputs rank the
``groupBy(key).count()`` rollup and join back (see ``auc_rank_sum``).

Reference parity: replaces the single-partition windows flagged in the
round-3 verdict (vocab_growth, quantile_normalize, ntile/decile and
Mann-Whitney rank sites) with the plan you would actually run at
100 TB; output hashes are byte-identical because the composed order
(bucket, order_spec...) equals the total order of order_spec whenever
order_spec is a total order (unique tiebreaker).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

__all__ = ["global_row_number", "global_prefix_sum", "global_ntile"]

_SEED = 0x5EED


def _order_cols(order_spec: list[tuple[str, str]]) -> list[Column]:
    cols = []
    for name, direction in order_spec:
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        c = F.col(name)
        # match Spark's defaults (asc→nulls first, desc→nulls last) so the
        # composed order equals a plain Window.orderBy of the same spec
        cols.append(c.asc() if direction == "asc" else c.desc())
    return cols


def _bucketize(
    df: DataFrame,
    order_spec: list[tuple[str, str]],
    buckets: int,
    sample_target: int | None,
    total: int,
) -> DataFrame:
    """Stamp ``_gbkt`` — a deterministic monotone bucket of the leading
    order key. NULL keys get bucket -1 (asc: sorts first; desc: last —
    matching Spark's null ordering defaults for both directions)."""
    key, _ = order_spec[0]
    kcol = F.col(key)
    bnds: list = []
    if total > 1 and buckets > 1:
        target = sample_target or buckets * 200
        frac = min(1.0, target / total)
        sample = sorted(
            r[0]
            for r in df.select(kcol.alias("_k"))
            .where(F.col("_k").isNotNull())
            .sample(False, frac, seed=_SEED)
            .collect()
        )
        if sample:
            seen = set()
            for i in range(1, buckets):
                b = sample[min(len(sample) - 1, (i * len(sample)) // buckets)]
                if b not in seen:
                    seen.add(b)
                    bnds.append(b)
            bnds.sort()
    if bnds:
        barr = F.array(*[F.lit(b) for b in bnds])
        bkt = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(b < kcol, 1).otherwise(F.lit(0)),
        )
    else:
        bkt = F.lit(0)
    return df.withColumn(
        "_gbkt", F.when(kcol.isNull(), F.lit(-1)).otherwise(bkt).cast("int")
    )


def _offsets(
    staged: DataFrame, weight: Column, descending: bool
) -> tuple[DataFrame, int]:
    """Collect per-bucket weights (≤ ``buckets`` rows) and return a
    broadcastable (bucket, exclusive-prefix-offset) frame + grand total."""
    rows = (
        staged.groupBy("_gbkt").agg(F.sum(weight).cast("long").alias("_w")).collect()
    )
    counts = {r["_gbkt"]: (r["_w"] or 0) for r in rows}
    # asc: bucket -1 (nulls) first; desc: reverse numeric order puts -1 last
    acc = 0
    off = []
    for b in sorted(counts, reverse=descending):
        off.append((b, acc))
        acc += counts[b]
    spark = staged.sparkSession
    off_df = spark.createDataFrame(
        off or [(0, 0)], "`_gbkt` INT, `_goff` LONG"
    )
    return broadcast(off_df), acc


def global_row_number(
    df: DataFrame,
    order_spec: list[tuple[str, str]],
    *,
    out_col: str = "_gr",
    buckets: int = 64,
    sample_target: int | None = None,
) -> tuple[DataFrame, int]:
    """1-based global ``row_number`` over ``order_spec`` (list of
    ``(column, "asc"|"desc")``; the FIRST entry drives range bucketing,
    the rest are tiebreakers) with no single-partition stage.

    Returns ``(df + out_col, total_row_count)``; the count comes free
    from the offset pass, so callers replace their ``count().over(all)``
    windows with a literal. Eager: triggers two bounded collect jobs
    (boundary sample + per-bucket counts) at call time.

    Exactness: identical to ``row_number().over(Window.orderBy(spec))``
    whenever the spec is a total order (unique tiebreaker); with ties the
    usual row_number arbitrariness applies in both forms.
    """
    if not order_spec:
        raise ValueError("order_spec must name at least one column")
    total = df.count()
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("long")), 0
    staged = _bucketize(df, order_spec, buckets, sample_target, total)
    descending = order_spec[0][1] == "desc"
    off_df, acc = _offsets(staged, F.lit(1), descending)
    w = Window.partitionBy("_gbkt").orderBy(*_order_cols(order_spec))
    out = (
        staged.join(off_df, "_gbkt")
        .withColumn(out_col, (F.row_number().over(w) + F.col("_goff")).cast("long"))
        .drop("_gbkt", "_goff")
    )
    return out, total


def global_prefix_sum(
    df: DataFrame,
    order_spec: list[tuple[str, str]],
    sum_col: str,
    *,
    out_col: str = "_gps",
    inclusive: bool = False,
    buckets: int = 64,
    sample_target: int | None = None,
) -> tuple[DataFrame, int]:
    """Global running sum of ``sum_col`` in ``order_spec`` order, same
    two-pass machinery as :func:`global_row_number` (offsets accumulate
    per-bucket SUMS instead of counts). ``inclusive=False`` gives the
    exclusive prefix (sum of strictly-preceding rows) — the building
    block for "how many rows rank below mine" joins such as Mann-Whitney
    mid-ranks. Returns ``(df + out_col, grand_total_of_sum_col)``."""
    if not order_spec:
        raise ValueError("order_spec must name at least one column")
    total = df.count()
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("long")), 0
    staged = _bucketize(df, order_spec, buckets, sample_target, total)
    descending = order_spec[0][1] == "desc"
    off_df, grand = _offsets(staged, F.col(sum_col).cast("long"), descending)
    w = Window.partitionBy("_gbkt").orderBy(*_order_cols(order_spec))
    upper = 0 if inclusive else -1
    local = F.coalesce(
        F.sum(F.col(sum_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, upper)
        ),
        F.lit(0),
    )
    out = (
        staged.join(off_df, "_gbkt")
        .withColumn(out_col, (local + F.col("_goff")).cast("long"))
        .drop("_gbkt", "_goff")
    )
    return out, grand


def global_ntile(
    df: DataFrame,
    order_spec: list[tuple[str, str]],
    n: int,
    *,
    out_col: str = "_tile",
    buckets: int = 64,
) -> tuple[DataFrame, int]:
    """Distributed ``ntile(n)`` over a global order: derives the tile
    from the two-pass global row_number with Spark's exact ntile split
    (first ``total mod n`` tiles get ``total div n + 1`` rows), so the
    result is bit-identical to ``ntile(n).over(Window.orderBy(spec))``
    under a total order — without the SinglePartition sort."""
    if n < 1:
        raise ValueError("n must be >= 1")
    ranked, total = global_row_number(
        df, order_spec, out_col="_gr_ntile", buckets=buckets
    )
    if total == 0:
        return ranked.withColumnRenamed("_gr_ntile", out_col), 0
    q, rem = divmod(total, n)
    big = rem * (q + 1)
    if q == 0:
        # fewer rows than tiles: tile == rank
        tile = F.col("_gr_ntile")
    else:
        tile = F.expr(
            f"CASE WHEN _gr_ntile <= {big} THEN (_gr_ntile - 1) DIV {q + 1} + 1 "
            f"ELSE {rem} + (_gr_ntile - {big} - 1) DIV {q} + 1 END"
        )
    out = ranked.withColumn(out_col, tile.cast("int")).drop("_gr_ntile")
    return out, total
