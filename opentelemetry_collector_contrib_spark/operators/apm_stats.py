"""APM trace-stats connector: spans → per-bucket aggregate stats.

The reference's datadogconnector (connector/datadogconnector/README.md
"derives APM statistics, in the form of metrics, from service traces";
config.go:101-117 `compute_stats_by_span_kind`, `peer_tags_aggregation`)
feeds spans into the datadog-agent trace concentrator, which buckets spans
by end time (10 s buckets), computes stats only for *top-level* spans —
a span whose parent is absent or belongs to a different service — unless
`compute_stats_by_span_kind` widens eligibility to server/consumer/client/
producer kinds, and aggregates per (env, service, resource, span kind,
status code): hit count, error count, duration sum, and ok/error duration
distributions as relative-error sketches (DDSketch, Masson et al., VLDB'19).

Spark shape — three narrow stages, all hash-partitioned on the stats key:

1. eligibility: top-level detection is ONE equi-join of (trace_id,
   parent_span_id) against (trace_id, span_id, service) — at 100 TB this is
   a co-partitioned shuffle join on trace_id, never a per-trace collect.
2. sketch fill: bucket index is a pure integer projection (below), then one
   hash aggregation on (stats key, is_error, bucket_idx) with map-side
   combine — the sketch is rows, not driver state.
3. rollup: a window cumulative-sum per (stats key, is_error) ordered by
   bucket_idx turns the sketch rows into rank-quantile estimates, and a
   final hash aggregation pivots the ok/error splits into one stats row.

Sketch portability note: DDSketch's gamma-log bucket (`ceil(log_gamma d)`)
is float-libm-sensitive across engines, so this implementation uses the
same log-linear family with an integer-exact mapping — octave = bit length
(exact log2), 4 linear sub-buckets per octave read straight off the top
mantissa bits. Worst-case relative error of the bucket midpoint is 1/9
(≈ gamma 1.25 DDSketch); every step is 64-bit integer arithmetic, so Spark
and any ANSI-SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ELIGIBLE_KINDS = ("server", "consumer", "client", "producer")


def sketch_bucket(d: Column) -> Column:
    """Integer log-linear sketch index for a positive long duration.

    d in [1,3] → idx = d; d >= 4 → idx = 4*(bitlen-3) + mantissa2 + 4 where
    bitlen = length(bin(d)) (exact floor(log2 d)+1) and mantissa2 is the two
    bits after the leading one. Monotone in d, 4 buckets per octave.
    """
    d = F.greatest(d.cast("long"), F.lit(1).cast("long"))
    bitlen = F.length(F.bin(d))
    m = F.call_function("shiftright", d, (bitlen - F.lit(3)).cast("int")).bitwiseAND(F.lit(3))
    return F.when(bitlen <= 2, d).otherwise(
        (bitlen - F.lit(3)) * F.lit(4) + m + F.lit(4)
    ).cast("long")


def sketch_bucket_sql(expr: str) -> str:
    """DuckDB rendering of sketch_bucket over a positive BIGINT expression."""
    d = f"greatest(CAST({expr} AS BIGINT), CAST(1 AS BIGINT))"
    bl = f"length(bin({d}))"
    return (
        f"CASE WHEN {bl} <= 2 THEN {d} "
        f"ELSE ({bl} - 3) * 4 + (({d} >> ({bl} - 3)) & 3) + 4 END"
    )


def sketch_rep(idx: Column) -> Column:
    """Midpoint representative duration of a sketch bucket (integer)."""
    o = F.floor((idx - F.lit(4)) / F.lit(4)).cast("int")
    m = (idx - F.lit(4)) % F.lit(4)
    lo = F.call_function("shiftleft", (m + F.lit(4)).cast("long"), o)
    hi = lo + F.call_function("shiftleft", F.lit(1).cast("long"), o) - F.lit(1)
    return F.when(idx <= 3, idx).otherwise(F.call_function("shiftright", lo + hi, F.lit(1))).cast("long")


def sketch_rep_sql(idx: str) -> str:
    o = f"(({idx} - 4) // 4)"
    m = f"(({idx} - 4) % 4)"
    lo = f"(({m} + 4) << {o})"
    hi = f"({lo} + (CAST(1 AS BIGINT) << {o}) - 1)"
    return f"CASE WHEN {idx} <= 3 THEN {idx} ELSE ({lo} + {hi}) >> 1 END"


def mark_top_level(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    service_col: str = "service",
) -> DataFrame:
    """Add `is_top_level`: parent absent, or parent span not in the trace,
    or parent belongs to a different service (the concentrator's top-level
    rule). One left equi-join on (trace, parent span) — co-partitioned by
    trace_id, no skew beyond trace size."""
    parents = spans.select(
        F.col(trace_col).alias("_tl_trace"),
        F.col(span_col).alias("_tl_span"),
        F.col(service_col).alias("_tl_service"),
    )
    joined = spans.join(
        parents,
        on=[
            spans[trace_col] == parents["_tl_trace"],
            spans[parent_col] == parents["_tl_span"],
        ],
        how="left",
    )
    return joined.withColumn(
        "is_top_level",
        F.col(parent_col).isNull()
        | F.col("_tl_service").isNull()
        | (F.col("_tl_service") != F.col(service_col)),
    ).drop("_tl_trace", "_tl_span", "_tl_service")


def apm_stats(
    spans: DataFrame,
    *,
    bucket_s: int = 10,
    compute_stats_by_span_kind: bool = False,
    quantiles: tuple[int, ...] = (50, 95, 99),
    end_ts_col: str = "end_ts",
    duration_col: str = "duration_ns",
    error_col: str = "is_error",
    key_cols: tuple[str, ...] = ("env", "service", "resource", "kind", "status_code"),
) -> DataFrame:
    """Concentrator-shaped stats: per (bucket_start, *key_cols) one row with
    hits / errors / top_level_hits / duration_ns sums plus rank-quantile
    estimates of the ok-span duration distribution read from the sketch.

    `spans` must already carry `is_top_level` (see mark_top_level).
    Quantile q (percent) = midpoint of the smallest bucket whose cumulative
    ok count reaches ceil(q/100 * total) — integer ceiling, engine-portable.
    """
    eligible = F.col("is_top_level")
    if compute_stats_by_span_kind:
        eligible = eligible | F.col("kind").isin(*ELIGIBLE_KINDS)

    bucket = (
        (F.unix_micros(F.col(end_ts_col).cast("timestamp")) / F.lit(1_000_000 * bucket_s))
        .cast("long") * F.lit(bucket_s)
    ).alias("bucket_start")

    keyed = spans.where(eligible).select(
        bucket,
        *[F.col(c) for c in key_cols],
        F.col(error_col).cast("boolean").alias("_err"),
        F.col(duration_col).cast("long").alias("_dur"),
        F.col("is_top_level"),
    ).withColumn("_idx", sketch_bucket(F.col("_dur")))

    keys = ["bucket_start", *key_cols]

    # stage 2: the sketch — one hash agg, map-side combined
    cells = keyed.groupBy(*keys, "_err", "_idx").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum("_dur").alias("_dursum"),
        F.sum(F.when(F.col("is_top_level"), 1).otherwise(0)).alias("_tlcnt"),
    )

    # stage 3: rank quantiles via cumulative counts along the bucket axis
    w = Window.partitionBy(*keys, "_err").orderBy("_idx")
    wall = Window.partitionBy(*keys, "_err")
    ranked = cells.select(
        *keys,
        "_err",
        "_idx",
        "_cnt",
        "_dursum",
        "_tlcnt",
        F.sum("_cnt").over(w).alias("_cum"),
        F.sum("_cnt").over(wall).alias("_tot"),
    )

    q_aggs = []
    for q in quantiles:
        # integer ceil(q * tot / 100): reached at the first bucket where
        # 100*cum >= q*tot
        hit = F.col("_cum") * 100 >= F.col("_tot") * q
        q_aggs.append(
            F.min(
                F.when(~F.col("_err") & hit, sketch_rep(F.col("_idx")))
            ).alias(f"ok_p{q}_ns")
        )

    return ranked.groupBy(*keys).agg(
        F.sum("_cnt").alias("hits"),
        F.sum(F.when(F.col("_err"), F.col("_cnt")).otherwise(0)).alias("errors"),
        F.sum("_tlcnt").alias("top_level_hits"),
        F.sum("_dursum").alias("duration_ns"),
        *q_aggs,
    )
