"""Stateful session operators, batch-expressed.

recombine (operator/transformer/recombine/config.go:51-63): stateful
multiline assembly — is_first_entry marks segment starts, entries combine
into one record per segment, partitioned by a source identifier.

Batch mapping: the classic segment-sum — a cumulative sum of the is_first
flag over (source ORDER BY seq) assigns a run id; groupBy(run) + ordered
string_agg assembles the segment. One window + one aggregation, both on the
same partitioning key, so AQE plans a single shuffle.

groupbytraceprocessor (processor/groupbytraceprocessor/processor.go:25-73):
buffer spans by trace id and release whole traces — in batch, groupBy(conv_id)
with collect_list IS the whole-trace view.

tailsamplingprocessor (processor/tailsamplingprocessor/processor.go, policies
in internal/sampling/*.go): buffer, then per-trace policy tree. Batch:
per-conv aggregates become boolean policy columns; composite policies are
boolean algebra; the verdict joins back or filters directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recombine(
    df: DataFrame,
    source_col: str,
    order_col: str,
    is_first: Column | str,
    combine_field: str = "text",
    combine_with: str = "\n",
) -> DataFrame:
    """Segment-sum sessionization. Returns one row per assembled segment:
    (source, run_id, combined, n_lines, first_order, last_order)."""
    first = F.expr(is_first) if isinstance(is_first, str) else is_first
    w = Window.partitionBy(source_col).orderBy(F.col(order_col))
    runs = df.withColumn("_first", first.cast("int")).withColumn("run_id", F.sum("_first").over(w))
    assembled = (
        runs.groupBy(source_col, "run_id")
        .agg(
            # order-stable assembly: sort (order, value) structs, then join —
            # collect_list alone has no order guarantee across tasks
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(combine_field).alias("v")))),
                    lambda x: x["v"],
                ),
                combine_with,
            ).alias("combined"),
            F.count(F.lit(1)).alias("n_lines"),
            F.min(order_col).alias("first_order"),
            F.max(order_col).alias("last_order"),
        )
    )
    return assembled


def group_by_trace(df: DataFrame, trace_col: str = "conv_id", order_col: str = "turn_idx") -> DataFrame:
    """Whole-conversation assembly: one row per conv with ordered turn texts.
    (groupbytraceprocessor's release-whole-trace, minus the wait_duration —
    batch sees the complete table.)"""
    return df.groupBy(trace_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("text").alias("v")))),
                lambda x: x["v"],
            ),
            "\n",
        ).alias("transcript"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("first_ts_us"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_ts_us"),
    )


def tail_sampling(
    df: DataFrame,
    trace_col: str = "conv_id",
    policies: dict[str, Column] | None = None,
    mode: str = "any",
) -> DataFrame:
    """Per-conversation policy decision (batch tail sampling).

    `policies` maps name → aggregate boolean Column over the conv's rows
    (e.g. F.max(col('status') == 'err')). Default policy set mirrors the
    reference's attribute/latency/span_count policies
    (internal/sampling/{string_tag_filter,latency,span_count}.go).
    Returns conv-level verdicts; join back to keep/drop rows.
    """
    pol = policies or {
        "has_error": F.max((F.col("status") == "err").cast("int")) == 1,
        "high_latency": F.sum(F.coalesce(F.col("latency_ms"), F.lit(0))) > 10000,
        "span_count": F.count(F.lit(1)) >= 100,
    }
    agg = df.groupBy(trace_col).agg(*[v.alias(k) for k, v in pol.items()])
    names = list(pol.keys())
    if mode == "any":  # OR composite
        keep = F.greatest(*[F.col(n).cast("int") for n in names]) == 1 if len(names) > 1 else F.col(names[0])
    else:  # AND composite
        keep = F.least(*[F.col(n).cast("int") for n in names]) == 1 if len(names) > 1 else F.col(names[0])
    return agg.withColumn("sampled", keep)
