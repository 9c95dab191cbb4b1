"""Mergeable distinct-count sketches: pre-aggregate once, re-roll forever.

The reference's cardinality controls recount from raw data every time
(cardinality limits per metric stream; our `cardinality_guard` mirrors
that). At 10^12 rows the winning pattern is different: materialize
per-(fine window, dim) HyperLogLog sketches ONCE — kilobytes per group,
lossless to merge — then answer every coarser rollup (per-day, per-type,
global) by unioning sketches instead of rescanning raw data. Spark ships
the Apache DataSketches HLL family natively (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`), so the whole path is JVM-side
columnar aggregation — no UDFs.

Guarantees (pytest-gated in tests/test_sketches.py, since a DuckDB
oracle cannot reproduce DataSketches estimates):
* merge is exact: estimate(union of hourly sketches over a day) equals
  estimate(one sketch built directly over the day's rows) — same lg_k,
  identical binary state;
* accuracy: relative error vs exact distinct stays within the published
  HLL bound for the chosen lg_k (~1.04/sqrt(2^lg_k), ~3σ margin in the
  test).

Scale notes: the fine aggregation is one hash agg with map-side partial
sketch merging (each task folds its rows into a local sketch; the
shuffle carries sketch bytes, not values). Rollups aggregate the tiny
sketch table. This is the cube-materialization shape: store the fine
tier, derive every coarser tier without touching raw data again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch_rollup(
    df: DataFrame,
    keys: list[str | Column],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Materialize per-group HLL sketches of ``value_col`` (binary,
    mergeable) plus the raw row count. ``keys`` may mix column names and
    expressions (e.g. ``F.date_trunc('hour', 'ts').alias('hour')``)."""
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.groupBy(*cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketch_rollup(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Roll a sketch table up to coarser keys by lossless sketch union —
    never touches raw data."""
    return sketches.groupBy(*[F.col(k) for k in keys]).agg(
        F.hll_union_agg("hll").alias("hll"),
        F.sum("n_rows").alias("n_rows"),
    )


def sketch_estimates(sketches: DataFrame) -> DataFrame:
    """Attach the distinct-count estimate column (bigint) to a sketch
    table; keeps the sketch so further rollups remain possible."""
    return sketches.withColumn(
        "distinct_estimate", F.hll_sketch_estimate("hll").cast("bigint")
    )
