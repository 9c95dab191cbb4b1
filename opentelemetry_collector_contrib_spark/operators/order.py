"""Stable turn ordering — the north-rule requirement.

The reference offers only best-effort arrival ordering
(pkg/stanza/fileconsumer/design.md:40-49); its golden tests sort before
comparing (pkg/pdatatest/plogtest/options.go:185 IgnoreLogRecordsOrder).
We make ordering explicit and deterministic: a window over
(conv_id ORDER BY turn_idx, ts) assigns a stable global turn number so
per-turn text equality holds exactly regardless of task scheduling.

Scale note: the window shuffles once on conv_id; every downstream per-conv
operator (recombine, groupbytrace, per-conv aggregates) reuses that
partitioning, so the pipeline pays ONE shuffle for all per-conv work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stable_order(df: DataFrame, rn_col: str = "turn_rn") -> DataFrame:
    """row_number over (conv_id ORDER BY turn_idx, ts) — turn_idx is the
    primary key within a conversation; ts breaks nothing but is kept for
    parity with the north rule's ordering contract."""
    w = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc(), F.col("ts").asc())
    return df.withColumn(rn_col, F.row_number().over(w))
