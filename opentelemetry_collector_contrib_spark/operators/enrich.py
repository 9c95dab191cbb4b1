"""Enrichment: the reference's lookup/attributes processors as broadcast joins.

The reference has NO relational join — its "joins" are per-record map lookups
against small external dimensions (processor/lookupprocessor/processor.go,
README `default_value`). That is exactly Spark broadcast-hash-join territory:
the dim ships once per executor, probe stays in whole-stage codegen, zero
shuffle on the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def lookup(
    df: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """lookupprocessor analogue: left broadcast join + default_value fill.

    `defaults` maps dim column → value used when the key misses (the
    lookupprocessor README's `default: "Unknown"` semantics).
    """
    keys = [key] if isinstance(key, str) else key
    out = df.join(broadcast(dim), on=keys, how="left")
    for col, default in (defaults or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return out


def enrich_transcripts(df: DataFrame, tool_dim: DataFrame, role_dim: DataFrame) -> DataFrame:
    """The fixture pipeline's enrich stage: two broadcast lookups.

    tool_dim deliberately misses one tool ('calc') → default 'Unknown'
    category, 0.0 cost (left-join default_value coverage).
    """
    out = lookup(df, tool_dim, "tool", {"tool_category": "Unknown", "tool_cost_weight": 0.0})
    out = lookup(out, role_dim, "role", {"role_group": "unknown", "severity_default": "info"})
    return out
