"""Dead-letter / quarantine sink: divert rows that fail pipeline
invariants into an annotated DLQ instead of silently passing NULLs.

The reference's exporterhelper retry queue ultimately DROPS data that
exhausts retries (exporter/exporterhelper sending_queue — delivery
failure, not content failure), and its parsers' `on_error=send`
convention forwards malformed records with nothing but NULL fields.
At training-data scale both are wrong for CONTENT failures: a row that
can't be parsed or violates an invariant must land somewhere queryable,
tagged with why, so curation can audit loss instead of discovering it
as silent NULL inflation.

``split_quarantine`` is one tagging projection + two filters over the
same frame — identical plan shape to the route fan-out (when-chain,
first-match-wins), zero extra shuffles. The write path reuses the
resumable-sink contract (plans/lineage.py), so the DLQ inherits
idempotent resume and per-partition lineage like every other sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quarantine_reason(rules: list[tuple[str, Column]]) -> Column:
    """Ordered first-match-wins reason column; NULL = row is clean."""
    branches = [F.when(cond, F.lit(name)) for name, cond in rules]
    return F.coalesce(*branches) if branches else F.lit(None).cast("string")


def split_quarantine(
    df: DataFrame, rules: list[tuple[str, Column]], reason_col: str = "error_reason"
) -> tuple[DataFrame, DataFrame]:
    """Partition ``df`` into (accepted, quarantined).

    ``rules`` is an ordered list of (reason, bad-row condition); the
    first matching rule names the row's ``error_reason``. Accepted rows
    keep the original schema; quarantined rows carry the reason column.
    """
    tagged = df.withColumn(reason_col, quarantine_reason(rules))
    accepted = tagged.filter(F.col(reason_col).isNull()).drop(reason_col)
    quarantined = tagged.filter(F.col(reason_col).isNotNull())
    return accepted, quarantined


def write_with_dlq(
    routed: DataFrame,
    rules: list[tuple[str, Column]],
    base_path: str,
    accepted_name: str = "accepted",
    dlq_name: str = "quarantine",
    metrics=None,
) -> dict[str, str]:
    """Split and write both halves through the resumable-sink contract
    (manifest commit per sink, idempotent rerun skip)."""
    from .lineage import write_sinks_resumable

    accepted, quarantined = split_quarantine(routed, rules)
    return write_sinks_resumable(
        routed,
        {accepted_name: accepted, dlq_name: quarantined},
        base_path,
        metrics=metrics,
    )


# The fixture pipeline's content invariants — used by the registry query
# and job-level wiring. Rule order matters: an unparsable line is
# 'unparsed' even when it also lacks a tool status.
def fixture_rules() -> list[tuple[str, Column]]:
    return [
        ("unparsed", F.col("pattern_id") == "raw"),
        (
            "missing_tool_status",
            (F.col("tool") != "none") & F.col("status").isNull(),
        ),
    ]
