"""Declarative data contracts: schema-quality assertions compiled into
ONE aggregate pass over the table.

A 100 TB ingest runs these before anything downstream trusts the batch —
the table-level counterpart of the row-level DLQ (plans/dlq.py): the DLQ
diverts individual bad rows; a contract decides whether the BATCH is
acceptable at all (e.g. >0.1% NULL conv_ids means the producer broke,
not the rows). Check types:

* ``not_null``   — column has no NULLs
* ``range``      — numeric column within [min, max] (either optional);
                   NULLs don't violate (compose with not_null)
* ``regex``      — string column matches the pattern (NULL-safe)
* ``enum``       — column value in the allowed set (NULL-safe)
* ``unique``     — the column tuple has no duplicate combinations

Every check compiles to a conditional-sum column in a single
``agg`` — one scan, one job, regardless of how many checks ride along
(``unique`` adds count-distincts in the same aggregate). Output: one row
per check with row/violation counts, a pass flag, and the allowed
violation budget (``max_violation_frac``, default 0 = strict).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation(check: dict) -> Column:
    kind = check["type"]
    if kind == "not_null":
        return F.col(check["col"]).isNull()
    if kind == "range":
        c = F.col(check["col"])
        v = F.lit(False)
        if check.get("min") is not None:
            v = v | (c < F.lit(check["min"]))
        if check.get("max") is not None:
            v = v | (c > F.lit(check["max"]))
        return c.isNotNull() & v
    if kind == "regex":
        c = F.col(check["col"])
        return c.isNotNull() & ~c.rlike(check["pattern"])
    if kind == "enum":
        c = F.col(check["col"])
        return c.isNotNull() & ~c.isin(*check["allowed"])
    raise ValueError(f"unknown contract check type {kind!r}")


def check_name(check: dict) -> str:
    if "name" in check:
        return check["name"]
    cols = check.get("col") or "_".join(check.get("cols", []))
    return f"{check['type']}:{cols}"


def validate_contract(df: DataFrame, checks: list[dict]) -> DataFrame:
    """One row per check: (check, n_rows, n_violations, passed).

    ``unique`` violations = n_rows − distinct(tuple) (the number of
    surplus duplicate rows). Pass = violations ≤
    ``max_violation_frac × n_rows`` (default 0)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, ch in enumerate(checks):
        if ch["type"] == "unique":
            # distinct over a STRUCT of the tuple: a bare multi-column
            # count_distinct silently drops rows where any column is NULL
            # (so a NULL-keyed duplicate would hide), and DuckDB's
            # row-tuple distinct keeps them — the struct matches both the
            # intended semantics and the oracle
            aggs.append(
                F.count_distinct(F.struct(*[F.col(c) for c in ch["cols"]])).alias(
                    f"_d{i}"
                )
            )
        else:
            aggs.append(
                F.sum(_violation(ch).cast("int")).cast("bigint").alias(f"_v{i}")
            )
    row = df.agg(*aggs)
    out = []
    for i, ch in enumerate(checks):
        viol = (
            (F.col("_n") - F.col(f"_d{i}"))
            if ch["type"] == "unique"
            else F.col(f"_v{i}")
        )
        budget = float(ch.get("max_violation_frac", 0.0))
        out.append(
            F.struct(
                F.lit(check_name(ch)).alias("check"),
                F.col("_n").alias("n_rows"),
                viol.cast("bigint").alias("n_violations"),
                (viol <= F.lit(budget) * F.col("_n")).alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*out)).alias("r")).select("r.*")


# the transcript table's ingest contract — used by the registry query and
# available to job-level wiring
def transcript_contract() -> list[dict]:
    return [
        {"type": "not_null", "col": "conv_id"},
        {"type": "not_null", "col": "ts"},
        {"type": "range", "col": "turn_idx", "min": 0},
        {"type": "regex", "col": "conv_id", "pattern": r"^conv-\d{8}$"},
        {"type": "enum", "col": "role", "allowed": ["system", "user", "assistant", "tool"]},
        {"type": "unique", "cols": ["conv_id", "turn_idx"]},
    ]
