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


# ---------------------------------------------------------------------------
# Cross-table referential integrity (the FK half of the contract surface)
# ---------------------------------------------------------------------------

def fk_orphans(child: DataFrame, parent: DataFrame, on: dict[str, str]) -> DataFrame:
    """Child rows whose FK tuple exists but matches no parent row.

    ``on`` maps child column -> parent column. SQL MATCH SIMPLE semantics:
    a tuple with ANY NULL component is not checkable and never counts as
    an orphan (exactly the NULLable-FK rule).

    Plan: the parent side collapses to DISTINCT keys first (aggregate-
    sized — key cardinality, not row count), then one LEFT ANTI join.
    Catalyst broadcasts the key set when it fits and falls back to a
    shuffled anti join (AQE-skew-aware) when it doesn't; either way the
    child side is scanned once with only the FK columns read.
    """
    ckeys = list(on)
    pkeys = [on[c] for c in ckeys]
    pk = parent.select(*[F.col(p).alias(c) for c, p in on.items()]).dropDuplicates(ckeys)
    checkable = child
    for c in ckeys:
        checkable = checkable.filter(F.col(c).isNotNull())
    return checkable.join(pk, on=ckeys, how="left_anti")


def referential_summary(
    tables: dict[str, DataFrame],
    fks: list[dict],
) -> DataFrame:
    """One row per declared FK: (fk, n_child, n_checkable, n_orphans,
    passed). Each ``fks`` entry: {"name", "child", "parent", "on":
    {child_col: parent_col}, "max_violation_frac"? (default 0)}.

    Each FK costs one anti join over only its key columns; results union
    into a single verdict table (the batch-gate shape of
    validate_contract, extended across tables).
    """
    parts = []
    for fk in fks:
        child = tables[fk["child"]]
        ckeys = list(fk["on"])
        notnull = F.lit(True)
        for c in ckeys:
            notnull = notnull & F.col(c).isNotNull()
        counts = child.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(notnull.cast("int")).cast("bigint").alias("n_checkable"),
        )
        orphans = (
            fk_orphans(child, tables[fk["parent"]], fk["on"])
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        budget = float(fk.get("max_violation_frac", 0.0))
        parts.append(
            counts.join(orphans)  # two 1-row aggregates: trivial cross
            .select(
                F.lit(fk["name"]).alias("fk"),
                "n_child",
                "n_checkable",
                "n_orphans",
                (F.col("n_orphans") <= F.lit(budget) * F.col("n_checkable")).alias("passed"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two versions of a table — the regression
    gate between pipeline runs (did the code change alter anything it
    shouldn't have?) and the audit view behind snapshot rollbacks. One
    FULL OUTER equi-join on the key, then a null-safe column compare:

      verdict ∈ added | removed | changed | unchanged
      changed_cols — the names that differ (null-safe), empty otherwise

    Emits old/new value pairs for every compared column so the diff is
    actionable without re-querying either side. At 10^12 rows both sides
    shuffle once on the key; 'unchanged' rows are usually filtered by the
    caller BEFORE any collect/sink (diff consumers want the delta)."""
    # explicit presence markers: a present row whose compared values are
    # all NULL must still read as present
    o = old.select(
        *key_cols,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, on=key_cols, how="full_outer")
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    diffs = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    verdict = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *key_cols,
        verdict.alias("verdict"),
        F.when(in_old & in_new, diffs).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
