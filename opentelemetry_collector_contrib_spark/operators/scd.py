"""SCD2 versioned dimensions: enrichment lookups that change over time.

The reference's lookupprocessor (processor/lookupprocessor/processor.go)
joins facts against a STATIC dimension snapshot — whatever CSV was loaded
at collector start. At 10^12 rows ingested over months that model silently
rewrites history: a tool that was re-categorized in March enriches January
traffic with the March label. The standard warehouse answer is a
slowly-changing-dimension type-2 (SCD2) table — one row per (key, version)
with a [valid_from, valid_to) validity interval — and an as-of lookup that
picks the version in force at each fact's own timestamp.

Three operators, all plain DataFrame ops:

* ``scd2_build``     — change log → versioned dim (full replay).
* ``scd2_merge``     — fold a time-ordered change batch into an existing
                       versioned dim touching only affected keys:
                       O(batch + open rows), never O(history). The result
                       is bit-equal to a full replay (oracle-gated).
* ``scd2_lookup``    — facts × versioned dim as-of join via one broadcast
                       hash join with the validity interval as residual.

Scale notes:
* ``scd2_build`` is two windows over the same (key, ts, seq) ordering —
  Catalyst reuses the single Exchange; cost = one shuffle of the change
  log, which is dimension-sized, not fact-sized.
* ``scd2_merge`` never reads closed history: the untouched slice is
  selected by an anti-ish predicate on (is-open AND key-in-batch) and the
  rebuild input is open-versions ∪ batch only.
* ``scd2_lookup`` keeps the fact side shuffle-free: the dim broadcasts,
  the interval predicate rides the broadcast join as a residual. For a
  dimension too large to broadcast, use timeseries.asof_join (union +
  window, one shuffle on the key) against the version rows instead.

Determinism contract: changes are totally ordered by (ts, seq) within a
key — callers must pass a tiebreak column (`seq`) that is unique per key.
The dim carries `seq` so an incremental merge re-sorts the reopened
version against same-timestamp batch changes exactly as a full replay
would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _differs(cols: list[str]) -> F.Column:
    """NULL-safe 'any tracked attribute changed vs the previous change'."""
    pred = F.lit(False)
    for c in cols:
        pred = pred | ~F.col(c).eqNullSafe(F.col(f"__prev_{c}"))
    return pred


def scd2_build(
    changes: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "valid_from",
    seq_col: str = "seq",
) -> DataFrame:
    """Collapse a change log into SCD2 version rows.

    A change whose tracked attributes equal the previous change's (per
    key, ordered by (ts, seq)) does NOT open a new version — classic
    SCD2 no-op suppression. Surviving changes become versions with
    `valid_from` = their ts and `valid_to` = the next version's ts
    (half-open [from, to); NULL = still current).

    Output columns: key, *attrs, valid_from, valid_to, seq.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(seq_col))
    # every window expression is computed in ONE select over the raw change
    # log (before the valid_from/seq renames), so the ordering columns are
    # still in scope; lag(seq) IS NULL marks the first change per key (a
    # NULL attr lag cannot — eqNullSafe treats NULL==NULL as equal).
    flagged = changes.select(
        key,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.col(seq_col).alias("seq"),
        F.lag(seq_col).over(w).isNull().alias("__first"),
        *[F.lag(c).over(w).alias(f"__prev_{c}") for c in attrs],
    )
    versions = flagged.filter(F.col("__first") | _differs(attrs))
    w2 = Window.partitionBy(key).orderBy(F.col("valid_from"), F.col("seq"))
    return versions.select(
        key,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "seq",
    )


def scd2_merge(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "valid_from",
    seq_col: str = "seq",
) -> DataFrame:
    """Fold a change batch into an existing versioned dim so the result
    EQUALS ``scd2_build`` over the full change history — without reading
    closed history.

    Contract: the batch is time-ordered after the dim's open versions
    (every batch change ts >= the affected key's current valid_from) —
    the append-only snapshot-commit discipline. Late-arriving history
    must go through a full rebuild of the affected keys instead.

    Plan: batch keys broadcast twice (semi + anti) to split the dim into
    untouched rows (carried over by reference) and reopened current
    versions; reopened ∪ batch — both tiny — replay through scd2_build.
    """
    bkeys = batch.select(key).distinct()
    is_open = F.col("valid_to").isNull()
    untouched = dim.join(broadcast(bkeys), on=key, how="left_anti").unionByName(
        dim.filter(~is_open).join(broadcast(bkeys), on=key, how="left_semi")
    )
    reopened = dim.filter(is_open).join(broadcast(bkeys), on=key, how="left_semi").select(
        key,
        *attrs,
        F.col("valid_from").alias(ts_col),
        F.col("seq").alias(seq_col),
    )
    rebuilt = scd2_build(
        reopened.unionByName(batch.select(key, *attrs, ts_col, seq_col)),
        key,
        attrs,
        ts_col=ts_col,
        seq_col=seq_col,
    )
    return untouched.unionByName(rebuilt)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    attrs: list[str] | None = None,
) -> DataFrame:
    """As-of enrichment: each fact picks the dim version whose
    [valid_from, valid_to) interval contains the fact's own timestamp
    (left join — facts earlier than every version keep NULL attrs).

    Versions are non-overlapping per key, so at most one row matches and
    the fact count is preserved. One broadcast hash join, zero shuffle
    on the fact side.
    """
    attrs = attrs or [c for c in dim.columns if c not in (key, "valid_from", "valid_to", "seq")]
    d = dim.select(
        F.col(key).alias("__k"),
        F.col("valid_from").alias("__vf"),
        F.col("valid_to").alias("__vt"),
        *attrs,
    )
    cond = (
        (facts[key] == d["__k"])
        & (facts[ts_col] >= d["__vf"])
        & (d["__vt"].isNull() | (facts[ts_col] < d["__vt"]))
    )
    return facts.join(broadcast(d), on=cond, how="left").drop("__k", "__vf", "__vt")
