"""Time-series operators the collector leaves to its backends but a
log-analytics engine needs first-class: as-of join, gap-based
sessionization, gap-filled rollups with LOCF, exact group quantiles, and
a banded (bucketed) range join.

These close the "custom operators Spark lacks" list: each is expressed as
a composition of built-in DataFrame ops (windows, sequence/explode,
equi-joins) chosen so the physical plan stays shuffle-minimal at 100 TB:

- `asof_join` is the union+window formulation: ONE shuffle on the join
  keys, no join operator at all — versus the naive inequality join that
  Catalyst can only run as BroadcastNestedLoop. This is the standard
  at-scale as-of pattern (same shape Flink's temporal join and
  kdb-style aj use).
- `range_join_buckets` turns the inequality predicate |l.ts - r.ts| <= w
  into an equi-join on floor(ts/w) with 3 probe buckets per left row —
  O(matches), not O(n^2); Catalyst runs it as a plain SortMergeJoin.
- `rollup_gapfill` generates the missing-bucket spine with
  sequence()+explode on the *aggregated* per-key bounds (post-agg
  cardinality = distinct keys, tiny next to the input) and fills with a
  single LOCF window.

Reference anchors: interval/rollup semantics mirror
processor/intervalprocessor (aggregate per tumbling interval) and the
spanmetrics histogram family; sessionization mirrors what
groupbytraceprocessor does for traces, applied to time gaps
(`processor/groupbytraceprocessor`); quantiles are the explicit-percentile
sibling of spanmetrics' bucketed histogram
(connector/spanmetricsconnector/internal/metrics/metrics.go).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_US = 1_000_000


def _us(col: str) -> F.Column:
    # parquet TIMESTAMP_NTZ → cast through session-tz timestamp (sessions run
    # UTC, matching DuckDB's epoch_us on naive timestamps)
    return F.unix_micros(F.col(col).cast("timestamp"))


# --- as-of join (temporal join; no reference analogue — backend op) --------
def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest right.ts <= left.ts within the same key group (DuckDB
    `ASOF LEFT JOIN` semantics; ties on right.ts must be pre-deduped by
    the caller or the carried row is engine-dependent).

    Plan: tag and union both sides, then ONE window over (keys ORDER BY
    ts, side) carrying `last(struct(payloads), ignorenulls)` forward.
    The struct keeps multi-column payloads atomic (all columns from the
    same right row even when some are NULL). Single Exchange on `keys`,
    zero join operators — survives any scale the window's key groups do.
    """
    payload_cols = payload_cols or [c for c in right.columns if c not in keys and c != ts_col]
    lcols = [c for c in left.columns if c not in keys and c != ts_col]

    packed_l = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in [ts_col, *payload_cols]) + ">"
        ).alias("__rrow"),
    )
    packed_r = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in lcols) + ">"
        ).alias("__lrow"),
        F.struct(F.col(ts_col), *[F.col(c) for c in payload_cols]).alias("__rrow"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = packed_l.unionByName(packed_r).withColumn("__asof", F.last("__rrow", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *keys,
        F.col(ts_col),
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        F.col(f"__asof.{ts_col}").alias(right_ts_alias),
        *[F.col(f"__asof.{c}").alias(c) for c in payload_cols],
    )
    return out


# --- gap-based sessionization ----------------------------------------------
def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap_s: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the gap
    from the previous event exceeds `gap_s`. Batch analogue of the
    streaming session window (streaming/pipeline.py session windows);
    single Exchange on keys, two stacked windows (lag + running sum) that
    share the same sort — Catalyst plans one Sort, one Exchange."""
    order = [F.col(ts_col), *[F.col(c) for c in (order_cols or [])]]
    w = Window.partitionBy(*keys).orderBy(*order)
    us = _us(ts_col)
    new_sess = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_s * _US), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap_s: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Sessionize then collapse to one row per session: start/end (epoch
    seconds), duration, event count."""
    us = _us(ts_col)
    sess = sessionize(df, keys, ts_col, gap_s, order_cols).withColumn("__us", us)
    return sess.groupBy(*keys, "session_idx").agg(
        (F.min("__us") / _US).cast("double").alias("session_start_s"),
        (F.max("__us") / _US).cast("double").alias("session_end_s"),
        ((F.max("__us") - F.min("__us")) / _US).cast("double").alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- gap-filled rollup with LOCF -------------------------------------------
def rollup_gapfill(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    bucket_s: int = 3600,
    value_col: str = "value",
) -> DataFrame:
    """Per-key tumbling-bucket rollup (count + sum) where missing buckets
    between each key's first and last observation are emitted with count 0,
    plus a `locf` column carrying the last observed sum forward (the
    hypertable/time_bucket_gapfill shape).

    The spine is generated from the AGGREGATED per-key bounds — its size is
    (distinct keys x buckets-in-range), independent of input row count, so
    sequence()+explode here is post-shuffle small even at 100 TB of input.
    """
    b = (F.floor(_us(ts_col) / F.lit(bucket_s * _US)) * bucket_s).cast("bigint").alias("bucket_s")
    agg = df.select(*keys, b, F.col(value_col)).groupBy(*keys, "bucket_s").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 6).alias("total"),
    )
    bounds = agg.groupBy(*keys).agg(F.min("bucket_s").alias("__lo"), F.max("bucket_s").alias("__hi"))
    spine = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), F.lit(int(bucket_s)).cast("bigint"))).alias("bucket_s"),
    )
    filled = spine.join(agg, [*keys, "bucket_s"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        *keys,
        "bucket_s",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
        F.round(F.last("total", ignorenulls=True).over(w), 6).alias("locf_total"),
    )


# --- exact group quantiles --------------------------------------------------
def group_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: list[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Percentiles per group (the explicit sibling of spanmetrics' bucketed
    histogram). `exact=True` uses Spark's exact `percentile` aggregate —
    linear interpolation, same definition as ANSI/DuckDB `quantile_cont`,
    so the oracle matches to float precision; it holds each group's values
    in the aggregation buffer, fine for bounded per-group cardinality
    (dims x time buckets). `exact=False` is the unbounded-group scale path:
    `approx_percentile` (Greenwald-Khanna sketch, O(accuracy) memory per
    group, mergeable map-side) with 1/accuracy relative rank error — not
    engine-reproducible, so no value oracle applies to it."""
    arr = "array(" + ",".join(repr(float(p)) for p in probs) + ")"
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {int(accuracy)}"
    q = F.expr(f"{fn}({value_col}, {arr}{acc})")
    sel = [
        F.round(q.getItem(i), 6).alias(("p%g" % (p * 100)).replace(".", "_"))
        for i, p in enumerate(probs)
    ]
    return df.groupBy(*keys).agg(*sel, F.count(F.lit(1)).alias("n"))


# --- banded range join ------------------------------------------------------
def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    window_s: int = 300,
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Count right rows within ±window_s of each left row (same keys,
    excluding identity matches). The inequality |l.ts - r.ts| <= w becomes
    an equi-join on floor(ts/w) with 3 probe buckets per left row — a
    candidate row can land in at most one probe bucket, so no dedup pass
    is needed and each left row costs exactly 3 join rows. Catalyst plans
    a plain shuffled equi-join; no BroadcastNestedLoopJoin at any scale.
    """
    w_us = window_s * _US
    lb = F.floor(_us(ts_col) / F.lit(w_us)).cast("bigint")
    l = left.select(
        *keys,
        F.col(left_id).alias("__lid"),
        _us(ts_col).alias("__lus"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("__bucket"),
    )
    r = right.select(
        *keys,
        F.col(right_id).alias("__rid"),
        _us(ts_col).alias("__rus"),
        F.floor(_us(ts_col) / F.lit(w_us)).cast("bigint").alias("__bucket"),
    )
    joined = l.join(r, [*keys, "__bucket"], "left")
    near = (
        F.col("__rid").isNotNull()
        & (F.col("__rid") != F.col("__lid"))
        & (F.abs(F.col("__lus") - F.col("__rus")) <= w_us)
    )
    return (
        joined.groupBy(*keys, "__lid")
        .agg(F.count(F.when(near, F.lit(1))).alias("n_nearby"))
        .withColumnRenamed("__lid", left_id)
    )


# --- trailing-window rolling stats ------------------------------------------
def rolling_window_stats(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 3600,
) -> DataFrame:
    """Trailing time-window aggregates per key — the SLO / error-rate /
    burn-rate primitive: for every event, count / sum / mean / stddev of
    `value_col` over the trailing `window_s` seconds (inclusive of the
    current row), plus the z-score of the current value against that
    trailing window. This is the batch analogue of a streaming sliding
    window without the bucket quantization a tumbling groupBy imposes.

    stddev is computed EXPLICITLY from (n, Σv, Σv²) rather than via the
    engine's windowed stddev aggregate: sliding-frame stddev uses
    engine-specific incremental algorithms (segment trees vs
    recomputation) whose float error exceeds the 6-place parity
    contract; the two-moment formula is the same arithmetic on both
    engines. NULL when n < 2.

    Plan: ONE exchange on `keys`, then a single RANGE window frame over
    the microsecond epoch — Spark evaluates all four aggregates in one
    Window node. Skewed keys (one monster user) serialize within the key,
    the same trade every per-key window in this module makes; the frame
    itself is O(window density) per row via the sliding accumulator.
    """
    us = _us(ts_col)
    v = F.col(value_col)
    staged = df.select("*", us.alias("__us"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__us"))
        .rangeBetween(-window_s * _US, 0)
    )
    n = F.count(v).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean = s1 / n
    # clamp tiny negative cancellation to 0; keep NULL (not 0) when n < 2
    var = (s2 - s1 * s1 / n) / (n - 1)
    std = F.when(n >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))
    z = F.when(std > 0, (v - mean) / std)
    return staged.select(
        *df.columns,
        n.cast("bigint").alias("n_window"),
        F.round(s1, 6).alias("sum_window"),
        F.round(mean, 6).alias("mean_window"),
        F.round(std, 6).alias("std_window"),
        F.round(z, 6).alias("z_window"),
    )


# --- per-key lag delta (turn / event latency) --------------------------------
def lag_delta(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    ts_col: str = "ts",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key previous-row timestamp delta under a deterministic order —
    the turn-latency / inter-arrival primitive: for each row, `delta_us` =
    its timestamp minus the previous row's within the key (NULL on the
    first row), plus each `carry_cols` column's previous value as
    `prev_<col>` (e.g. the previous turn's role, to select
    user→assistant response latencies downstream).

    Plan: ONE exchange on `keys` + one window; every output is integer
    microseconds, so the result is engine-exact (no float rounding
    contract needed)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    us = _us(ts_col)
    prev_us = F.lag(us).over(w)
    carried = [
        F.lag(F.col(c)).over(w).alias(f"prev_{c}") for c in (carry_cols or [])
    ]
    return df.select(
        "*",
        *carried,
        (us - prev_us).cast("bigint").alias("delta_us"),
    )


# --- per-key running sum ------------------------------------------------------
def running_sum(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value: Column,
    out_col: str = "running_total",
) -> DataFrame:
    """Per-key cumulative sum of an arbitrary expression under a
    deterministic order — the context-window-accounting primitive (running
    token total per conversation). `order_cols` must be unique within a
    key or the frame boundary is tie-ambiguous; a rows-frame over the
    given order keeps it exact. ONE exchange + one window."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select("*", F.sum(value).over(w).alias(out_col))


# --- threshold state transitions ---------------------------------------------
def threshold_transitions(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    state: Column,
    edge_col: str = "edge",
) -> DataFrame:
    """Edge detection over a per-key boolean signal — the alert open/close
    primitive: under the (unique-per-key) deterministic order, emit only
    the rows where the signal CHANGES. `edge` is 'rising' when the state
    turns true (including a true first row — an alert that is already
    firing when observation starts must still open) and 'falling' when it
    turns false. Steady-state rows are dropped, so downstream alert
    routing sees state transitions, not per-event noise — this is what
    turns a rolling-window breach signal (rolling_window_stats) into
    alertmanager-style open/close events.

    Plan: ONE exchange on `keys`, one lag window, one filter."""
    staged = df.select("*", state.alias("__state"))
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(F.col("__state")).over(w)
    st = F.col("__state")
    edge = (
        F.when((prev.isNull() | ~prev) & st, F.lit("rising"))
        .when(prev & ~st, F.lit("falling"))
    )
    return (
        staged.select("*", edge.alias(edge_col))
        .filter(F.col(edge_col).isNotNull())
        .drop("__state")
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_us: int | None = None,
) -> DataFrame:
    """Ordered funnel completion per key — earliest-completion semantics.

    ``step1_us`` is the key's first step-1 event; ``step{i}_us`` the
    first step-i event STRICTLY after step i-1 (and, with ``within_us``,
    no later than step1 + window — the anchored funnel window). Output:
    one row per key that entered the funnel, the per-step timestamps
    (NULL once the funnel stalls), ``n_steps`` reached and ``converted``.

    Scale: one filtered min-aggregate plus one equi-join per step, every
    one keyed on ``key_col`` — Catalyst/AQE reuses the same hash
    partitioning down the chain, so a k-step funnel over 10^12 events is
    k narrow passes over the (key, ts) projection of the matching types,
    never a per-key event-list materialization.
    """
    us = _us(ts_col)
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(us).alias("step1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(key_col), us.alias("_ev_us")
        )
        j = ev.join(cur, key_col).filter(F.col("_ev_us") > F.col(f"step{i-1}_us"))
        if within_us is not None:
            j = j.filter(F.col("_ev_us") <= F.col("step1_us") + F.lit(within_us))
        nxt = j.groupBy(key_col).agg(F.min("_ev_us").alias(f"step{i}_us"))
        cur = cur.join(nxt, key_col, "left")
    n_steps = sum(
        F.when(F.col(f"step{i}_us").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return cur.select(
        key_col,
        *[f"step{i}_us" for i in range(1, len(steps) + 1)],
        n_steps.cast("int").alias("n_steps"),
        F.col(f"step{len(steps)}_us").isNotNull().alias("converted"),
    )


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: keys cohorted by the week of their
    first event; one row per (cohort_week, week_offset) with the number
    of cohort members active that week. Both week edges come from
    ``date_trunc('week', ...)`` (Monday start in Spark AND DuckDB), so
    offsets are exact 7-day multiples.

    Scale: first-seen is one min-aggregate on the key; activity weeks are
    one distinct projection; both shuffle on the key, then the matrix is
    one hash aggregate over (cohort, offset) — output is
    O(cohorts × horizon), independent of event count.
    """
    ts = F.col(ts_col).cast("timestamp")
    first = df.groupBy(key_col).agg(
        F.date_trunc("week", F.min(ts)).alias("cohort_week")
    )
    active = df.select(
        F.col(key_col), F.date_trunc("week", ts).alias("act_week")
    ).distinct()
    j = active.join(first, key_col)
    offset = (
        (F.unix_timestamp("act_week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("int")
    return (
        j.groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list,  # str column names or (name, Column) pairs
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled gauge per key —
    each sample holds until the next one (step interpolation), so the
    average is the integral over held intervals divided by covered time.
    The final sample of a key has no successor and carries no weight;
    keys with fewer than two samples yield no row.

    Engine-portable determinism: the weighted sum runs in DECIMAL
    (exact, associative — immune to float-addition ordering across
    partial aggregates and engines); only the single final division
    happens in double. One window for the successor gap + one hash agg.
    """
    us = _us(ts_col)
    names = [k if isinstance(k, str) else k[0] for k in keys]
    cols = [F.col(k).alias(k) if isinstance(k, str) else k[1].alias(k[0]) for k in keys]
    named = df.select(*cols, us.alias("us"), F.col(value_col).alias("v"))
    w = Window.partitionBy(*names).orderBy("us")
    gap = (F.lead("us").over(w) - F.col("us")).alias("w_us")
    t = named.select("*", gap).filter(F.col("w_us").isNotNull())
    vw = F.col("v").cast("decimal(18,6)") * F.col("w_us").cast("decimal(20,0)")
    agg = t.groupBy(*names).agg(
        F.sum(vw).alias("sum_vw"),
        F.sum("w_us").alias("sum_w"),
    )
    return agg.select(
        *names,
        F.round(
            F.col("sum_vw").cast("double") / F.col("sum_w").cast("double"), 6
        ).alias("twa"),
        F.col("sum_w").alias("covered_us"),
    )


def seasonal_baseline(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-day seasonal baseline + per-day deviation — the SRE
    "is today abnormal for a Tuesday 3pm" primitive. Per (key, hour-of-
    day, day): the day's mean value; baseline = median of those day
    means across all days for that (key, hour); deviation = day mean /
    baseline.

    Determinism: day means are summed in DECIMAL (exact, associative)
    with one final double division, and the median is the exact
    interpolating percentile (quantile_cont semantics in both engines).
    Two hash aggregates + one equi-join on (key, hod) — output is
    O(keys × 24 × days), independent of event volume.
    """
    ts = F.col(ts_col).cast("timestamp")
    base = df.select(
        F.col(key_col).alias("key"),
        F.hour(ts).alias("hod"),
        F.date_trunc("day", ts).alias("day"),
        F.col(value_col).cast("decimal(18,6)").alias("v"),
    )
    daily = base.groupBy("key", "hod", "day").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("day_mean"),
        F.count(F.lit(1)).alias("n_events"),
    )
    med = daily.groupBy("key", "hod").agg(
        F.expr("percentile(day_mean, 0.5)").alias("baseline")
    )
    return daily.join(med, ["key", "hod"]).select(
        F.col("key").alias(key_col),
        "hod",
        "day",
        "n_events",
        F.round("day_mean", 6).alias("day_mean"),
        F.round("baseline", 6).alias("baseline"),
        F.round(F.col("day_mean") / F.col("baseline"), 6).alias("deviation"),
    )


# --- multi-window SLO burn-rate alerts --------------------------------------
def burn_rate_alerts(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    err_col: str = "is_err",
    slo_target: float = 0.99,
    long_s: int = 6 * 3600,
    short_s: int = 1800,
    factor: float = 2.0,
) -> DataFrame:
    """Google-SRE multi-window burn-rate alerting as a batch operator.

    burn rate = (trailing error rate) / (1 - slo_target): 1.0 consumes the
    error budget exactly at the SLO period's natural pace; `factor`× faster
    over BOTH a long window (magnitude) and a short window (still
    happening) pages. The two-window AND is what kills both false pages on
    ancient incidents (long alone) and flappy pages on blips (short
    alone) — the standard multiwindow multi-burn-rate recipe.

    Emits one row per event with burn_long / burn_short / alert. Plan: ONE
    exchange on `keys`, one sort, two RANGE frames over the same ordered
    spec (Spark folds them into sibling Window nodes over one sort).
    Trailing-window semantics match rolling_window_stats; at 10^12 rows
    the per-key serialization trade is the same one every per-key window
    in this module makes.
    """
    if not (0.0 < slo_target < 1.0):
        raise ValueError("slo_target must be in (0, 1)")
    budget = 1.0 - slo_target
    us = _us(ts_col)
    e = F.col(err_col).cast("int").cast("double")
    staged = df.select("*", us.alias("__us"))

    def frame(sec: int):
        return (
            Window.partitionBy(*keys).orderBy(F.col("__us")).rangeBetween(-sec * _US, 0)
        )

    burn_long = F.avg(e).over(frame(long_s)) / F.lit(budget)
    burn_short = F.avg(e).over(frame(short_s)) / F.lit(budget)
    return (
        staged.withColumn("burn_long", F.round(burn_long, 6))
        .withColumn("burn_short", F.round(burn_short, 6))
        .withColumn(
            "alert", (F.col("burn_long") >= factor) & (F.col("burn_short") >= factor)
        )
        .drop("__us")
    )


# --- late-arrival / watermark profiler --------------------------------------
def late_arrival_profile(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Out-of-order arrival diagnostics per key — the measurement that
    picks a Structured Streaming watermark delay instead of guessing it.

    `seq_col` is the ARRIVAL order (ingestion sequence); `ts_col` is event
    time. A row is late iff its event time is behind the running max over
    everything that arrived before it; its lateness is that gap. Reports
    per key: row count, late count/fraction, max and exact p95 lateness
    (seconds), and the suggested watermark = max observed lateness — the
    smallest delay that would have dropped nothing.

    ONE exchange on `keys`, one window (running cummax over arrival
    order), one hash agg. The running-max frame excludes the current row,
    so the first arrival is never late."""
    us = _us(ts_col)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(seq_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_us = F.greatest(F.max(us).over(w) - us, F.lit(0))
    staged = df.select(*keys, F.coalesce(late_us, F.lit(0)).alias("_late_us"))
    return staged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_late_us") > 0).cast("int")).cast("bigint").alias("n_late"),
        F.round(
            F.sum((F.col("_late_us") > 0).cast("int")) / F.count(F.lit(1)), 6
        ).alias("late_frac"),
        F.round(F.max("_late_us") / F.lit(1e6), 6).alias("max_lateness_s"),
        F.round(
            F.expr("percentile(_late_us, 0.95)") / F.lit(1e6), 6
        ).alias("p95_lateness_s"),
        F.round(F.max("_late_us") / F.lit(1e6), 6).alias("suggested_watermark_s"),
    )


# --- per-group OLS trend -----------------------------------------------------
def group_trend(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key least-squares trend line (slope per hour, intercept, R²) —
    the metric-drift detector: "is this tool's latency creeping" answered
    with a statistic instead of eyeballing dashboards.

    Numerics: x is the epoch-hour offset from the per-key minimum
    (two-pass via one extra agg join) — centering bounds the magnitudes
    so the five sufficient-statistic sums (Σx, Σy, Σxy, Σx², Σy²) stay
    exact as decimals; every sum is decimal-accumulated (order-free) and
    only the final slope/intercept/R² divisions are double. NULL slope
    for degenerate keys (n < 2 or zero x-variance); R² NULL when y is
    constant. ONE hash agg for the x-origin + ONE for the sums."""
    us = _us(ts_col)
    origin = df.groupBy(*keys).agg(F.min(us).alias("_x0"))
    staged = df.join(origin, keys).select(
        *keys,
        F.round((us - F.col("_x0")) / F.lit(3600.0 * _US), 9)
        .cast("decimal(18,9)")
        .alias("_x"),
        F.col(value_col).cast("decimal(18,6)").alias("_y"),
    )
    agg = staged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_x").cast("decimal(38,9)").alias("_sx"),
        F.sum("_y").cast("decimal(38,6)").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("decimal(38,15)").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("decimal(38,18)").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("decimal(38,12)").alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    num = n * sxy - sx * sy
    slope = F.when((F.col("n") > 1) & (den_x != 0.0), num / den_x)
    intercept = (sy - slope * sx) / n
    r2 = F.when(
        (den_y != 0.0) & (den_x != 0.0) & (F.col("n") > 1),
        (num / den_x) * (num / den_x) * den_x / den_y,
    )
    return agg.select(
        *keys,
        "n",
        F.round(slope, 6).alias("slope_per_hour"),
        F.round(intercept, 6).alias("intercept"),
        F.round(F.when(slope.isNotNull(), r2), 6).alias("r2"),
    )


# --- state flapping detection ------------------------------------------------
def flap_profile(
    df: DataFrame,
    keys: list[str],
    state_col: str,
    ts_col: str = "ts",
    seq_col: str | None = None,
) -> DataFrame:
    """Status-flapping diagnostics per key — the alert-fatigue analysis:
    how often does this entity's state CHANGE, and how long is its
    longest stable run? A service alternating ok/error every sample needs
    hysteresis, not more alerts.

    One window (lag over event order) marks transitions; run ids come
    from the standard gaps-and-islands cumulative sum; two hash aggs
    produce transitions, flap rate, run count, and the longest run
    length. All integer counts."""
    order = [F.col("__us"), *( [F.col(seq_col)] if seq_col else [] )]
    staged = df.select(*keys, F.col(state_col).alias("_s"), _us(ts_col).alias("__us"),
                       *( [seq_col] if seq_col else [] ))
    w = Window.partitionBy(*keys).orderBy(*order)
    flagged = staged.select(
        *keys,
        "_s",
        "__us",
        *([seq_col] if seq_col else []),
        F.when(
            F.lag("_s").over(w).isNull() | ~F.lag("_s").over(w).eqNullSafe(F.col("_s")),
            1,
        )
        .otherwise(0)
        .alias("_new_run"),
    ).withColumn("_run", F.sum("_new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = flagged.groupBy(*keys, "_run").agg(F.count(F.lit(1)).alias("_len"))
    return runs.groupBy(*keys).agg(
        F.sum("_len").cast("bigint").alias("n"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("transitions"),
        F.round((F.count(F.lit(1)) - 1) / F.sum("_len"), 6).alias("flap_rate"),
        F.max("_len").cast("bigint").alias("longest_run"),
    )


# --- lag-k autocorrelation ---------------------------------------------------
def autocorrelation(
    df: DataFrame,
    keys: list[str],
    lag: int = 1,
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str | None = None,
) -> DataFrame:
    """Per-key lag-k sample autocorrelation of the value series (ordered
    by event time) — the seasonality/persistence detector: r(1) near 1
    means the gauge trends, near 0 it's noise, negative it oscillates.
    Pearson correlation of (y_t, y_{t−k}) over the overlapping pairs,
    decimal-exact sufficient statistics like group_trend; NULL when
    fewer than 2 pairs or zero variance on either side."""
    order = [F.col("__us"), *( [F.col(seq_col)] if seq_col else [] )]
    staged = df.select(*keys, _us(ts_col).alias("__us"),
                       F.col(value_col).cast("decimal(18,6)").alias("_y"),
                       *( [seq_col] if seq_col else [] ))
    w = Window.partitionBy(*keys).orderBy(*order)
    pairs = staged.select(*keys, "_y", F.lag("_y", lag).over(w).alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    agg = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("_x").cast("decimal(38,6)").alias("_sx"),
        F.sum("_y").cast("decimal(38,6)").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("decimal(38,12)").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("decimal(38,12)").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("decimal(38,12)").alias("_syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    r = F.when(
        (F.col("n_pairs") > 1) & (den_x > 0.0) & (den_y > 0.0),
        (n * sxy - sx * sy) / F.sqrt(den_x * den_y),
    )
    return agg.select(*keys, "n_pairs", F.round(r, 6).alias(f"acf_lag{lag}"))


# --- CUSUM change-point detection --------------------------------------------
def cusum_alarms(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    target: float = 0.0,
    slack: float = 0.0,
    threshold: float = 5.0,
    ts_col: str = "ts",
    seq_col: str | None = None,
) -> DataFrame:
    """Page's CUSUM mean-shift detector per key — the change-point
    primitive behind "when did this metric's level actually move"
    (deploy regressions, drift onset), far more sensitive to small
    persistent shifts than any fixed threshold.

    The textbook recurrence C_t = max(0, C_{t−1} + (x_t − target −
    slack)) looks sequential, but has a closed form over prefix sums:
    with P_t = Σ_{i≤t}(x_i − target − slack) and P_0 = 0,
    C_t = P_t − min_{0≤j≤t} P_j — a running sum and a running min, TWO
    window aggregates over one sort (the same gaps-and-islands trick
    family; no applyInPandas, no recursion). The mirrored detector for
    downward shifts uses the prefix MAX the same way. Sums are decimal
    (order-free, exact); alarms fire where the statistic exceeds
    `threshold`.

    Output: one row per event with cusum_pos / cusum_neg / alarm, the
    audit trail a responder reads; aggregate with any groupBy downstream
    for first-alarm-per-key."""
    order = [F.col("__us"), *([F.col(seq_col)] if seq_col else [])]
    dev = (
        F.col(value_col).cast("decimal(18,6)")
        - F.lit(target).cast("decimal(18,6)")
        - F.lit(slack).cast("decimal(18,6)")
    )
    staged = df.select(
        *keys,
        _us(ts_col).alias("__us"),
        *([seq_col] if seq_col else []),
        dev.alias("_dev"),
    )
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    p = F.sum("_dev").over(w).cast("decimal(38,6)")
    run = staged.select(*keys, "__us", *([seq_col] if seq_col else []), p.alias("_p"))
    # prefix min/max INCLUDING the virtual P_0 = 0 (least/greatest with 0)
    wmin = Window.partitionBy(*keys).orderBy("__us", *([seq_col] if seq_col else [])).rowsBetween(
        Window.unboundedPreceding, 0
    )
    zero = F.lit(0).cast("decimal(38,6)")
    pmin = F.least(F.min("_p").over(wmin), zero)
    pmax = F.greatest(F.max("_p").over(wmin), zero)
    c_pos = (F.col("_p") - pmin).cast("double")
    c_neg = (pmax - F.col("_p")).cast("double")
    return run.select(
        *keys,
        "__us",
        *([seq_col] if seq_col else []),
        F.round(c_pos, 6).alias("cusum_pos"),
        F.round(c_neg, 6).alias("cusum_neg"),
        ((c_pos > threshold) | (c_neg > threshold)).alias("alarm"),
    ).withColumnRenamed("__us", "event_us")


# --- Welch's t-test between two variants -------------------------------------
def welch_t(
    df: DataFrame,
    keys: list[str],
    variant_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Welch's unequal-variance t-statistic between the two variants of
    `variant_col` per key — the A/B-comparison primitive ("did the
    canary's latency move?") that works without equal group sizes or
    pooled variance. Emits per key: both ns/means, the t statistic, and
    the Welch–Satterthwaite degrees of freedom (compare |t| against the
    caller's critical value; no p-value — that needs the t CDF, a table
    lookup that doesn't belong in the engine).

    Decimal-exact sufficient statistics (n, Σv, Σv²) per (key, variant)
    in ONE hash agg; the pivot to two variant columns is a conditional
    re-aggregation over at most 2 rows per key. Sample variance via the
    two-moment identity; NULL t when either side has n < 2 or both
    variances are zero. Exactly two distinct variant values are expected;
    extras raise."""
    v = F.col(value_col).cast("decimal(18,6)")
    per = df.groupBy(*keys, F.col(variant_col).alias("_var")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(v).cast("decimal(38,6)").alias("_s1"),
        F.sum(F.col(value_col).cast("decimal(19,6)") * v).cast("decimal(38,12)").alias("_s2"),
    )
    variants = [r["_var"] for r in per.select("_var").distinct().orderBy("_var").collect()]
    if len(variants) != 2:
        raise ValueError(f"welch_t expects exactly 2 variants, got {variants}")
    a, b = variants

    def side(tag: str, val) -> list[Column]:
        cond = F.col("_var") == val
        return [
            F.sum(F.when(cond, F.col("_n"))).cast("bigint").alias(f"n_{tag}"),
            F.sum(F.when(cond, F.col("_s1"))).cast("decimal(38,6)").alias(f"_s1{tag}"),
            F.sum(F.when(cond, F.col("_s2"))).cast("decimal(38,12)").alias(f"_s2{tag}"),
        ]

    piv = per.groupBy(*keys).agg(*side("a", a), *side("b", b))

    def stats(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s1 = F.col(f"_s1{tag}").cast("double")
        s2 = F.col(f"_s2{tag}").cast("double")
        mean = s1 / n
        var = F.when(
            F.col(f"n_{tag}") > 1, F.greatest((s2 - s1 * s1 / n) / (n - 1.0), F.lit(0.0))
        )
        return n, mean, var

    na, ma, va = stats("a")
    nb, mb, vb = stats("b")
    se2 = va / na + vb / nb
    t = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0.0), (ma - mb) / F.sqrt(se2)
    )
    dof = F.when(
        se2 > 0.0,
        se2 * se2 / ((va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0)),
    )
    return piv.select(
        *keys,
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(F.when(t.isNotNull(), dof), 6).alias("welch_df"),
    )


# --- seasonal baseline + residual anomalies ----------------------------------
def seasonal_profile(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    season: str = "hour_of_day",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Seasonal-naive baseline per key: the per-(key, season-bucket) mean
    and stddev become the expected level for every event in that bucket,
    and the residual z-score flags events that deviate from their OWN
    hour's normal — the fix for the classic false-alarm source where a
    flat threshold pages every night-vs-day swing.

    season: hour_of_day (0-23) | day_of_week (1-7) | hour_of_week
    (0-167). Two-moment decimal-exact per-bucket stats (order-free), one
    broadcast-sized join back (buckets = keys × season cardinality, tiny
    vs rows). z NULL when the bucket has n < 2 or zero variance.
    """
    ts = F.col(ts_col).cast("timestamp")
    if season == "hour_of_day":
        bucket = F.hour(ts)
    elif season == "day_of_week":
        bucket = F.dayofweek(ts)
    elif season == "hour_of_week":
        bucket = (F.dayofweek(ts) - 1) * 24 + F.hour(ts)
    else:
        raise ValueError(f"unknown season {season!r}")
    v = F.col(value_col).cast("decimal(18,6)")
    staged = df.withColumn("_b", bucket.cast("int"))
    prof = staged.groupBy(*keys, "_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(v).cast("decimal(38,6)").alias("_s1"),
        F.sum(F.col(value_col).cast("decimal(19,6)") * v).cast("decimal(38,12)").alias("_s2"),
    )
    n = F.col("_n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s1 / n
    var = F.when(F.col("_n") > 1, F.greatest((s2 - s1 * s1 / n) / (n - 1.0), F.lit(0.0)))
    prof = prof.select(
        *keys, "_b", "_n", mean.alias("_mean"), F.sqrt(var).alias("_sd")
    )
    joined = staged.join(broadcast(prof), [*keys, "_b"])
    resid = F.col(value_col).cast("double") - F.col("_mean")
    z = F.when(F.col("_sd") > 0.0, resid / F.col("_sd"))
    return joined.select(
        *[c for c in df.columns],
        F.col("_b").alias("season_bucket"),
        F.round("_mean", 6).alias("baseline"),
        F.round(resid, 6).alias("residual"),
        F.round(z, 6).alias("season_z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("season_anomaly"),
    )


# --- Mann-Whitney U (rank-sum) A/B -------------------------------------------
def mann_whitney_u(
    df: DataFrame,
    keys: list[str],
    variant_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the two variants of
    `variant_col` per key — the non-parametric sibling of welch_t for
    skewed metrics (latencies) where means mislead. Mid-ranks handle
    ties; the normal-approximation z uses the tie-corrected variance
    n1·n2/12 · ((N+1) − Σ(t³−t)/(N(N−1))). Everything through the rank
    sums is half-integer-exact; z is the only transcendental-free double
    chain (one sqrt).

    One rank window per key + two hash aggs (rank sums + tie groups).
    U/n1n2 is also the A>B win probability — the effect size worth
    reading alongside z."""
    v = F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(v)
    peers = Window.partitionBy(*keys, value_col)
    ranked = df.select(
        *keys,
        F.col(variant_col).alias("_var"),
        v.alias("_v"),
        (
            F.rank().over(w).cast("double")
            + (F.count(F.lit(1)).over(peers) - 1) / 2.0
        ).alias("_r"),
    )
    variants = [r["_var"] for r in ranked.select("_var").distinct().orderBy("_var").collect()]
    if len(variants) != 2:
        raise ValueError(f"mann_whitney_u expects exactly 2 variants, got {variants}")
    a, b = variants
    ties = (
        ranked.groupBy(*keys, "_v")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.col("_t").cast("decimal(19,0)") * F.col("_t") * F.col("_t") - F.col("_t")
            ).cast("decimal(38,0)").alias("_tie3"),
        )
    )
    agg = ranked.groupBy(*keys).agg(
        F.sum(F.when(F.col("_var") == a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("_var") == b, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("_var") == a, F.col("_r"))).alias("_ra"),
    ).join(ties, keys)
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u = F.col("_ra") - na * (na + 1.0) / 2.0
    mu = na * nb / 2.0
    var = (
        na * nb / 12.0 * ((n + 1.0) - F.col("_tie3").cast("double") / (n * (n - 1.0)))
    )
    z = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0.0), (u - mu) / F.sqrt(var))
    win = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), u / (na * nb))
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        F.round(u, 6).alias("u_stat"),
        F.round(z, 6).alias("z"),
        F.round(win, 6).alias("p_a_gt_b"),
    )
