"""Registry: pprof profiles signal (pprofreceiver / pkg/translator/pprof)
and the sqlqueryreceiver analogue."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_pprof_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pprof profile.proto decode: per-(sample, sample_type) rows with
    leaf-first resolved stacks and labels; half the payloads gzip'd (the
    runtime/pprof on-disk form, inflated transparently like the
    receiver's confighttp path)."""
    from ..operators.pprof_pb import parse_pprof_profiles, synthesize_pprof

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    out = parse_pprof_profiles(synthesize_pprof(ev), "payload")
    return out.select(
        "event_id", "sample_idx", "sample_type", "sample_unit", "value",
        "stack", "labels_csv", "num_labels_csv", "time_nanos",
        "duration_nanos", "period_type", "period",
    )


def q_pprof_flame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end profiles pipeline: wire decode -> flame rollup (the
    `pprof -top` table): per-function inclusive/exclusive cpu sums over
    every decoded sample."""
    from ..operators.pprof_pb import flame_rollup

    cpu = q_pprof_samples(spark, sf_dir).filter(F.col("sample_type") == "cpu")
    return flame_rollup(cpu, group_cols=[]).select(
        "func", "inclusive", "exclusive", "n_samples"
    )


def q_sql_query_polls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqlqueryreceiver tracking semantics as two polls over the events
    table: poll 1 sees the table as of event_id < midpoint and advances
    the tracking value to the last ordered row; poll 2 runs over the full
    table bound to that value — together they read every row past
    tracking_start exactly once (the no-duplicate contract)."""
    from ..sources.sql_query import sql_query_logs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    mid = n // 2
    start = str(n // 10)
    ev.createOrReplaceTempView("my_logs_sqlq")

    sql1 = (
        f"SELECT event_id, props, event_type FROM my_logs_sqlq "
        f"WHERE event_id > :tracking AND event_id < {mid} ORDER BY event_id"
    )
    p1, tv1 = sql_query_logs(
        spark, sql1, "props", ["event_type"],
        tracking_column="event_id", tracking_value=start,
    )
    sql2 = (
        "SELECT event_id, props, event_type FROM my_logs_sqlq "
        "WHERE event_id > :tracking ORDER BY event_id"
    )
    p2, _ = sql_query_logs(
        spark, sql2, "props", ["event_type"],
        tracking_column="event_id", tracking_value=tv1,
    )
    u = p1.select(F.lit(1).alias("poll_idx"), "body", "event_type", "_tracking").unionByName(
        p2.select(F.lit(2).alias("poll_idx"), "body", "event_type", "_tracking")
    )
    return u.select("poll_idx", "body", "event_type", F.col("_tracking").alias("event_id"))


def q_prw2_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus remote-write 2.0: symbol-table label resolution, per-series
    validation skips (duplicate labels, missing __name__), and the
    target_info resource bridge applied as a broadcast dimension join."""
    from ..operators.prw2 import parse_remote_write_v2, prw2_apply_target_info, synthesize_prw2

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000).cast("long").alias("ts_ms"),
    )
    out = prw2_apply_target_info(parse_remote_write_v2(synthesize_prw2(ev), "payload"))
    return out.select(
        "event_id", "prw_name", "prw_job", "prw_instance", "prw_labels_csv",
        "prw_unit", "prw_help", "prw_type", "prw_ts_ms", "prw_value", "resource_csv",
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pprof_profile_samples": q_pprof_samples,
    "pprof_flame_rollup": q_pprof_flame,
    "sql_query_polls": q_sql_query_polls,
    "prw2_samples": q_prw2_samples,
}

ORACLES: dict[str, str] = {
    "pprof_profile_samples": """
SELECT e.event_id,
  CAST(s AS INTEGER) AS sample_idx,
  st.sty AS sample_type,
  st.sun AS sample_unit,
  CASE st.ti WHEN 0 THEN e.event_id * 100 + s ELSE s + 1 END AS value,
  'func_' || CAST((e.event_id + s) % 5 AS VARCHAR) || ';main_' || CAST(e.user_id % 3 AS VARCHAR) AS stack,
  'thread=t' || CAST(e.user_id % 4 AS VARCHAR) AS labels_csv,
  'alloc=' || CAST(e.event_id % 1000 AS VARCHAR) || ':bytes' AS num_labels_csv,
  epoch_us(e.ts) * 1000 AS time_nanos,
  10000000000 AS duration_nanos,
  'cpu' AS period_type,
  CAST(10000000 AS BIGINT) AS period
FROM events e,
  UNNEST(range(0, 1 + e.event_id % 2)) AS t(s),
  (VALUES (0, 'cpu', 'nanoseconds'), (1, 'samples', 'count')) AS st(ti, sty, sun)
""",
    "pprof_flame_rollup": """
WITH base AS (
  SELECT e.event_id * 100 + s AS v,
    'func_' || CAST((e.event_id + s) % 5 AS VARCHAR) AS leaf,
    'main_' || CAST(e.user_id % 3 AS VARCHAR) AS root
  FROM events e, UNNEST(range(0, 1 + e.event_id % 2)) AS t(s)),
x AS (
  SELECT leaf AS func, v, TRUE AS is_leaf FROM base
  UNION ALL
  SELECT root AS func, v, FALSE AS is_leaf FROM base)
SELECT func,
  CAST(sum(v) AS BIGINT) AS inclusive,
  CAST(sum(CASE WHEN is_leaf THEN v ELSE 0 END) AS BIGINT) AS exclusive,
  count(*) AS n_samples
FROM x GROUP BY func
""",
    # two polls: (start, mid) then (mid-1's last value, end); together every
    # row with event_id > n/10 appears exactly once
    "sql_query_polls": """
WITH n AS (SELECT count(*) AS n FROM events),
p1 AS (
  SELECT 1 AS poll_idx, props AS body, event_type, event_id
  FROM events, n WHERE event_id > n // 10 AND event_id < n // 2),
t1 AS (SELECT max(event_id) AS tv FROM p1),
p2 AS (
  SELECT 2 AS poll_idx, props AS body, event_type, event_id
  FROM events, t1 WHERE event_id > t1.tv)
SELECT poll_idx, body, event_type, event_id FROM p1
UNION ALL
SELECT poll_idx, body, event_type, event_id FROM p2
""",
    # one row per event: the counter sample with target_info labels joined
    # on; the dup-label and nameless series are skipped by validation
    "prw2_samples": """
SELECT event_id,
  'http_requests_total' AS prw_name,
  'svc' AS prw_job,
  'host-' || CAST(user_id % 5 AS VARCHAR) AS prw_instance,
  'path=/p' || CAST(event_id % 4 AS VARCHAR) AS prw_labels_csv,
  '1' AS prw_unit,
  'requests' AS prw_help,
  'counter' AS prw_type,
  epoch_ms(ts) AS prw_ts_ms,
  CAST(event_id % 100 AS DOUBLE) AS prw_value,
  'k8s_cluster=c' || CAST((user_id % 5) % 3 AS VARCHAR) AS resource_csv
FROM events
""",
}
