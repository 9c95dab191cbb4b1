"""Registry: OTEP-235 consistent sampling queries + DuckDB oracles.

Inputs are synthesized deterministically from the `events` table with the
same md5/CASE recipes on both engines, so the oracle reproduces the exact
randomness/threshold/tracestate bytes the Spark side sees.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling as S

MAX_AC = S.MAX_ADJUSTED_COUNT


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _tid(col):
    """32-hex synthetic trace id; low 56 bits = hex digits 19..32 of md5."""
    return F.md5(col.cast("string"))


# ---------------------------------------------------------------------------
# Q1: W3C tracestate parse + effective sampling state
# ---------------------------------------------------------------------------

def q_tracestate_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`w3ctracestate.go` + `oteltracestate.go`: extract the `ot` member,
    its rv/th fields, resolve effective randomness (explicit rv beats the
    TraceID) and the arriving threshold; emit the T<=R verdict."""
    ev = _events(spark, sf_dir)
    tv = F.element_at(
        F.array(F.lit("8"), F.lit("c"), F.lit("ee8"), F.lit("4")),
        (F.col("event_id") % 4 + 1).cast("int"),
    )
    rv = F.substring(F.md5(F.concat(F.lit("rv"), F.col("event_id").cast("string"))), 1, 14)
    ts = (
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(F.lit("vendor=abc,ot=rv:"), rv, F.lit(";th:"), tv, F.lit(",z=1")),
        )
        .when(F.col("event_id") % 7 == 1, F.concat(F.lit("ot=th:"), tv))
        .when(F.col("event_id") % 7 == 2, F.concat(F.lit("ot=rv:"), rv))
        .when(F.col("event_id") % 7 == 3, F.lit("foo=bar"))
        .when(F.col("event_id") % 7 == 4, F.concat(F.lit("ot=rv:zzz;th:"), tv))
        .when(F.col("event_id") % 7 == 5, F.concat(F.lit("a=b, ot=th:"), tv, F.lit(";x:y")))
        .otherwise(F.lit("ot=th:zz"))
    )
    df = ev.select("event_id", ts.alias("tracestate"), _tid(F.col("event_id")).alias("trace_id"))
    out = S.parse_sampling_state(df, "tracestate", "trace_id")
    return out.select(
        "event_id",
        "ot_section",
        "rvalue",
        "tvalue",
        "randomness",
        "threshold_in",
        F.when(
            F.col("threshold_in").isNotNull() & F.col("randomness").isNotNull(),
            S.should_sample_col(F.col("threshold_in"), F.col("randomness")),
        ).alias("would_sample"),
    )


# ---------------------------------------------------------------------------
# Q2: proportional mode
# ---------------------------------------------------------------------------

def q_sample_proportional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proportionalSampler (`sampler_mode.go:285-303`): outgoing probability
    = incoming x ratio at 4-hex precision; inconsistent arriving T-values
    dropped (fail_closed)."""
    ev = _events(spark, sf_dir)
    tv = (
        F.when(F.col("event_id") % 3 == 0, F.lit("8"))
        .when(F.col("event_id") % 3 == 1, F.lit("c"))
        .otherwise(F.lit(None).cast("string"))
    )
    df = ev.select(
        "event_id", _tid(F.col("event_id")).alias("trace_id"), tv.alias("tv"),
        F.lit(None).cast("string").alias("rv"),
    )
    out = S.consistent_sample(
        df, 50, "proportional", tvalue_col="tv", rvalue_col="rv", precision=4
    )
    return out.select(
        "event_id", "sampling_threshold", "sampling_randomness", "adjusted_count"
    )


# ---------------------------------------------------------------------------
# Q3: equalizing mode with priority + fail-open
# ---------------------------------------------------------------------------

def q_sample_equalizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """equalizingSampler + SamplingPriority + fail-open error paths
    (`sampler_mode.go:267-272`, `logsprocessor.go:239-268`)."""
    ev = _events(spark, sf_dir)
    tv = (
        F.when(F.col("event_id") % 4 == 1, F.lit("c"))
        .when(F.col("event_id") % 4 == 2, F.lit("4"))
        .when(F.col("event_id") % 4 == 3, F.lit("zz"))
        .otherwise(F.lit(None).cast("string"))
    )
    rv = (
        F.when(
            F.col("event_id") % 5 == 0,
            F.substring(F.md5(F.concat(F.lit("rv"), F.col("event_id").cast("string"))), 1, 14),
        )
        .when(F.col("event_id") % 10 == 7, F.lit("short"))
        .otherwise(F.lit(None).cast("string"))
    )
    pri = F.when(F.col("event_id") % 13 == 0, F.lit(80.0)).otherwise(
        F.lit(None).cast("double")
    )
    df = ev.select(
        "event_id",
        _tid(F.col("event_id")).alias("trace_id"),
        tv.alias("tv"),
        rv.alias("rv"),
        pri.alias("pri"),
    )
    out = S.consistent_sample(
        df, 50, "equalizing", tvalue_col="tv", rvalue_col="rv",
        priority_col="pri", precision=4, fail_closed=False,
    )
    return out.select(
        "event_id", "sampling_threshold", "sampling_randomness", "adjusted_count"
    )


# ---------------------------------------------------------------------------
# Q4: hash_seed mode (legacy FNV bit-for-bit)
# ---------------------------------------------------------------------------

def q_sample_hash_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashingSampler (`sampler_mode.go:230-246,312-348`): FNV-1a 32 over
    (LE seed ++ key), 14-bit accept space, R-value synthesized by the exact
    bit mixing. The FNV loop is a Spark `aggregate` HOF (JVM codegen), and
    a `list_reduce` in the oracle — no UDF on either side."""
    ev = _events(spark, sf_dir)
    df = ev.select(
        "event_id",
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("key"),
    )
    out = S.consistent_sample(
        df, 25.25, "hash_seed", trace_id_col=None, hash_key_col="key", hash_seed=22
    )
    return out.select(
        "event_id", "key", "sampling_threshold", "sampling_randomness", "adjusted_count"
    )


def q_tail_sampling_tracestate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tailsampling probabilistic policy under the usetracestate gate
    (probabilistic.go EvaluateWithThreshold): traces whose spans carry ot
    sampling info decide by OTEP-235 (explicit rv, else TraceID
    randomness); the rest fall back to the legacy hash. Traces = user_id
    groups over events; per-trace-consistent rv on 1-in-3 traces, th-only
    info on another slice."""
    from ..operators.recombine import tail_sampling_policies

    ev = _events(spark, sf_dir)
    uid = F.col("user_id")
    rv14 = F.substring(F.md5(F.concat(F.lit("rv"), uid.cast("string"))), 1, 14)
    ts_attr = (
        F.when((uid % 3 == 0) & (F.col("event_id") % 2 == 0), F.concat(F.lit("ot=rv:"), rv14))
        .when(uid % 7 == 0, F.lit("vendor=x,ot=th:c"))
        .otherwise(F.lit(None).cast("string"))
    )
    df = ev.select(
        uid.cast("string").alias("trace"),
        F.col("ts"),
        F.md5(uid.cast("string")).alias("tid"),
        ts_attr.alias("tracestate"),
    )
    out = tail_sampling_policies(
        df,
        [
            {
                "name": "prob",
                "type": "probabilistic_tracestate",
                "percent": 25,
                "tracestate_col": "tracestate",
                "trace_id_hex_col": "tid",
            }
        ],
        trace_col="trace",
        ts_col="ts",
    )
    return out.select("trace", "prob", "sampled")


def q_tenant_fair_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) split of a 5,000 events/interval
    ingest capacity across per-user demands — small tenants keep their
    full volume, big tenants split the remainder equally at the computed
    water level. Sort-window closed form, no iteration."""
    from ..operators.sampling import max_min_fair_share

    demand = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("double").alias("demand"))
    )
    return max_min_fair_share(demand, ["user_id"], "demand", 5000.0)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tenant_fair_share": q_tenant_fair_share,
    "consistent_tracestate_parse": q_tracestate_parse,
    "consistent_sample_proportional": q_sample_proportional,
    "consistent_sample_equalizing": q_sample_equalizing,
    "consistent_sample_hash_seed": q_sample_hash_seed,
    "tail_sampling_tracestate": q_tail_sampling_tracestate,
}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _p2t_sql(f: str, precision: int = 4) -> str:
    """Render the per-row probability->threshold math as a SQL expression
    over scalar subexpressions (DuckDB lacks lateral LET; spell it out).
    All float literals forced to DOUBLE — DuckDB types `0.8` as DECIMAL and
    decimal x 2^56 overflows DECIMAL(18)."""
    f = f"CAST({f} AS DOUBLE)"
    prec = (
        f"least(14, greatest({precision} + CAST(floor((floor(log2({f})) + 1) / -4.0) AS BIGINT),"
        f" {precision} + CAST(floor((floor(log2(1.0 - {f})) + 1) / -4.0) AS BIGINT)))"
    )
    scaled = f"CAST(round({f} * CAST(72057594037927936 AS DOUBLE)) AS BIGINT)"
    th = f"(72057594037927936 - {scaled})"
    p2 = f"CAST(power(2.0, 4 * (14 - {prec})) AS BIGINT)"
    half = f"(CASE WHEN {prec} < 14 THEN {p2} // 2 ELSE 0 END)"
    bumped = f"({th} + {half})"
    rounded = f"({bumped} - ({bumped} % {p2}))"
    return (
        f"CASE WHEN {f} >= 1.0 THEN 0 "
        f"WHEN {f} < 1.0 / CAST(72057594037927936 AS DOUBLE) THEN 72057594037927936 "
        f"ELSE {rounded} END"
    )


def _tvalue_sql(th: str) -> str:
    return (
        f"CASE WHEN {th} = 0 THEN '0' WHEN {th} >= 72057594037927936 THEN '' "
        f"ELSE rtrim(printf('%014x', {th}), '0') END"
    )


def _adj_sql(th: str) -> str:
    return (
        f"CASE WHEN {th} >= 72057594037927936 THEN 0.0 "
        f"ELSE 72057594037927936.0 / (72057594037927936 - {th}) END"
    )


def _oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # water-filling closed form: satisfiable iff prefix + d*(remaining) <= C
    o["tenant_fair_share"] = """
WITH dem AS (
  SELECT user_id, CAST(count(*) AS DOUBLE) AS demand FROM events GROUP BY 1),
s AS (
  SELECT user_id, CAST(demand AS DECIMAL(18,6)) AS d, demand,
    CAST(coalesce(sum(CAST(demand AS DECIMAL(18,6))) OVER
      (ORDER BY demand ASC, user_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      CAST(0 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS pfx,
    count(*) OVER () - row_number() OVER (ORDER BY demand ASC, user_id) + 1 AS rem
  FROM dem),
f AS (
  SELECT user_id, d,
    (pfx + CAST(d AS DECIMAL(19,6)) * rem) <= CAST(5000.0 AS DECIMAL(18,6)) AS sat
  FROM s),
lvl AS (
  SELECT CAST(coalesce(sum(CASE WHEN sat THEN d END), CAST(0 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS served,
    sum(CASE WHEN sat THEN 0 ELSE 1 END) AS n_uns
  FROM f)
SELECT user_id, round(CAST(d AS DOUBLE), 6) AS demand,
  round(CASE WHEN sat THEN CAST(d AS DOUBLE)
        ELSE CASE WHEN n_uns > 0
             THEN (CAST(CAST(5000.0 AS DECIMAL(18,6)) AS DOUBLE) - CAST(served AS DOUBLE)) / n_uns END
        END, 6) AS share,
  NOT sat AS capped
FROM f, lvl"""

    o["consistent_tracestate_parse"] = r"""
WITH base AS (
  SELECT event_id,
    CASE event_id % 4 WHEN 0 THEN '8' WHEN 1 THEN 'c' WHEN 2 THEN 'ee8' ELSE '4' END AS tv,
    substr(md5('rv' || CAST(event_id AS VARCHAR)), 1, 14) AS rv,
    md5(CAST(event_id AS VARCHAR)) AS trace_id
  FROM events),
ts AS (
  SELECT event_id, trace_id,
    CASE event_id % 7
      WHEN 0 THEN 'vendor=abc,ot=rv:' || rv || ';th:' || tv || ',z=1'
      WHEN 1 THEN 'ot=th:' || tv
      WHEN 2 THEN 'ot=rv:' || rv
      WHEN 3 THEN 'foo=bar'
      WHEN 4 THEN 'ot=rv:zzz;th:' || tv
      WHEN 5 THEN 'a=b, ot=th:' || tv || ';x:y'
      ELSE 'ot=th:zz'
    END AS tracestate
  FROM base),
ot AS (
  SELECT event_id, trace_id, tracestate,
    nullif(rtrim(regexp_extract(tracestate, '(?:^|,)[ \t]*ot=([^,]*)', 1)), '') AS ot_section
  FROM ts),
fields AS (
  SELECT event_id, trace_id, ot_section,
    nullif(regexp_extract(ot_section, '(?:^|;)rv:([^;]*)', 1), '') AS rv_f,
    nullif(regexp_extract(ot_section, '(?:^|;)th:([^;]*)', 1), '') AS tv_f
  FROM ot),
parsed AS (
  SELECT event_id, ot_section,
    CASE WHEN regexp_matches(rv_f, '^[0-9a-f]{14}$') THEN rv_f END AS rvalue,
    CASE WHEN regexp_matches(tv_f, '^[0-9a-f]{1,14}$') THEN tv_f END AS tvalue,
    CASE WHEN regexp_matches(rv_f, '^[0-9a-f]{14}$')
         THEN ('0x' || rv_f)::BIGINT
         WHEN regexp_matches(trace_id, '^[0-9a-f]{32}$') AND trace_id <> repeat('0', 32)
         THEN ('0x' || substr(trace_id, 19, 14))::BIGINT
    END AS randomness,
    CASE WHEN regexp_matches(tv_f, '^[0-9a-f]{1,14}$')
         THEN ('0x' || rpad(tv_f, 14, '0'))::BIGINT END AS threshold_in
  FROM fields)
SELECT event_id, ot_section, rvalue, tvalue, randomness, threshold_in,
  CASE WHEN threshold_in IS NOT NULL AND randomness IS NOT NULL
       THEN threshold_in <= randomness END AS would_sample
FROM parsed"""

    # proportional: ratio 0.5, precision 4, fail_closed
    prob_in = "(72057594037927936 - coalesce(th_in, 0)) / 72057594037927936.0"
    th_dec = _p2t_sql(f"({prob_in} * 0.5)")
    o["consistent_sample_proportional"] = f"""
WITH base AS (
  SELECT event_id,
    md5(CAST(event_id AS VARCHAR)) AS trace_id,
    CASE event_id % 3 WHEN 0 THEN '8' WHEN 1 THEN 'c' END AS tv
  FROM events),
parsed AS (
  SELECT event_id,
    ('0x' || substr(trace_id, 19, 14))::BIGINT AS rnd,
    CASE WHEN tv IS NOT NULL THEN ('0x' || rpad(tv, 14, '0'))::BIGINT END AS th_in
  FROM base),
decided AS (
  SELECT event_id, rnd, th_in,
    (th_in IS NOT NULL AND th_in > rnd) AS inconsistent,
    {th_dec} AS th_dec
  FROM parsed),
final AS (
  SELECT event_id, rnd,
    CASE WHEN inconsistent THEN 72057594037927936 ELSE th_dec END AS th_final,
    CASE WHEN inconsistent THEN NULL ELSE th_in END AS th_in_eff
  FROM decided)
SELECT event_id,
  {_tvalue_sql('greatest(th_final, coalesce(th_in_eff, 0))')} AS sampling_threshold,
  printf('%014x', rnd) AS sampling_randomness,
  {_adj_sql('greatest(th_final, coalesce(th_in_eff, 0))')} AS adjusted_count
FROM final
WHERE th_final <= rnd"""

    # equalizing: percent 50 -> const threshold 0x80000000000000, precision 4,
    # fail-open, priority 80 on event_id % 13 = 0
    const_th = S.probability_to_threshold(0.5, 4)
    pri_th = _p2t_sql("0.8")
    o["consistent_sample_equalizing"] = f"""
WITH base AS (
  SELECT event_id,
    md5(CAST(event_id AS VARCHAR)) AS trace_id,
    CASE event_id % 4 WHEN 1 THEN 'c' WHEN 2 THEN '4' WHEN 3 THEN 'zz' END AS tv,
    CASE WHEN event_id % 5 = 0 THEN substr(md5('rv' || CAST(event_id AS VARCHAR)), 1, 14)
         WHEN event_id % 10 = 7 THEN 'short' END AS rv,
    CASE WHEN event_id % 13 = 0 THEN 80.0 END AS pri
  FROM events),
parsed AS (
  SELECT event_id, tv, rv, pri,
    CASE WHEN regexp_matches(tv, '^[0-9a-f]{{1,14}}$')
         THEN ('0x' || rpad(tv, 14, '0'))::BIGINT END AS th_in,
    CASE WHEN regexp_matches(rv, '^[0-9a-f]{{14}}$')
         THEN ('0x' || rv)::BIGINT END AS rv_rnd,
    ('0x' || substr(trace_id, 19, 14))::BIGINT AS tid_rnd
  FROM base),
flags AS (
  SELECT *, coalesce(rv_rnd, tid_rnd) AS rnd,
    ((tv IS NOT NULL AND tv <> '' AND th_in IS NULL)
     OR (rv IS NOT NULL AND rv <> '' AND rv_rnd IS NULL)) AS carrier_err
  FROM parsed),
decided AS (
  SELECT *,
    (NOT carrier_err AND rnd IS NOT NULL AND th_in IS NOT NULL AND th_in > rnd) AS inconsistent,
    greatest(coalesce(th_in, 0), {const_th}) AS th_dec
  FROM flags),
final AS (
  SELECT event_id, tv, rnd, carrier_err,
    (carrier_err OR rnd IS NULL OR inconsistent) AS errored,
    CASE WHEN inconsistent OR carrier_err THEN NULL ELSE th_in END AS th_in_eff,
    CASE
      WHEN pri IS NOT NULL AND pri > 0 AND pri <= 100
           AND pri / 100.0 >= 1.0/72057594037927936.0
      THEN {pri_th}
      WHEN (carrier_err OR rnd IS NULL OR inconsistent) THEN 0
      ELSE greatest(coalesce(th_in, 0), {const_th})
    END AS th_final
  FROM decided),
stamped AS (
  SELECT event_id, tv, rnd, carrier_err,
    greatest(th_final, coalesce(th_in_eff, 0)) AS th_out,
    coalesce(rnd, 0) AS rnd_eff, th_final
  FROM final)
SELECT event_id,
  CASE WHEN carrier_err THEN tv ELSE {_tvalue_sql('th_out')} END AS sampling_threshold,
  CASE WHEN carrier_err OR rnd IS NULL THEN NULL
       ELSE printf('%014x', rnd_eff) END AS sampling_randomness,
  CASE WHEN carrier_err THEN NULL ELSE {_adj_sql('th_out')} END AS adjusted_count
FROM stamped
WHERE th_final <= rnd_eff"""

    # hash_seed: percent 25.25, seed 22 -> acc0 after the 4 LE seed bytes
    acc0 = S.FNV_OFFSET_BASIS32
    for b in (22).to_bytes(4, "little"):
        acc0 = ((acc0 ^ b) * S.FNV_PRIME32) & S.MASK32
    hs_th = S.hash_seed_threshold(25.25)
    o["consistent_sample_hash_seed"] = f"""
WITH base AS (
  SELECT event_id, 'user:' || CAST(user_id AS VARCHAR) AS key FROM events),
hashed AS (
  SELECT event_id, key,
    list_reduce(
      list_prepend({acc0}::BIGINT,
        list_transform(range(1, length(key) + 1), i -> ascii(substr(key, i, 1)))),
      (a, b) -> ((xor(a, b) * 16777619) % 4294967296)
    ) AS h32
  FROM base),
rnd AS (
  SELECT event_id, key,
    (16383 - (h32 % 16384)) * 4398046511104
      + (xor(h32 // 262144, (h32 // 262144) * 1024) % 268435456) * 16384
      + (h32 % 16384) AS rnd56
  FROM hashed)
SELECT event_id, key,
  '{S.threshold_to_tvalue(hs_th)}' AS sampling_threshold,
  printf('%014x', rnd56) AS sampling_randomness,
  {_adj_sql(str(hs_th))} AS adjusted_count
FROM rnd
WHERE {hs_th} <= rnd56"""

    # tailsampling probabilistic under usetracestate: OTEP-235 when any
    # span has ot info, legacy portable hash otherwise
    otel_th_25 = S.probability_to_threshold(0.25)  # 0.75 * 2^56
    legacy_th_25 = int(0.25 * (1 << 60))
    o["tail_sampling_tracestate"] = f"""
WITH rows_ AS (
  SELECT CAST(user_id AS VARCHAR) AS trace,
    md5(CAST(user_id AS VARCHAR)) AS tid,
    CASE
      WHEN user_id % 3 = 0 AND event_id % 2 = 0
        THEN 'ot=rv:' || substr(md5('rv' || CAST(user_id AS VARCHAR)), 1, 14)
      WHEN user_id % 7 = 0 THEN 'vendor=x,ot=th:c'
    END AS tracestate
  FROM events),
fields AS (
  SELECT trace, tid,
    nullif(regexp_extract(
      nullif(rtrim(regexp_extract(tracestate, '(?:^|,)[ \t]*ot=([^,]*)', 1)), ''),
      '(?:^|;)rv:([^;]*)', 1), '') AS rv_f,
    nullif(regexp_extract(
      nullif(rtrim(regexp_extract(tracestate, '(?:^|,)[ \t]*ot=([^,]*)', 1)), ''),
      '(?:^|;)th:([^;]*)', 1), '') AS tv_f
  FROM rows_),
agg AS (
  SELECT trace,
    bool_or(rv_f IS NOT NULL OR tv_f IS NOT NULL) AS has_info,
    min(CASE WHEN regexp_matches(rv_f, '^[0-9a-f]{{14}}$')
             THEN ('0x' || rv_f)::BIGINT END) AS rv_rnd,
    min(('0x' || substr(tid, 19, 14))::BIGINT) AS tid_rnd,
    min(('0x' || substr(md5(trace), 1, 15))::BIGINT) AS h60
  FROM fields GROUP BY trace)
SELECT trace,
  CASE WHEN has_info AND coalesce(rv_rnd, tid_rnd) IS NOT NULL
       THEN {otel_th_25} <= coalesce(rv_rnd, tid_rnd)
       ELSE h60 < {legacy_th_25} END AS prob,
  CASE WHEN has_info AND coalesce(rv_rnd, tid_rnd) IS NOT NULL
       THEN {otel_th_25} <= coalesce(rv_rnd, tid_rnd)
       ELSE h60 < {legacy_th_25} END AS sampled
FROM agg"""

    return o


ORACLES: dict[str, str] = _oracles()
