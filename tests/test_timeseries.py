"""Unit semantics for operators/timeseries.py: as-of join picks the latest
at-or-before row, sessionization splits exactly at the gap boundary, gapfill
emits zero-count buckets with LOCF carry, the banded range join equals the
naive inequality join, and quantiles interpolate linearly."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        # (event_id, user_id, seconds, value)
        (1, 1, 0, 1.0),
        (2, 1, 100, 2.0),
        (3, 1, 2000, 3.0),   # > 1800s gap from event 2 → new session
        (4, 1, 3800, 4.0),
        (5, 2, 50, 5.0),
    ]
    return spark.createDataFrame(
        [(e, u, _ts(s), v) for e, u, s, v in rows],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )


def test_asof_join_latest_at_or_before(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 1, _ts(5)), (4, 2, _ts(10))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 10.0), (1, _ts(15), 15.0)],
        "user_id bigint, ts timestamp, px double",
    )
    out = {
        r["event_id"]: (r["px"], r["asof_ts"])
        for r in asof_join(left, right, ["user_id"], "ts", ["px"]).collect()
    }
    assert out[1] == (10.0, _ts(10))      # equal ts matches (>=)
    assert out[2] == (15.0, _ts(15))      # latest of the two priors
    assert out[3] == (None, None)         # nothing at-or-before
    assert out[4] == (None, None)         # other key never matches


def test_asof_multicolumn_payload_atomic(spark):
    """Payload columns must come from the SAME right row even when one of
    them is NULL (struct packing, not per-column last)."""
    from opentelemetry_collector_contrib_spark.operators.timeseries import asof_join

    left = spark.createDataFrame([(1, 1, _ts(30))], "event_id bigint, user_id bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 10.0, "a"), (1, _ts(20), None, "b")],
        "user_id bigint, ts timestamp, px double, tag string",
    )
    row = asof_join(left, right, ["user_id"], "ts", ["px", "tag"]).collect()[0]
    assert (row["px"], row["tag"]) == (None, "b")  # both from the ts=20 row


def test_sessionize_gap_boundary(tdf):
    from opentelemetry_collector_contrib_spark.operators.timeseries import session_stats

    out = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in session_stats(tdf, ["user_id"], "ts", gap_s=1800, order_cols=["event_id"]).collect()
    }
    assert out[(1, 1)] == (2, 100.0)       # events 1,2
    assert out[(1, 2)] == (2, 1800.0)      # events 3,4 (gap 1800 == limit stays)
    assert out[(2, 1)] == (1, 0.0)


def test_rollup_gapfill_zero_buckets_and_locf(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import rollup_gapfill

    df = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(2 * 3600 + 5), 2.0)],
        "k string, ts timestamp, value double",
    )
    rows = sorted(
        rollup_gapfill(df, ["k"], "ts", bucket_s=3600, value_col="value").collect(),
        key=lambda r: r["bucket_s"],
    )
    assert [r["n"] for r in rows] == [1, 0, 1]
    assert [r["total"] for r in rows] == [1.0, 0.0, 2.0]
    assert [r["locf_total"] for r in rows] == [1.0, 1.0, 2.0]  # gap carries forward


def test_range_join_matches_naive(tdf, spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import range_join_buckets

    out = range_join_buckets(tdf, tdf, ["user_id"], "ts", window_s=300, left_id="event_id", right_id="event_id")
    got = {r["event_id"]: r["n_nearby"] for r in out.collect()}
    # naive cross-check
    rows = tdf.collect()
    for l in rows:
        n = sum(
            1
            for r in rows
            if r["user_id"] == l["user_id"]
            and r["event_id"] != l["event_id"]
            and abs((r["ts"] - l["ts"]).total_seconds()) <= 300
        )
        assert got[l["event_id"]] == n


def test_group_quantiles_interpolation(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import group_quantiles

    df = spark.createDataFrame([("a", float(v)) for v in [1, 2, 3, 4]], "k string, value double")
    row = group_quantiles(df, ["k"], "value", [0.5, 0.9]).collect()[0]
    assert row["p50"] == 2.5               # (n-1)*p = 1.5 → linear midpoint
    assert row["p90"] == pytest.approx(3.7)
    assert row["n"] == 4


def test_group_quantiles_approx_scale_path(spark):
    """The approx (sketch) path stays within the documented rank-error
    bound of the exact path."""
    from opentelemetry_collector_contrib_spark.operators.timeseries import group_quantiles

    df = spark.createDataFrame([("a", float(v)) for v in range(1000)], "k string, value double")
    exact = group_quantiles(df, ["k"], "value", [0.5, 0.99]).collect()[0]
    approx = group_quantiles(df, ["k"], "value", [0.5, 0.99], exact=False, accuracy=10000).collect()[0]
    assert abs(approx["p50"] - exact["p50"]) <= 1.0    # 1/accuracy rank error on 1000 values
    assert abs(approx["p99"] - exact["p99"]) <= 1.0
    assert approx["n"] == 1000


def test_sessionize_agrees_with_spark_session_window(spark):
    """Cross-implementation check: the window-based sessionize (lag+cumsum)
    must produce the same per-session event counts as Spark's native
    session_window on the same input. Boundary note: sessionize keeps
    delta == gap in-session while session_window is end-exclusive (a new
    event at exactly start+gap opens a new session), so the generated gaps
    avoid the exact boundary."""
    import random

    from opentelemetry_collector_contrib_spark.operators.timeseries import session_stats
    from opentelemetry_collector_contrib_spark.streaming.pipeline import streaming_session_counts

    rng = random.Random(7)
    rows, t = [], 0
    for key in ("u1", "u2", "u3"):
        t = 0
        for _ in range(40):
            t += rng.choice([1, 5, 30, 99, 101, 250, 400])  # never exactly 100
            rows.append((key, _ts(t)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")

    ours = session_stats(df, ["user_id"], "ts", gap_s=100)
    native = streaming_session_counts(df, ["user_id"], gap="100 seconds")
    ours_counts = sorted((r["user_id"], r["n_events"]) for r in ours.collect())
    native_counts = sorted((r["user_id"], r["n_rows"]) for r in native.collect())
    assert ours_counts == native_counts
    # session starts agree too (native end is start+gap-padded, so compare starts)
    ours_starts = sorted((r["user_id"], r["session_start_s"]) for r in ours.collect())
    native_starts = sorted(
        (r["user_id"], r["session_start"].timestamp()) for r in native.collect()
    )
    assert ours_starts == native_starts


def test_rolling_window_stats_semantics(spark):
    import math
    from datetime import datetime

    from opentelemetry_collector_contrib_spark.operators.timeseries import (
        rolling_window_stats,
    )

    from datetime import timedelta

    def t(s):
        return datetime(2024, 1, 1) + timedelta(seconds=s)

    rows = [
        ("u1", 1, t(0), 10.0),
        ("u1", 2, t(30), 20.0),   # window: [10, 20]
        ("u1", 3, t(100), 40.0),  # 60s window: only itself + t(100-60=40)..: [40]
        ("u2", 4, t(10), 5.0),    # other key, isolated
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id int, ts timestamp, value double")
    out = {
        r["event_id"]: r
        for r in rolling_window_stats(df, ["user_id"], "ts", "value", window_s=60).collect()
    }
    r1, r2, r3, r4 = out[1], out[2], out[3], out[4]
    assert r1["n_window"] == 1 and r1["std_window"] is None and r1["z_window"] is None
    assert r2["n_window"] == 2 and r2["sum_window"] == 30.0 and r2["mean_window"] == 15.0
    assert r2["std_window"] == round(math.sqrt(50.0), 6)  # stddev_samp of [10, 20]
    assert r2["z_window"] == round((20.0 - 15.0) / math.sqrt(50.0), 6)
    assert r3["n_window"] == 1  # 100 - 30 > 60: the earlier rows fell out
    assert r4["n_window"] == 1 and r4["user_id"] == "u2"


def test_rolling_window_stats_single_exchange(spark):
    import contextlib
    import io

    from opentelemetry_collector_contrib_spark.operators.timeseries import (
        rolling_window_stats,
    )

    df = spark.createDataFrame(
        [("u", 1, "2024-01-01 00:00:00", 1.0)],
        "user_id string, event_id int, ts string, value double",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rolling_window_stats(df, ["user_id"]).explain("formatted")
    plan = buf.getvalue()
    # one Exchange node in the plan tree (it reappears once in the node
    # details section), and no join anywhere
    assert plan.count("+- Exchange") == 1 and "Join" not in plan


def test_lag_delta_and_running_sum(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.timeseries import (
        lag_delta,
        running_sum,
    )

    rows = [
        ("c1", 0, "user", datetime(2024, 1, 1, 0, 0, 0), 10),
        ("c1", 1, "assistant", datetime(2024, 1, 1, 0, 0, 5), 20),
        ("c1", 2, "user", datetime(2024, 1, 1, 0, 1, 0), 30),
        ("c2", 0, "user", datetime(2024, 1, 1, 0, 0, 0), 7),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp, n int"
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in lag_delta(df, ["conv_id"], ["turn_idx", "ts"], "ts", ["role"]).collect()
    }
    assert out[("c1", 0)]["delta_us"] is None and out[("c1", 0)]["prev_role"] is None
    assert out[("c1", 1)]["delta_us"] == 5_000_000
    assert out[("c1", 1)]["prev_role"] == "user"
    assert out[("c2", 0)]["delta_us"] is None  # keys don't bleed

    run = {
        (r["conv_id"], r["turn_idx"]): r["cum"]
        for r in running_sum(df, ["conv_id"], ["turn_idx", "ts"], F.col("n"), "cum").collect()
    }
    assert [run[("c1", i)] for i in range(3)] == [10, 30, 60]
    assert run[("c2", 0)] == 7


def test_threshold_transitions_edges(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.timeseries import (
        threshold_transitions,
    )

    rows = [
        ("k1", 1, False),
        ("k1", 2, True),   # rising
        ("k1", 3, True),   # steady — dropped
        ("k1", 4, False),  # falling
        ("k2", 1, True),   # already firing at start → rising
        ("k2", 2, True),   # steady — dropped
    ]
    df = spark.createDataFrame(rows, "k string, i int, sig boolean")
    out = {
        (r["k"], r["i"]): r["edge"]
        for r in threshold_transitions(df, ["k"], ["i"], F.col("sig")).collect()
    }
    assert out == {("k1", 2): "rising", ("k1", 4): "falling", ("k2", 1): "rising"}


def test_funnel_steps_ordering_and_window(spark):
    import datetime as dt

    from opentelemetry_collector_contrib_spark.operators.timeseries import funnel_steps

    t0 = dt.datetime(2026, 1, 1)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # u1 completes in order
        (1, "view", at(0)), (1, "click", at(5)), (1, "purchase", at(9)),
        # u2: click BEFORE view never counts; no click after view -> stalls at 1
        (2, "click", at(0)), (2, "view", at(3)), (2, "purchase", at(4)),
        # u3: completes but purchase outside the 10-minute window
        (3, "view", at(0)), (3, "click", at(2)), (3, "purchase", at(30)),
        # u4 never enters (no view)
        (4, "click", at(1)), (4, "purchase", at(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r.user_id: r
        for r in funnel_steps(
            df, ["view", "click", "purchase"], within_us=10 * 60 * 1_000_000
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # u4 never entered
    assert out[1].converted is True and out[1].n_steps == 3
    assert out[2].n_steps == 1 and out[2].step2_us is None  # pre-view click ignored
    assert out[3].n_steps == 2 and out[3].converted is False  # window cut
    # earliest-completion: u1 step ts are the first qualifying events
    assert out[1].step2_us - out[1].step1_us == 5 * 60 * 1_000_000


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from opentelemetry_collector_contrib_spark.operators.timeseries import (
        cohort_retention,
    )

    mon = dt.datetime(2026, 1, 5)  # a Monday

    def wk(w, d=0):
        return mon + dt.timedelta(weeks=w, days=d)

    rows = [
        # cohort week 0: u1 active weeks 0,1,2; u2 weeks 0,2
        (1, wk(0)), (1, wk(0, 3)), (1, wk(1)), (1, wk(2)),
        (2, wk(0, 1)), (2, wk(2, 4)),
        # cohort week 1: u3 active weeks 1 only
        (3, wk(1, 2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_week.isocalendar()[:2], r.week_offset): r.n_active
        for r in cohort_retention(df).collect()
    }
    w0, w1 = mon.isocalendar()[:2], wk(1).isocalendar()[:2]
    assert out[(w0, 0)] == 2 and out[(w0, 1)] == 1 and out[(w0, 2)] == 2
    assert out[(w1, 0)] == 1
    assert len(out) == 4


def test_time_weighted_avg_step_interpolation(spark):
    import datetime as dt

    from opentelemetry_collector_contrib_spark.operators.timeseries import (
        time_weighted_avg,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # value 10 held for 30s, then 20 held for 10s -> twa = (10*30+20*10)/40 = 12.5
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(seconds=30), 20.0),
        (1, t0 + dt.timedelta(seconds=40), 99.0),  # final sample carries no weight
        # single-sample key yields no row
        (2, t0, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.user_id: r for r in time_weighted_avg(df, ["user_id"]).collect()}
    assert set(out) == {1}
    assert out[1].twa == 12.5
    assert out[1].covered_us == 40 * 1_000_000


def test_seasonal_baseline_deviation(spark):
    import datetime as dt

    from opentelemetry_collector_contrib_spark.operators.timeseries import (
        seasonal_baseline,
    )

    rows = []
    for day in range(5):
        v = 10.0 if day < 4 else 30.0  # day 4 is 3x the baseline
        for i in range(3):
            rows.append(("err", dt.datetime(2026, 1, 1 + day, 9, i), v))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {r.day.day: r for r in seasonal_baseline(df).collect()}
    assert all(r.hod == 9 for r in out.values())
    assert out[1].baseline == 10.0 and out[1].deviation == 1.0
    assert out[5].day_mean == 30.0 and out[5].deviation == 3.0


def test_burn_rate_alerts_two_window_and(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import burn_rate_alerts

    # key "a": a burst of errors NOW — both windows hot -> alert.
    # key "b": errors only long ago (outside the short window at the last
    # event) — long window hot, short window cold -> NO alert.
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(10):  # a: 5 ok then 5 err, all within 10 min
        rows.append(("a", base + dt.timedelta(minutes=i), i >= 5))
    for i in range(10):  # b: 5 err early, 5 ok in the last 10 minutes
        ts = base + dt.timedelta(minutes=i * 40)  # spread over ~6h
        rows.append(("b", ts, i < 5))
    df = spark.createDataFrame(rows, "k string, ts timestamp, is_err boolean")
    out = burn_rate_alerts(
        df, ["k"], slo_target=0.9, long_s=6 * 3600, short_s=600, factor=2.0
    )
    last = {
        r["k"]: r
        for r in out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "k"
                ).orderBy(F.col("ts").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    # a at its last event: long window err rate 5/10 -> burn 5.0;
    # short window (10 min) holds rows 1..9 -> 5/10? (rows 0..9 all within
    # 10 min RANGE) -> 5/10 -> burn 5.0 -> alert
    assert last["a"]["alert"] is True
    assert last["a"]["burn_long"] == pytest.approx(5.0)
    # b at its last event: short window has only the final ok row -> burn 0
    assert last["b"]["alert"] is False
    assert last["b"]["burn_short"] == pytest.approx(0.0)
    assert last["b"]["burn_long"] >= 2.0  # magnitude alone must not page

    with pytest.raises(ValueError):
        burn_rate_alerts(df, ["k"], slo_target=1.5)


def test_late_arrival_profile_hand_case(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import late_arrival_profile

    base = dt.datetime(2026, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    # arrival order 1..5; event times: 0, 30, 10 (late by 20s), 40, 35 (late by 5s)
    rows = [
        ("u", 1, t(0)), ("u", 2, t(30)), ("u", 3, t(10)),
        ("u", 4, t(40)), ("u", 5, t(35)),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp")
    r = late_arrival_profile(df, ["user_id"]).collect()[0]
    assert r["n"] == 5 and r["n_late"] == 2
    assert r["late_frac"] == pytest.approx(0.4)
    assert r["max_lateness_s"] == pytest.approx(20.0)
    assert r["suggested_watermark_s"] == pytest.approx(20.0)


def test_group_trend_exact_line_and_degenerate(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import group_trend

    base = dt.datetime(2026, 1, 1)
    # key a: exact line y = 2x + 5 over hours 0..4 -> slope 2, r2 = 1
    rows = [("a", base + dt.timedelta(hours=h), 2.0 * h + 5.0) for h in range(5)]
    # key b: constant y -> slope 0, r2 NULL (zero y-variance)
    rows += [("b", base + dt.timedelta(hours=h), 7.0) for h in range(3)]
    # key c: single point -> slope NULL
    rows += [("c", base, 1.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {r["k"]: r for r in group_trend(df, ["k"]).collect()}
    assert out["a"]["slope_per_hour"] == pytest.approx(2.0)
    assert out["a"]["intercept"] == pytest.approx(5.0)
    assert out["a"]["r2"] == pytest.approx(1.0)
    assert out["b"]["slope_per_hour"] == pytest.approx(0.0)
    assert out["b"]["r2"] is None
    assert out["c"]["slope_per_hour"] is None


def test_flap_profile_runs_and_rate(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import flap_profile

    base = dt.datetime(2026, 1, 1)
    seq = ["ok", "ok", "err", "ok", "ok", "ok", "err"]  # 4 runs, 3 transitions
    rows = [("a", i, base + dt.timedelta(minutes=i), s) for i, s in enumerate(seq)]
    rows += [("b", i, base + dt.timedelta(minutes=i), "ok") for i in range(5)]  # stable
    df = spark.createDataFrame(rows, "k string, seq long, ts timestamp, st string")
    out = {r["k"]: r for r in flap_profile(df, ["k"], "st", seq_col="seq").collect()}
    assert out["a"]["transitions"] == 3 and out["a"]["longest_run"] == 3
    assert out["a"]["flap_rate"] == pytest.approx(3 / 7)
    assert out["b"]["transitions"] == 0 and out["b"]["longest_run"] == 5


def test_autocorrelation_alternating_and_trend(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import autocorrelation

    base = dt.datetime(2026, 1, 1)
    # alternating +1/-1 -> acf(1) == -1; linear ramp -> acf(1) == 1
    rows = [("alt", i, base + dt.timedelta(minutes=i), float((-1) ** i)) for i in range(20)]
    rows += [("ramp", i, base + dt.timedelta(minutes=i), float(i)) for i in range(20)]
    rows += [("const", i, base + dt.timedelta(minutes=i), 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, seq long, ts timestamp, value double")
    out = {r["k"]: r for r in autocorrelation(df, ["k"], seq_col="seq").collect()}
    assert out["alt"]["acf_lag1"] == pytest.approx(-1.0)
    assert out["ramp"]["acf_lag1"] == pytest.approx(1.0)
    assert out["const"]["acf_lag1"] is None  # zero variance


def test_cusum_closed_form_matches_recurrence(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import cusum_alarms

    base = dt.datetime(2026, 1, 1)
    # level 10 for 10 samples, then shifts to 13: CUSUM(target=10) ramps
    vals = [10.0] * 10 + [13.0] * 10
    rows = [("a", i, base + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, seq long, ts timestamp, value double")
    out = sorted(
        cusum_alarms(df, ["k"], target=10.0, slack=0.5, threshold=10.0, seq_col="seq").collect(),
        key=lambda r: r["seq"],
    )

    # reference: the literal recurrence
    cp = cn = 0.0
    expect = []
    for v in vals:
        d = v - 10.0 - 0.5
        cp = max(0.0, cp + d)
        cn = max(0.0, cn - d)
        expect.append((cp, cn))
    for r, (ecp, ecn) in zip(out, expect):
        assert r["cusum_pos"] == pytest.approx(ecp, abs=1e-6)
        assert r["cusum_neg"] == pytest.approx(ecn, abs=1e-6)
    # alarm fires once the shift persists: 2.5/sample -> sample 14 (5th after shift)
    alarms = [r["seq"] for r in out if r["alarm"]]
    assert alarms and min(alarms) == 14


def test_welch_t_hand_case_and_guards(spark):
    import math

    from opentelemetry_collector_contrib_spark.operators.timeseries import welch_t

    a = [1.0, 2.0, 3.0, 4.0, 5.0]          # mean 3, var 2.5
    b = [6.0, 6.0, 8.0, 8.0]               # mean 7, var 4/3
    rows = [("k", 0, v) for v in a] + [("k", 1, v) for v in b]
    df = spark.createDataFrame(rows, "k string, ab int, value double")
    r = welch_t(df, ["k"], "ab").collect()[0]
    assert (r["n_a"], r["n_b"]) == (5, 4)
    assert r["mean_a"] == 3.0 and r["mean_b"] == 7.0
    se2 = 2.5 / 5 + (4 / 3) / 4
    assert r["t_stat"] == pytest.approx((3.0 - 7.0) / math.sqrt(se2), abs=1e-6)
    dof = se2**2 / ((0.5) ** 2 / 4 + (1 / 3) ** 2 / 3)
    assert r["welch_df"] == pytest.approx(dof, abs=1e-4)

    # degenerate: single-sample side -> NULL t
    tiny = spark.createDataFrame(
        [("k", 0, 1.0), ("k", 1, 2.0), ("k", 1, 3.0)], "k string, ab int, value double"
    )
    assert welch_t(tiny, ["k"], "ab").collect()[0]["t_stat"] is None

    import pytest as _pytest

    three = spark.createDataFrame(
        [("k", i % 3, float(i)) for i in range(9)], "k string, ab int, value double"
    )
    with _pytest.raises(ValueError):
        welch_t(three, ["k"], "ab")


def test_seasonal_profile_flags_off_hour_value(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import seasonal_profile

    base = dt.datetime(2026, 1, 5)  # Monday
    rows = []
    # hour 3 normally ~10 (20 samples, small spread); hour 12 normally ~100
    for d in range(10):
        rows.append(("k", base + dt.timedelta(days=d, hours=3), 10.0 + (d % 2)))
        rows.append(("k", base + dt.timedelta(days=d, hours=12), 100.0 + (d % 2)))
    # an 80 at 3am is a screaming anomaly vs hour-3's normal, but would
    # look FINE vs a flat threshold tuned to hour-12 traffic
    rows.append(("k", base + dt.timedelta(days=10, hours=3), 80.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = seasonal_profile(df, ["k"])
    anom = [r for r in out.collect() if r["season_anomaly"]]
    assert len(anom) == 1
    assert anom[0]["value"] == 80.0 and anom[0]["season_bucket"] == 3
    assert anom[0]["season_z"] > 3

    import pytest as _pytest

    with _pytest.raises(ValueError):
        seasonal_profile(df, ["k"], season="lunar")


def test_mann_whitney_hand_case(spark):
    from opentelemetry_collector_contrib_spark.operators.timeseries import mann_whitney_u

    # a = {1,2,3}, b = {4,5,6}: every b beats every a -> U_a = 0, win P(a>b)=0
    rows = [("k", 0, 1.0), ("k", 0, 2.0), ("k", 0, 3.0),
            ("k", 1, 4.0), ("k", 1, 5.0), ("k", 1, 6.0)]
    df = spark.createDataFrame(rows, "k string, ab int, value double")
    r = mann_whitney_u(df, ["k"], "ab").collect()[0]
    assert r["u_stat"] == 0.0 and r["p_a_gt_b"] == 0.0
    assert r["z"] == pytest.approx(-1.963961, abs=1e-4)  # (0-4.5)/sqrt(5.25)

    # identical distributions -> U = n1*n2/2, z = 0... ties everywhere
    same = spark.createDataFrame(
        [("k", i % 2, 7.0) for i in range(10)], "k string, ab int, value double"
    )
    r2 = mann_whitney_u(same, ["k"], "ab").collect()[0]
    assert r2["u_stat"] == pytest.approx(12.5)  # all mid-ranks equal
    assert r2["z"] is None  # all-tied: tie-corrected variance is 0
    assert r2["p_a_gt_b"] == pytest.approx(0.5)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        mann_whitney_u(
            spark.createDataFrame([("k", i % 3, float(i)) for i in range(6)],
                                  "k string, ab int, value double"),
            ["k"], "ab",
        )
