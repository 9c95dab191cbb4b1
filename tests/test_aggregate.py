"""Aggregation-operator tests: count/sum connectors, logdedup, salted agg
equivalence, interval/delta family (golden semantics from the reference's
processor tests, asserted against hand-computed values)."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import aggregate as agg


def test_count_connector_default_value(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "dim string")
    out = {r["dim"]: r["log_count"] for r in agg.count_connector(df, ["dim"], default_value="unset").collect()}
    assert out == {"a": 2, "unset": 1}


def test_sum_connector(spark):
    df = spark.createDataFrame([("x", 1.5), ("x", 2.5), ("y", 1.0)], "dim string, v double")
    out = {r["dim"]: r["total"] for r in agg.sum_connector(df, ["dim"], "v").collect()}
    assert out == {"x": 4.0, "y": 1.0}


def test_salted_agg_equals_plain(routed_t1):
    """The skew-safe two-phase agg must produce identical results to the
    single-phase groupBy (north-rule correctness of the salting)."""
    plain = (
        routed_t1.groupBy("conv_id")
        .agg(F.count("*").alias("turn_count"), F.sum("latency_ms").alias("sum_latency"))
        .orderBy("conv_id")
        .collect()
    )
    salted = (
        agg.salted_agg(routed_t1, ["conv_id"], {"turn_count": ("count", ""), "sum_latency": ("sum", "latency_ms")}, salt_buckets=8)
        .orderBy("conv_id")
        .collect()
    )
    assert plain == salted


def test_log_dedup(spark):
    t0 = datetime.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        ("same line", "user", "none", t0),
        ("same line", "user", "none", t0 + datetime.timedelta(seconds=3)),
        ("same line", "user", "none", t0 + datetime.timedelta(seconds=15)),  # next window
        ("other", "user", "none", t0),
    ]
    df = spark.createDataFrame(rows, "text string, role string, tool string, ts timestamp")
    out = agg.log_dedup(df, interval_s=10)
    got = {(r["window_start"], r["text"]): r["log_count"] for r in out.collect()}
    base = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp())
    assert got[(base, "same line")] == 2
    assert got[(base + 10, "same line")] == 1
    assert got[(base, "other")] == 1


def test_delta_cumulative_roundtrip(spark):
    rows = [("s", i, float(v)) for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "id string, seq int, v double")
    cum = agg.delta_to_cumulative(df, ["id"], "seq", "v")
    assert [r["cumulative"] for r in cum.orderBy("seq").collect()] == [1.0, 3.0, 6.0, 10.0]
    back = agg.cumulative_to_delta(cum, ["id"], "seq", "cumulative")
    deltas = [r["delta"] for r in back.orderBy("seq").collect()]
    assert deltas[0] is None and deltas[1:] == [2.0, 3.0, 4.0]


def test_interval_last(spark):
    t0 = datetime.datetime(2025, 1, 1)
    rows = [("s", t0, 1.0), ("s", t0 + datetime.timedelta(seconds=30), 5.0), ("s", t0 + datetime.timedelta(seconds=90), 2.0)]
    df = spark.createDataFrame(rows, "id string, ts timestamp, v double")
    out = agg.interval_last(df, ["id"], "ts", "v", interval_s=60).orderBy("window_start").collect()
    assert [r["last_value"] for r in out] == [5.0, 2.0]


def test_span_metrics_histogram(spark):
    df = spark.createDataFrame([("a", 5.0), ("a", 50.0), ("a", 500.0)], "dim string, v double")
    out = agg.span_metrics_histogram(df, ["dim"], "v", [10.0, 100.0])
    got = {r["le"]: r["bucket_count"] for r in out.collect()}
    assert got == {10.0: 1, 100.0: 1, float("inf"): 1}


def test_metrics_transform_agg(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("a", 2.0)], "k string, v double")
    r = agg.metrics_transform_agg(df, ["k"], "v").collect()[0]
    assert (r["agg_sum"], r["agg_mean"], r["agg_min"], r["agg_max"], r["agg_median"], r["agg_count"]) == (6.0, 2.0, 1.0, 3.0, 2.0, 3)


def test_metrics_transform_rows(spark):
    from pyspark.sql import functions as F

    rows = [(1, "view", 10.0, "3"), (2, "purchase", 4.0, "7"), (3, "click", 1.0, "7")]
    df = spark.createDataFrame(rows, "event_id long, metric_name string, value double, u string").withColumn(
        "labels", F.create_map(F.lit("user"), F.col("u"))
    ).drop("u")
    out = agg.metrics_transform_rows(
        df,
        [
            {"include": "view", "action": "update", "new_name": "pv",
             "operations": [{"action": "scale_value", "factor": 2.0},
                            {"action": "add_label", "label": "unit", "value": "x"}]},
            {"include": "purchase", "action": "insert", "new_name": "p2",
             "operations": [{"action": "scale_value", "factor": 3.0}]},
            {"include": "click", "action": "update",
             "operations": [{"action": "update_label", "label": "user", "new_label": "uid"}]},
            {"include": "p2", "action": "update",
             "operations": [{"action": "delete_label_value", "label": "user", "value": "7"}]},
        ],
    )
    got = {(r["event_id"], r["metric_name"]): (r["value"], dict(r["labels"])) for r in out.collect()}
    # update renamed + scaled + labeled, applied together to the matched rows
    assert got[(1, "pv")] == (20.0, {"user": "3", "unit": "x"})
    # original purchase kept; inserted copy later deleted by label value
    assert got[(2, "purchase")] == (4.0, {"user": "7"})
    assert (2, "p2") not in got  # sequential: later transform saw the insert
    assert got[(3, "click")][1] == {"uid": "7"}
    assert len(got) == 3


def test_signal_to_metrics(spark):
    rows = [
        ("errors", "assistant", "search", 100, "err"),
        ("general", "user", "none", None, None),
        ("general", "user", "none", None, None),
    ]
    df = spark.createDataFrame(rows, "route_id string, role string, tool string, latency_ms long, status string")
    out = agg.signal_to_metrics(
        df,
        [
            {"name": "turn.count", "type": "count", "dims": ["route_id"]},
            {"name": "err.count", "type": "count", "dims": ["role"], "condition": 'status == "err"'},
            {"name": "lat.sum", "type": "sum", "dims": ["tool"], "condition": "latency_ms >= 0", "value": "latency_ms"},
        ],
    )
    got = {(r["metric_name"], r["dims"]): r["value"] for r in out.collect()}
    assert got[("turn.count", "route_id=general")] == 2.0
    assert got[("turn.count", "route_id=errors")] == 1.0
    assert got[("err.count", "role=assistant")] == 1.0
    assert got[("lat.sum", "tool=search")] == 100.0
    assert ("lat.sum", "tool=none") not in got  # null latency filtered


def test_exceptions_connector(spark):
    rows = [("r1", "a", "t", "boom 1", "err"), ("r1", "a", "t", "boom 0", "err"), ("r1", "a", "t", "fine", "ok")]
    df = spark.createDataFrame(rows, "route_id string, role string, tool string, text string, status string")
    out = agg.exceptions_connector(df, ["route_id", "role", "tool"]).collect()
    assert len(out) == 1
    assert out[0]["exception_count"] == 2 and out[0]["exemplar"] == "boom 0"


def test_metrics_transform_label_merge_and_toggle(spark):
    from pyspark.sql import functions as F

    rows = [("click", "1", 1.9), ("click", "2", 2.0), ("click", "9", 5.0), ("view", "1", 3.7)]
    df = spark.createDataFrame(rows, "metric_name string, u string, value double").withColumn(
        "labels", F.create_map(F.lit("user"), F.col("u"))
    ).drop("u")
    out = agg.metrics_transform_rows(
        df,
        [
            {"include": "click", "action": "update",
             "operations": [{"action": "aggregate_label_values", "label": "user",
                             "values": ["1", "2"], "new_value": "low"}]},
            {"include": "view", "action": "update",
             "operations": [{"action": "toggle_scalar_data_type"}]},
        ],
    )
    got = [(r["metric_name"], dict(r["labels"]), r["value"]) for r in out.collect()]
    assert ("click", {"user": "low"}, 1.9) in got and ("click", {"user": "low"}, 2.0) in got
    assert ("click", {"user": "9"}, 5.0) in got
    assert ("view", {"user": "1"}, 3.0) in got  # double -> int truncation


def test_metrics_transform_add_label_upserts(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "view", 1.0)], "event_id long, metric_name string, value double").withColumn(
        "labels", F.create_map(F.lit("unit"), F.lit("old"))
    )
    out = agg.metrics_transform_rows(
        df,
        [{"include": "view", "action": "update",
          "operations": [{"action": "add_label", "label": "unit", "value": "k"}]}],
    ).collect()
    assert dict(out[0]["labels"]) == {"unit": "k"}  # overwrite, not duplicate-key crash


def test_metrics_transform_add_label_null_labels(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "view", 1.0)], "event_id long, metric_name string, value double").withColumn(
        "labels", F.lit(None).cast("map<string,string>")
    )
    out = agg.metrics_transform_rows(
        df,
        [{"include": "view", "action": "update",
          "operations": [{"action": "add_label", "label": "unit", "value": "k"}]}],
    ).collect()
    assert dict(out[0]["labels"]) == {"unit": "k"}  # null map -> single entry


# --- metricsaslogsconnector (connector/metricsaslogsconnector/connector.go) ---


def test_metrics_as_logs_gauge_keeps_int_type(spark):
    df = spark.createDataFrame([("cpu", 7)], "host string, v long")
    out = agg.metrics_as_logs(df, "Gauge", "sys.cpu", value_col="v", unit="%").collect()[0]
    assert out["body"] == "metric converted to log"
    assert out["metric_type"] == "Gauge" and out["metric_unit"] == "%"
    assert out["gauge_value"] == 7 and isinstance(out["gauge_value"], int)  # PutInt path
    assert out["sum_value"] is None
    assert out["metric_is_monotonic"] is None  # sum-only attr absent on gauges
    assert out["metric_aggregation_temporality"] is None


def test_metrics_as_logs_sum_attrs(spark):
    df = spark.createDataFrame([("a", 1.5)], "dim string, total double")
    out = agg.metrics_as_logs(
        df, "Sum", "events.total", value_col="total", temporality="Delta", is_monotonic=False
    ).collect()[0]
    assert out["sum_value"] == 1.5 and out["gauge_value"] is None
    assert out["metric_is_monotonic"] is False
    assert out["metric_aggregation_temporality"] == "Delta"


def test_metrics_as_logs_histogram_arrays(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("svc", 10, 42.5)], "service string, cnt long, total double"
    ).withColumn("bc", F.array(F.lit(3), F.lit(7))).withColumn(
        "eb", F.array(F.lit(0.5), F.lit(1.0))
    )
    out = agg.metrics_as_logs(
        df,
        "Histogram",
        "latency",
        histogram={"count": "cnt", "sum": "total", "bucket_counts": "bc", "explicit_bounds": "eb"},
    ).collect()[0]
    assert out["histogram_count"] == 10 and out["histogram_sum"] == 42.5
    assert out["histogram_bucket_counts"] == [3, 7]
    assert out["histogram_explicit_bounds"] == [0.5, 1.0]
    assert out["gauge_value"] is None and out["summary_count"] is None


def test_metrics_as_logs_summary_quantiles(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(100, 9.5)], "cnt long, total double").withColumn(
        "qv",
        F.array(
            F.struct(F.lit(0.5).alias("quantile"), F.lit(1.0).alias("value")),
            F.struct(F.lit(0.99).alias("quantile"), F.lit(4.0).alias("value")),
        ),
    )
    out = agg.metrics_as_logs(
        df, "Summary", "latency.summary",
        summary={"count": "cnt", "sum": "total", "quantiles": "qv"},
    ).collect()[0]
    assert out["summary_count"] == 100 and out["summary_sum"] == 9.5
    assert [(q["quantile"], q["value"]) for q in out["summary_quantile_values"]] == [
        (0.5, 1.0), (0.99, 4.0),
    ]
    assert out["metric_type"] == "Summary" and out["gauge_value"] is None


# --- histogram datapoint merge / rebucket ------------------------------------


def test_histogram_merge_and_rebucket(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import (
        histogram_merge,
        histogram_rebucket,
    )

    rows = [
        ("a", 3, 6.0, [1, 2, 0], [10.0, 20.0]),
        ("a", 2, 4.0, [0, 1, 1], [10.0, 20.0]),
        ("b", 1, 9.0, [0, 0, 1], [10.0, 20.0]),
    ]
    df = spark.createDataFrame(
        rows,
        "k string, h_count long, h_sum double, bucket_counts array<bigint>, explicit_bounds array<double>",
    )
    merged = {r["k"]: r for r in histogram_merge(df, ["k"]).collect()}
    assert merged["a"]["bucket_counts"] == [1, 3, 1]
    assert merged["a"]["h_count"] == 5 and merged["a"]["h_sum"] == 10.0
    assert merged["b"]["bucket_counts"] == [0, 0, 1]

    # removing bound 10 folds its bucket into the next (func_merge_histogram
    # _buckets.go remove_explicit_bound semantics)
    coarse = {r["k"]: r for r in histogram_rebucket(histogram_merge(df, ["k"]), [20.0]).collect()}
    assert coarse["a"]["bucket_counts"] == [4, 1]
    assert coarse["a"]["explicit_bounds"] == [20.0]

    # a bound that doesn't exist in the row -> NULL arrays (on_error=send)
    bad = histogram_rebucket(df, [15.0]).collect()
    assert all(r["bucket_counts"] is None and r["explicit_bounds"] is None for r in bad)


def test_histogram_datapoints_builds_otlp_shape(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import histogram_datapoints

    df = spark.createDataFrame(
        [("x", 1.0), ("x", 7.0), ("x", 100.0), ("y", 3.0)], "k string, v double"
    )
    out = {r["k"]: r for r in histogram_datapoints(df, ["k"], "v", [5.0, 10.0]).collect()}
    assert out["x"]["bucket_counts"] == [1, 1, 1]  # <=5, (5,10], >10
    assert out["x"]["h_count"] == 3 and out["x"]["h_sum"] == 108.0
    assert out["x"]["explicit_bounds"] == [5.0, 10.0]
    assert out["y"]["bucket_counts"] == [1, 0, 0]


def test_exp_histogram_downscale_matches_collapse(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import (
        exp_histogram_downscale,
    )

    rows = [
        # scale.go Collapse doc example: 12 ones at offset 0 -> six 2s
        ("even", 2, 0, 0, [1] * 12),
        # odd offset: abs 1,2,3 -> floor/2 = 0,1,1
        ("odd", 2, 0, 1, [1, 1, 1]),
        # negative offset: abs -3,-2,-1 -> floor/2 = -2,-1,-1
        ("neg", 2, 0, -3, [1, 1, 1]),
        # already at target: identity
        ("id", 1, 0, 2, [5, 6]),
        # below target: upscale impossible -> NULL
        ("up", 0, 0, 0, [7]),
    ]
    df = spark.createDataFrame(
        rows, "k string, scale int, zero_count long, offset int, bucket_counts array<bigint>"
    )
    out = {r["k"]: r for r in exp_histogram_downscale(df, 1).collect()}
    assert out["even"]["offset"] == 0 and out["even"]["bucket_counts"] == [2] * 6
    assert out["odd"]["offset"] == 0 and out["odd"]["bucket_counts"] == [1, 2]
    assert out["neg"]["offset"] == -2 and out["neg"]["bucket_counts"] == [1, 2]
    assert out["id"]["offset"] == 2 and out["id"]["bucket_counts"] == [5, 6]
    assert out["up"]["bucket_counts"] is None and out["up"]["scale"] is None


def test_exp_histogram_merge_aligns_scales(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import exp_histogram_merge

    rows = [
        # scale 2, abs 0..2
        ("a", 2, 1, 10, 5.0, 0, [1, 2, 3]),
        # scale 3, abs 4..7 -> at scale 2: floor/2 = 2,2,3,3 -> [3, 2+1=..]
        ("a", 3, 2, 20, 7.0, 4, [1, 1, 1, 1]),
        ("b", 1, 0, 3, 1.5, -1, [3]),
    ]
    df = spark.createDataFrame(
        rows,
        "k string, scale int, zero_count long, h_count long, h_sum double,"
        " offset int, bucket_counts array<bigint>",
    )
    out = {r["k"]: r for r in exp_histogram_merge(df, ["k"]).collect()}
    a = out["a"]
    # common scale = 2; second dp downscales to offset 2, counts [2, 2];
    # merged span 0..3 -> [1, 2, 3+2, 2]
    assert a["scale"] == 2 and a["offset"] == 0
    assert a["bucket_counts"] == [1, 2, 5, 2]
    assert a["zero_count"] == 3 and a["h_count"] == 30 and a["h_sum"] == 12.0
    b = out["b"]
    assert b["scale"] == 1 and b["offset"] == -1 and b["bucket_counts"] == [3]


def test_exp_histogram_delta_to_cumulative(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import (
        exp_histogram_delta_to_cumulative,
    )

    rows = [
        # series s: t1 at scale 2 (abs 0..1), t2 at scale 3 (abs 2..3 ->
        # scale 2: both fold to abs 1), t3 at scale 2 (abs 2)
        ("s", 1, 2, 1, 2, 3.0, 0, [1, 1]),
        ("s", 2, 3, 0, 1, 1.0, 2, [2, 3]),
        ("s", 3, 2, 2, 1, 4.0, 2, [7]),
    ]
    df = spark.createDataFrame(
        rows,
        "k string, t int, scale int, zero_count long, h_count long, h_sum double,"
        " offset int, bucket_counts array<bigint>",
    )
    out = {r["t"]: r for r in exp_histogram_delta_to_cumulative(df, ["k"], "t").collect()}
    # span at scale 2 = abs 0..2
    assert out[1]["bucket_counts"] == [1, 1, 0] and out[1]["offset"] == 0
    assert out[2]["bucket_counts"] == [1, 6, 0]   # t2's [2,3] folds into abs 1
    assert out[3]["bucket_counts"] == [1, 6, 7]
    assert out[3]["zero_count"] == 3 and out[3]["h_count"] == 4 and out[3]["h_sum"] == 8.0
    assert all(r["scale"] == 2 for r in out.values())


def test_histogram_cumulative_to_delta_with_resets(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import (
        histogram_cumulative_to_delta,
    )

    rows = [
        ("s", 1, 3, 3.0, [1, 2], [10.0]),
        ("s", 2, 7, 8.0, [3, 4], [10.0]),     # delta: count 4, sum 5, [2, 2]
        ("s", 3, 2, 1.0, [1, 1], [10.0]),     # count DECREASED -> reset, pass through
        ("s", 4, 5, 4.0, [2, 3], [20.0]),     # bounds changed -> reset
        ("s", 5, 6, 6.0, [3, 3], [20.0]),     # delta: count 1, sum 2, [1, 0]
    ]
    df = spark.createDataFrame(
        rows,
        "k string, t int, h_count long, h_sum double, bucket_counts array<bigint>,"
        " explicit_bounds array<double>",
    )
    out = {r["t"]: r for r in histogram_cumulative_to_delta(df, ["k"], "t").collect()}
    assert out[1]["is_reset"] and out[1]["bucket_counts"] == [1, 2]
    assert not out[2]["is_reset"]
    assert out[2]["h_count"] == 4 and out[2]["h_sum"] == 5.0 and out[2]["bucket_counts"] == [2, 2]
    assert out[3]["is_reset"] and out[3]["bucket_counts"] == [1, 1]
    assert out[4]["is_reset"] and out[4]["bucket_counts"] == [2, 3]
    assert not out[5]["is_reset"] and out[5]["bucket_counts"] == [1, 0]
    assert out[5]["h_count"] == 1 and out[5]["h_sum"] == 2.0


def test_histogram_limit_buckets(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import histogram_limit_buckets

    rows = [
        ("even", [1, 2, 3, 4], [10.0, 20.0, 30.0]),
        ("odd", [1, 2, 3, 4, 5], [1.0, 2.0, 3.0, 4.0]),
        ("small", [7], []),
    ]
    df = spark.createDataFrame(
        rows, "k string, bucket_counts array<bigint>, explicit_bounds array<double>"
    )
    out = {r["k"]: r for r in histogram_limit_buckets(df, 2).collect()}
    assert out["even"]["bucket_counts"] == [3, 7]
    assert out["even"]["explicit_bounds"] == [20.0]
    # odd: [1+2, 3+4, 5] (3 > 2) -> [3+7, 5] -> 2 buckets
    assert out["odd"]["bucket_counts"] == [10, 5]
    assert out["odd"]["explicit_bounds"] == [4.0]
    assert out["small"]["bucket_counts"] == [7] and out["small"]["explicit_bounds"] == []
    total = lambda r: sum(r)  # noqa: E731
    assert total(out["odd"]["bucket_counts"]) == 15  # counts conserved


def test_exp_histogram_empty_buckets_survive(spark):
    """Zero-bucket exponential datapoints (only zero_count observed) must
    neither crash the array math nor silently drop their scalars."""
    from opentelemetry_collector_contrib_spark.operators.aggregate import (
        exp_histogram_delta_to_cumulative,
        exp_histogram_downscale,
        exp_histogram_merge,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, 3, 2, 5, 2.0, 0, []),
            ("a", 2, 2, 1, 4, 3.0, 0, [1, 2]),
        ],
        "k string, t int, scale int, zero_count long, h_count long, h_sum double,"
        " offset int, bucket_counts array<bigint>",
    )
    down = {r["t"]: r for r in exp_histogram_downscale(df, 2).collect()}
    assert down[1]["bucket_counts"] == [] and down[1]["scale"] == 2

    merged = exp_histogram_merge(df, ["k"]).collect()[0]
    assert merged["zero_count"] == 3 and merged["h_count"] == 9 and merged["h_sum"] == 5.0
    assert merged["bucket_counts"] == [1, 2]

    cum = {r["t"]: r for r in exp_histogram_delta_to_cumulative(df, ["k"], "t").collect()}
    assert cum[1]["zero_count"] == 2 and cum[1]["bucket_counts"] == [0, 0]
    assert cum[2]["zero_count"] == 3 and cum[2]["bucket_counts"] == [1, 2]

    # an ALL-empty series merges to empty buckets with summed scalars
    df2 = spark.createDataFrame(
        [("b", 1, 2, 2, 2, 1.0, 0, []), ("b", 2, 2, 1, 1, 1.0, 0, [])],
        "k string, t int, scale int, zero_count long, h_count long, h_sum double,"
        " offset int, bucket_counts array<bigint>",
    )
    m2 = exp_histogram_merge(df2, ["k"]).collect()[0]
    assert m2["zero_count"] == 3 and m2["h_count"] == 3 and m2["bucket_counts"] == []


def test_histogram_merge_null_buckets_poison_not_vanish(spark):
    """A NULL bucket list (an on_error=send row) poisons the merged group's
    buckets to NULL but its count/sum still aggregate — silent undercount
    is the failure mode this guards."""
    from opentelemetry_collector_contrib_spark.operators.aggregate import histogram_merge

    rows = [
        ("a", 3, 6.0, [1, 2], [10.0]),
        ("a", 2, 4.0, None, [10.0]),
        ("b", 1, 9.0, [], [10.0]),   # EMPTY (not null): scalars survive too
    ]
    df = spark.createDataFrame(
        rows,
        "k string, h_count long, h_sum double, bucket_counts array<bigint>,"
        " explicit_bounds array<double>",
    )
    out = {r["k"]: r for r in histogram_merge(df, ["k"]).collect()}
    assert out["a"]["bucket_counts"] is None
    assert out["a"]["h_count"] == 5 and out["a"]["h_sum"] == 10.0
    assert out["b"]["bucket_counts"] == [] and out["b"]["h_count"] == 1


def test_histogram_scale_values(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import histogram_scale_values

    df = spark.createDataFrame(
        [("a", 4, 2000.0, [1, 3], [100.0])],
        "k string, h_count long, h_sum double, bucket_counts array<bigint>, explicit_bounds array<double>",
    )
    r = histogram_scale_values(df, 0.001).collect()[0]
    assert r["h_sum"] == 2.0 and r["explicit_bounds"] == [0.1]
    assert r["bucket_counts"] == [1, 3] and r["h_count"] == 4


def test_host_info_datapoints_break_on_first(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import host_info_datapoints
    import pytest as _pt

    df = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", "h1", "fallback-a"),  # first identifier wins
            ("2024-01-01 00:20:00", None, "fallback-b"),  # break falls through
            ("2024-01-01 00:25:00", "h1", "fallback-c"),  # same host+window dedups
            ("2024-01-01 01:05:00", "h1", None),          # new window re-emits
            ("2024-01-01 01:06:00", None, None),          # no identifier -> dropped
        ],
        "ts string, host_id string, user string",
    )
    rows = {
        (r["window_start"], r["grafana_host_id"]): r
        for r in host_info_datapoints(df, ["host_id", "user"], interval_s=3600).collect()
    }
    base = 1704067200  # 2024-01-01T00:00:00Z
    assert set(rows) == {(base, "h1"), (base, "fallback-b"), (base + 3600, "h1")}
    assert all(r["value"] == 1 and r["metric_name"] == "traces_host_info" for r in rows.values())
    with _pt.raises(ValueError):
        host_info_datapoints(df, [])


def test_start_time_strategies(spark):
    """Mirrors metricstarttimeprocessor internal/{truereset,subtractinitial}
    adjuster semantics on a hand-built series with one reset."""
    from opentelemetry_collector_contrib_spark.operators.aggregate import start_time_adjust

    df = spark.createDataFrame(
        [
            ("s", 1, "2024-01-01 00:00:10", 5.0),
            ("s", 2, "2024-01-01 00:00:20", 8.0),
            ("s", 3, "2024-01-01 00:00:30", 2.0),  # reset (2 < 8)
            ("s", 4, "2024-01-01 00:00:40", 6.0),
        ],
        "k string, i int, ts string, value double",
    )
    nulled = spark.createDataFrame(
        [
            ("s", 1, "2024-01-01 00:00:10", 5.0),
            ("s", 2, "2024-01-01 00:00:20", None),  # NoRecordedValue analogue
            ("s", 3, "2024-01-01 00:00:30", 8.0),   # NOT a reset: prev recorded = 5
        ],
        "k string, i int, ts string, value double",
    )
    t = {r["i"]: r for r in start_time_adjust(df, ["k"], ["i"], strategy="true_reset_point").collect()}
    base = 1704067200_000000
    assert len(t) == 4 and t[1]["adjusted"] == 5.0  # nothing dropped, values as-is
    assert t[1]["start_ts_us"] == base + 10_000000  # first point: own ts
    assert t[2]["start_ts_us"] == base + 10_000000  # reuses epoch start
    assert t[3]["start_ts_us"] == base + 30_000000 - 1000  # reset: own ts - 1ms
    assert t[4]["start_ts_us"] == t[3]["start_ts_us"]

    s = {r["i"]: r for r in start_time_adjust(df, ["k"], ["i"], strategy="subtract_initial_point").collect()}
    assert set(s) == {2, 3, 4}  # reference point dropped
    assert s[2]["adjusted"] == 3.0 and s[2]["start_ts_us"] == base + 10_000000  # 8 - ref 5
    assert s[3]["adjusted"] == 2.0 and s[3]["start_ts_us"] == base + 30_000000 - 1000  # raw, re-ref 0
    assert s[4]["adjusted"] == 6.0  # reset epoch subtracts 0

    # NULL values pass through without opening an epoch and without
    # becoming the reset-comparison reference
    n = {r["i"]: r for r in start_time_adjust(nulled, ["k"], ["i"], strategy="subtract_initial_point").collect()}
    assert set(n) == {2, 3}
    assert n[2]["adjusted"] is None and n[2]["start_ts_us"] == base + 10_000000
    assert n[3]["adjusted"] == 3.0 and n[3]["start_ts_us"] == base + 10_000000  # 8 - ref 5, same epoch

    import pytest as _pt

    with _pt.raises(ValueError):
        start_time_adjust(df, ["k"], ["i"], strategy="nope")


def test_rollup_report_levels(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import rollup_report

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)], "d1 string, d2 string, v double"
    )
    out = rollup_report(df, ["d1", "d2"], {"n": F.count(F.lit(1)), "s": F.sum("v")})
    rows = {(r["gid"], r["d1"], r["d2"]): (r["n"], r["s"]) for r in out.collect()}
    # leaf cells (gid=0), per-d1 subtotals (gid=1: d2 rolled), grand total (gid=3)
    assert rows[(0, "a", "x")] == (1, 1.0)
    assert rows[(1, "a", None)] == (2, 3.0)
    assert rows[(1, "b", None)] == (1, 4.0)
    assert rows[(3, None, None)] == (3, 7.0)
    assert len(rows) == 3 + 2 + 1  # rollup: no (d2-only) level


def test_rollup_report_cube_adds_d2_level(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import rollup_report

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("b", "x", 4.0)], "d1 string, d2 string, v double"
    )
    out = rollup_report(df, ["d1", "d2"], {"n": F.count(F.lit(1))}, mode="cube")
    rows = {(r["gid"], r["d1"], r["d2"]): r["n"] for r in out.collect()}
    assert rows[(2, None, "x")] == 2  # gid=2: d1 rolled up — cube-only level

    with pytest.raises(ValueError):
        rollup_report(df, ["d1"], {"n": F.count(F.lit(1))}, mode="bogus")


def test_collapse_long_tail_preserves_totals(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import collapse_long_tail

    rows = [(f"k{i % 20}", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = collapse_long_tail(
        df, "k", {"s": F.sum(F.col("v").cast("decimal(18,6)")).cast("decimal(28,6)")},
        top_k=3,
    ).collect()
    assert len(out) == 4  # 3 kept + __other__
    assert sum(r["n"] for r in out) == 200
    assert float(sum(r["s"] for r in out)) == sum(float(i) for i in range(200))
    other = [r for r in out if r["k"] == "__other__"][0]
    assert other["n"] == 200 - sum(r["n"] for r in out if r["k"] != "__other__")

    # min_frac mode: a dominant key survives regardless of top_k
    skew = spark.createDataFrame([("big", 1.0)] * 90 + [(f"t{i}", 1.0) for i in range(10)], "k string, v double")
    out2 = collapse_long_tail(skew, "k", {"s": F.sum(F.col("v").cast("decimal(18,6)"))}, top_k=1, min_frac=0.5)
    keys = {r["k"] for r in out2.collect()}
    assert "big" in keys and "__other__" in keys

    # no tail at all: no __other__ row emitted
    out3 = collapse_long_tail(skew, "k", {"s": F.sum(F.col("v").cast("decimal(18,6)"))}, top_k=100).collect()
    assert not any(r["k"] == "__other__" for r in out3)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        collapse_long_tail(df, "k", {})


def test_histogram_exemplars_first_k_stable_order(spark):
    from opentelemetry_collector_contrib_spark.operators.aggregate import histogram_exemplars

    rows = [("a", float(v), v, f"t{v}", f"s{v}") for v in range(8)] + [
        ("b", 1.0, 0, "tb", "sb")
    ]
    df = spark.createDataFrame(rows, "dim string, value double, ord int, trace_id string, span_id string")
    out = {
        r["dim"]: r["exemplars"]
        for r in histogram_exemplars(
            df, ["dim"], "value", "trace_id", "span_id", ["ord"], max_per_data_point=3
        ).collect()
    }
    # first 3 by the stable order, in order
    assert [e["trace_id"] for e in out["a"]] == ["t0", "t1", "t2"]
    assert [e["value"] for e in out["a"]] == [0.0, 1.0, 2.0]
    assert len(out["b"]) == 1 and out["b"][0]["span_id"] == "sb"
