"""transformprocessor metric-context editors vs the reference test tables
(processor/transformprocessor/internal/metrics/func_*_test.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from opentelemetry_collector_contrib_spark.operators.metric_editors import (
    aggregate_on_attribute_value,
    aggregate_on_attributes,
    convert_exponential_histogram_to_histogram,
    convert_gauge_to_sum,
    convert_sum_to_gauge,
    convert_summary_count_val_to_sum,
    convert_summary_quantile_val_to_gauge,
    convert_summary_sum_val_to_sum,
    copy_metric,
    extract_count_metric,
    extract_percentile_metric,
    extract_sum_metric,
    scale_metric,
)


# ---------------------------------------------------------------------------
# convert_exponential_histogram_to_histogram — reference test vectors
# (func_convert_exponential_hist_to_explicit_hist_test.go)
# ---------------------------------------------------------------------------

def _exp_hist_df(spark, scale, offset, counts, count, zero_count=0, h_sum=999.0):
    return spark.createDataFrame(
        [
            Row(
                metric_name="test-metric",
                scale=scale,
                zero_count=zero_count,
                offset=offset,
                bucket_counts=[int(c) for c in counts],
                h_count=count,
                h_sum=h_sum,
            )
        ],
        "metric_name string, scale int, zero_count bigint, offset int, "
        "bucket_counts array<bigint>, h_count bigint, h_sum double",
    )


UPPER_DP = dict(scale=7, offset=944, counts=[1] + [0] * 28 + [1], count=2)
DEFAULT_DP = dict(scale=0, offset=5, counts=[10, 22, 12], count=44)


@pytest.mark.parametrize(
    "dp,dist,bounds,want",
    [
        # upper family (test.go:90-193)
        (UPPER_DP, "upper", [1.0, 2.0, 3.0, 4.0, 5.0], [0, 0, 0, 0, 2]),
        (UPPER_DP, "upper", [1000.0, 2000.0, 3000.0, 4000.0, 5000.0], [2, 0, 0, 0, 0]),
        (UPPER_DP, "upper", [160.0, 170.0, 180.0, 190.0, 200.0], [1, 0, 0, 1, 0]),
        # midpoint family (test.go:302-407)
        (DEFAULT_DP, "midpoint", [1.0, 2.0, 3.0, 4.0, 5.0], [0, 0, 0, 0, 44]),
        (DEFAULT_DP, "midpoint", [1000.0, 2000.0, 3000.0, 4000.0, 5000.0], [44, 0, 0, 0, 0]),
        (
            DEFAULT_DP,
            "midpoint",
            [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0],
            [0, 0, 0, 10, 0, 0, 0, 0, 22, 12],
        ),
        # uniform family (test.go:485-566)
        (DEFAULT_DP, "uniform", [1.0, 2.0, 3.0, 4.0, 5.0], [0, 0, 0, 0, 44]),
        (DEFAULT_DP, "uniform", [1000.0, 2000.0, 3000.0, 4000.0, 5000.0], [44, 0, 0, 0, 0]),
        (
            DEFAULT_DP,
            "uniform",
            [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0],
            [0, 0, 0, 3, 3, 2, 8, 6, 5, 17],
        ),
    ],
)
def test_exp_to_explicit_reference_vectors(spark, dp, dist, bounds, want):
    df = _exp_hist_df(spark, dp["scale"], dp["offset"], dp["counts"], dp["count"])
    out = convert_exponential_histogram_to_histogram(df, dist, bounds).collect()[0]
    assert out.bucket_counts == want
    assert out.explicit_bounds == bounds
    assert out.h_count == dp["count"]
    assert sum(out.bucket_counts) == dp["count"]


def test_exp_to_explicit_zero_count_into_zero_bound(spark):
    # test.go:379-405 — zero_count lands in bucket 0 iff bounds[0] == 0
    bounds = [0.0, 10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0]
    df = _exp_hist_df(spark, 0, 5, [10, 22, 12], 44, zero_count=5)
    out = convert_exponential_histogram_to_histogram(df, "midpoint", bounds).collect()[0]
    assert out.bucket_counts == [5, 0, 0, 0, 10, 0, 0, 0, 0, 22, 12]


def test_exp_to_explicit_rejects_random_and_empty_bounds(spark):
    df = _exp_hist_df(spark, 0, 5, [1], 1)
    with pytest.raises(ValueError, match="random"):
        convert_exponential_histogram_to_histogram(df, "random", [1.0])
    with pytest.raises(ValueError, match="empty"):
        convert_exponential_histogram_to_histogram(df, "upper", [])


# ---------------------------------------------------------------------------
# extract_percentile_metric — reference test vectors
# (func_extract_percentile_metric_test.go:190-356)
# ---------------------------------------------------------------------------

def _hist_df(spark, count, counts, h_min=None, h_max=None):
    return spark.createDataFrame(
        [
            Row(
                metric_name="m",
                h_count=count,
                bucket_counts=[int(c) for c in counts],
                h_min=h_min,
                h_max=h_max,
            )
        ],
        "metric_name string, h_count bigint, bucket_counts array<bigint>, "
        "h_min double, h_max double",
    )


@pytest.mark.parametrize(
    "count,counts,bounds,minmax,pct,want",
    [
        (100, [60, 40], [1.0], (None, None), 50.0, 0.8333333333333334),
        (115, [50, 35, 50], [1.0, 5.0], (None, None), 99.0, 5.0),
        (115, [50, 35, 50, 15], [1.0, 3.0, 5.0], (None, None), 95.0, 4.0),
        (1000, [100, 400, 400, 95, 5], [0.1, 0.5, 1.0, 5.0], (None, None), 99.5, 5.0),
        (100, [25, 50, 25], [100.0, 500.0], (None, 750.0), 99.0, 740.0),
        (41, [40, 1], [100.0], (None, None), 75.0, 77.5),
        (1000, [50, 100, 200, 300, 200, 100, 50], [10.0, 25.0, 50.0, 100.0, 250.0, 500.0], (None, None), 90.0, 375.0),
        (100, [40, 60], [10.0], (None, None), 50.0, 10.0),
        (100, [100], [], (5.0, 25.0), 50.0, 15.0),
        (100, [100, 0], [-5.0], (None, None), 50.0, -5.0),
        (100, [100, 0], [-5.0], (-10.0, None), 50.0, -7.5),
    ],
)
def test_extract_percentile_reference_vectors(spark, count, counts, bounds, minmax, pct, want):
    df = _hist_df(spark, count, counts, h_min=minmax[0], h_max=minmax[1])
    rows = extract_percentile_metric(df, pct, bounds).collect()
    assert len(rows) == 1
    assert rows[0].value == pytest.approx(want, abs=1e-12)
    assert rows[0].metric_name == f"m_p{pct:g}"
    assert rows[0].metric_type == "Gauge"


def test_extract_percentile_skips(spark):
    # zero count (test.go:190-199) and no-bounds-without-min/max (:329-338)
    assert extract_percentile_metric(_hist_df(spark, 0, [0, 0]), 50.0, [1.0]).count() == 0
    assert extract_percentile_metric(_hist_df(spark, 100, [100]), 50.0, []).count() == 0
    with pytest.raises(ValueError):
        extract_percentile_metric(_hist_df(spark, 1, [1]), 101.0, [1.0])


def test_extract_percentile_custom_suffix(spark):
    rows = extract_percentile_metric(
        _hist_df(spark, 1000, [100, 400, 400, 95, 5]), 99.5, [0.1, 0.5, 1.0, 5.0],
        suffix="_percentile_995",
    ).collect()
    assert rows[0].metric_name == "m_percentile_995"


# ---------------------------------------------------------------------------
# scale_metric (func_scale_test.go semantics)
# ---------------------------------------------------------------------------

def test_scale_metric_number_and_histogram(spark):
    df = spark.createDataFrame(
        [
            Row(metric_type="Gauge", value=10.5, h_sum=None, h_min=None, h_max=None,
                explicit_bounds=None, bucket_counts=None, s_sum=None, quantiles=None,
                metric_unit="ms"),
            Row(metric_type="Histogram", value=None, h_sum=30.0, h_min=1.0, h_max=9.0,
                explicit_bounds=[1.0, 5.0], bucket_counts=[2, 1, 1], s_sum=None,
                quantiles=None, metric_unit="ms"),
            Row(metric_type="Summary", value=None, h_sum=None, h_min=None, h_max=None,
                explicit_bounds=None, bucket_counts=None, s_sum=20.0,
                quantiles=[Row(quantile=0.5, value=4.0)], metric_unit="ms"),
        ],
        "metric_type string, value double, h_sum double, h_min double, h_max double, "
        "explicit_bounds array<double>, bucket_counts array<bigint>, s_sum double, "
        "quantiles array<struct<quantile:double,value:double>>, metric_unit string",
    )
    out = {r.metric_type: r for r in scale_metric(df, 1000.0, unit="us").collect()}
    assert out["Gauge"].value == 10500.0
    assert out["Histogram"].h_sum == 30000.0
    assert out["Histogram"].h_min == 1000.0
    assert out["Histogram"].h_max == 9000.0
    assert out["Histogram"].explicit_bounds == [1000.0, 5000.0]
    assert out["Histogram"].bucket_counts == [2, 1, 1]  # counts never scale
    assert out["Summary"].s_sum == 20000.0
    assert out["Summary"].quantiles[0].value == 4000.0
    assert out["Summary"].quantiles[0].quantile == 0.5  # quantile point untouched
    assert all(r.metric_unit == "us" for r in out.values())


def test_scale_metric_int_value_truncates(spark):
    # reference scaleMetric: SetIntValue(int64(float64(v) * multiplier))
    df = spark.createDataFrame([Row(metric_type="Sum", value=7)], "metric_type string, value bigint")
    assert scale_metric(df, 0.5).collect()[0].value == 3  # 3.5 truncates


# ---------------------------------------------------------------------------
# type toggles + copy
# ---------------------------------------------------------------------------

def test_convert_sum_gauge_roundtrip(spark):
    df = spark.createDataFrame(
        [Row(metric_type="Sum", metric_aggregation_temporality="Delta",
             metric_is_monotonic=True, value=1.0),
         Row(metric_type="Histogram", metric_aggregation_temporality="Delta",
             metric_is_monotonic=None, value=2.0)],
        "metric_type string, metric_aggregation_temporality string, "
        "metric_is_monotonic boolean, value double",
    )
    g = {r.value: r for r in convert_sum_to_gauge(df).collect()}
    assert g[1.0].metric_type == "Gauge"
    assert g[1.0].metric_aggregation_temporality is None
    assert g[1.0].metric_is_monotonic is None
    assert g[2.0].metric_type == "Histogram"  # non-sum untouched

    back = convert_gauge_to_sum(spark.createDataFrame(
        [Row(metric_type="Gauge", value=1.0)], "metric_type string, value double"
    ), "cumulative", monotonic=True).collect()[0]
    assert back.metric_type == "Sum"
    assert back.metric_aggregation_temporality == "Cumulative"
    assert back.metric_is_monotonic is True

    with pytest.raises(ValueError, match="unknown aggregation temporality"):
        convert_gauge_to_sum(df, "sliding")


def test_copy_metric(spark):
    df = spark.createDataFrame(
        [Row(metric_name="m", metric_unit="ms", value=1.0)],
        "metric_name string, metric_unit string, value double",
    )
    out = copy_metric(df, name="m2", unit="s").collect()
    names = sorted((r.metric_name, r.metric_unit) for r in out)
    assert names == [("m", "ms"), ("m2", "s")]


# ---------------------------------------------------------------------------
# extract_count / extract_sum / convert_summary_*
# ---------------------------------------------------------------------------

def test_extract_count_and_sum(spark):
    df = spark.createDataFrame(
        [Row(metric_name="lat", metric_unit="ms", h_count=5, h_sum=12.5,
             bucket_counts=[5], route="a"),
         Row(metric_name="lat", metric_unit="ms", h_count=3, h_sum=None,
             bucket_counts=[3], route="b")],
        "metric_name string, metric_unit string, h_count bigint, h_sum double, "
        "bucket_counts array<bigint>, route string",
    )
    cnt = {r.route: r for r in extract_count_metric(df, monotonic=True).collect()}
    assert cnt["a"].metric_name == "lat_count"
    assert cnt["a"].value == 5 and cnt["b"].value == 3
    assert cnt["a"].metric_unit == "1"  # unit forced (func_extract_count_metric.go:54)
    assert cnt["a"].metric_is_monotonic is True
    assert cnt["a"].metric_type == "Sum"

    sums = extract_sum_metric(df).collect()
    assert len(sums) == 1  # the NULL-sum datapoint is skipped (HasSum false)
    assert sums[0].metric_name == "lat_sum"
    assert sums[0].value == 12.5
    assert sums[0].metric_unit == "ms"  # original unit kept


def test_convert_summary_editors(spark):
    df = spark.createDataFrame(
        [Row(metric_name="rt", metric_unit="s", s_count=10, s_sum=55.0,
             quantiles=[Row(quantile=0.5, value=5.0), Row(quantile=0.9, value=9.0)])],
        "metric_name string, metric_unit string, s_count bigint, s_sum double, "
        "quantiles array<struct<quantile:double,value:double>>",
    )
    c = convert_summary_count_val_to_sum(df, "delta", monotonic=False).collect()[0]
    assert (c.metric_name, c.value, c.metric_unit) == ("rt_count", 10, "s")
    assert c.metric_aggregation_temporality == "Delta"
    assert c.metric_is_monotonic is False

    s = convert_summary_sum_val_to_sum(df).collect()[0]
    assert (s.metric_name, s.value) == ("rt_sum", 55.0)

    q = sorted(convert_summary_quantile_val_to_gauge(df).collect(), key=lambda r: r.quantile)
    assert [(r.metric_name, r.quantile, r.value, r.metric_type) for r in q] == [
        ("rt.quantiles", 0.5, 5.0, "Gauge"),
        ("rt.quantiles", 0.9, 9.0, "Gauge"),
    ]

    with pytest.raises(ValueError):
        convert_summary_count_val_to_sum(df, "bogus")


# ---------------------------------------------------------------------------
# aggregate_on_attributes / aggregate_on_attribute_value
# (aggregateutil/aggregate.go merge tables)
# ---------------------------------------------------------------------------

def _num_dps(spark):
    rows = [
        Row(labels={"env": "prod", "host": "a"}, value=1.0, ts=10),
        Row(labels={"env": "prod", "host": "b"}, value=3.0, ts=10),
        Row(labels={"env": "dev", "host": "a"}, value=5.0, ts=10),
        Row(labels={"env": "prod", "host": "a"}, value=7.0, ts=20),
    ]
    return spark.createDataFrame(rows, "labels map<string,string>, value double, ts bigint")


def test_aggregate_on_attributes_sum_filters_attrs(spark):
    out = aggregate_on_attributes(_num_dps(spark), "sum", attributes=["env"]).collect()
    got = {(r.labels["env"], r.ts): r.value for r in out}
    assert got == {("prod", 10): 4.0, ("dev", 10): 5.0, ("prod", 20): 7.0}


def test_aggregate_on_attributes_fns(spark):
    df = _num_dps(spark)
    for fn, want in [("mean", 2.0), ("min", 1.0), ("max", 3.0), ("count", 2.0), ("median", 2.0)]:
        out = aggregate_on_attributes(df, fn, attributes=["env"]).collect()
        got = {(r.labels["env"], r.ts): float(r.value) for r in out}
        assert got[("prod", 10)] == want, fn
    with pytest.raises(ValueError, match="invalid aggregation function"):
        aggregate_on_attributes(df, "p99")


def test_aggregate_on_attributes_empty_list_drops_all(spark):
    # FilterAttrs with [] clears every attribute (aggregate.go:41-49)
    out = aggregate_on_attributes(_num_dps(spark), "sum", attributes=[]).collect()
    got = {r.ts: r.value for r in out}
    assert got == {10: 9.0, 20: 7.0}
    assert all(r.labels == {} for r in out)


def test_aggregate_int_median_matches_go_semantics(spark):
    # even group: (lo+hi)/2 with int64 truncation toward zero
    df = spark.createDataFrame(
        [Row(labels={"k": "x"}, value=v, ts=1) for v in [-1, -2, 5, 7]],
        "labels map<string,string>, value bigint, ts bigint",
    )
    out = aggregate_on_attributes(df, "median").collect()[0]
    assert out.value == 2  # sorted [-2,-1,5,7] -> (-1+5)/2 = 2
    df2 = spark.createDataFrame(
        [Row(labels={"k": "x"}, value=v, ts=1) for v in [-1, -2, -5, -8]],
        "labels map<string,string>, value bigint, ts bigint",
    )
    out2 = aggregate_on_attributes(df2, "median").collect()[0]
    assert out2.value == -3  # (-5 + -2)/2 = -3.5 -> Go truncates to -3


def test_aggregate_on_attribute_value(spark):
    # func_agregate_on_attribute_value_metrics_test.go shape: host a/b -> merged
    out = aggregate_on_attribute_value(
        _num_dps(spark), "sum", attribute="host", values=["a", "b"], new_value="any"
    ).collect()
    got = {(r.labels["env"], r.labels["host"], r.ts): r.value for r in out}
    assert got == {
        ("prod", "any", 10): 4.0,
        ("dev", "any", 10): 5.0,
        ("prod", "any", 20): 7.0,
    }
