"""statsdreceiver flush aggregation vs the reference semantics
(internal/parser/statsd_parser.go Aggregate + metric_translator.go, incl.
the summary-quantile vectors from metric_translator_test.go:255-286)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.aggregate import statsd_aggregate


def _run(spark, lines, **kw):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)], "pos bigint, body string")
    return statsd_aggregate(df, "body", order_col="pos", **kw).collect()


def _one(rows, kind):
    picked = [r for r in rows if r.kind == kind]
    assert len(picked) == 1, rows
    return picked[0]


def test_counter_sample_rate_scaling(spark):
    rows = _run(spark, ["hits:2|c", "hits:3|c|@0.5", "hits:1|c|@0.25"])
    assert _one(rows, "counter").value == 2 + 6 + 4


def test_counter_int_type_truncates_each_increment(spark):
    # aggregateCounterValue int path: int64(v/rate) per sample then add
    rows = _run(spark, ["hits:1|c|@0.3", "hits:1|c|@0.3"], counter_type="int")
    assert _one(rows, "counter").value == 6.0  # int(3.333)=3, twice
    dbl = _run(spark, ["hits:1|c|@0.3", "hits:1|c|@0.3"])
    assert _one(dbl, "counter").value == pytest.approx(2 / 0.3)


def test_gauge_reset_and_relative_moves(spark):
    # unsigned value resets; +/- are relative (statsd_parser.go:376-385,489)
    rows = _run(spark, ["g1:5|g", "g1:+3|g", "g1:-2|g"])
    assert _one(rows, "gauge").value == 6.0
    rows2 = _run(spark, ["g1:+5|g", "g1:-1|g"])  # no reset ever seen
    assert _one(rows2, "gauge").value == 4.0
    rows3 = _run(spark, ["g1:+9|g", "g1:7|g", "g1:-2|g"])  # reset mid-stream
    assert _one(rows3, "gauge").value == 5.0


def test_gauge_rate_ignored(spark):
    # gaugeValue(): sampleRate has no effect (metric_translator.go:236-239)
    rows = _run(spark, ["g1:10|g|@0.5"])
    assert _one(rows, "gauge").value == 10.0


def test_summary_reference_vector(spark):
    # metric_translator_test.go:265-272 — points [1,2,3] weights [100,1,100]
    # via sample rates (1/0.01 is exactly 100.0 in IEEE)
    lines = ["t:1|ms|@0.01", "t:2|ms", "t:3|ms|@0.01"]
    rows = _run(spark, lines, percentiles=(0.0, 1.0, 49.0, 50.0, 51.0, 99.0, 100.0))
    s = _one(rows, "summary")
    assert s.s_count == 201
    assert s.s_sum == 402.0
    assert (s.q0, s.q1, s.q49, s.q50, s.q51, s.q99, s.q100) == (1, 1, 1, 2, 3, 3, 3)


def test_summary_exact_binary_weights(spark):
    # weights 1/2/4 via rates 1, 0.5, 0.25 — W=7, count=7, sum=1+4+12=17
    lines = ["t:1|ms", "t:2|ms|@0.5", "t:3|ms|@0.25"]
    rows = _run(spark, lines, percentiles=(50.0, 95.0))
    s = _one(rows, "summary")
    assert s.s_count == 7 and s.s_sum == 17.0
    # cum: 1(v1), 3(v2), 7(v3); 0.5*7=3.5 -> v3; 0.95*7=6.65 -> v3
    assert (s.q50, s.q95) == (3.0, 3.0)


def test_nan_inf_discarded_and_tag_grouping(spark):
    # 1e999 parses to +Inf and is discarded (:352-358); non-numeric never parses
    lines = ["x:1e999|c", "x:notanum|c", "x:5|c|#b:2,a:1", "x:7|c|#a:1,b:2", "x:1|c"]
    rows = _run(spark, lines)
    got = {(r.st_tags_csv, r.value) for r in rows if r.kind == "counter"}
    assert got == {("a:1,b:2", 12.0), (None, 1.0)}  # tags sorted; nan/inf dropped


def test_validation(spark):
    df = spark.createDataFrame([("x:1|c",)], "body string")
    with pytest.raises(ValueError, match="counter_type"):
        statsd_aggregate(df, "body", counter_type="float")
