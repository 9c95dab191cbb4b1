"""datadogconnector analogue: sketch math, top-level detection, bucket
stats — plus the haproxyreceiver round trip and the remotetap budget."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.apm_stats import (
    apm_stats,
    mark_top_level,
    sketch_bucket,
    sketch_rep,
)


def test_sketch_monotone_and_bounded(spark):
    vals = list(range(1, 300)) + [2**k + d for k in range(3, 40) for d in (-1, 0, 1)]
    df = spark.createDataFrame([(v,) for v in sorted(set(vals))], "d long")
    rows = (
        df.select("d", sketch_bucket(F.col("d")).alias("idx"))
        .withColumn("rep", sketch_rep(F.col("idx")))
        .orderBy("d")
        .collect()
    )
    prev = -1
    for r in rows:
        assert r["idx"] >= prev
        prev = r["idx"]
        # log-linear bucket with 4 sub-buckets/octave: midpoint within 12.5%
        assert abs(r["rep"] - r["d"]) <= max(1, r["d"] / 8)


def _spans(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # trace A: root (frontend), same-service child, cross-service child
        ("A", "s1", None, "frontend", "GET /", "server", 200, False, t0, 1000),
        ("A", "s2", "s1", "frontend", "render", "internal", 200, False, t0, 500),
        ("A", "s3", "s1", "payments", "charge", "client", 200, False, t0, 800),
        # trace B: root errors; orphan parent pointer is top-level
        ("B", "s1", None, "backend", "job", "internal", 500, True, t0, 2000),
        ("B", "s9", "sX", "backend", "job", "internal", 200, False, t0, 300),
    ]
    return spark.createDataFrame(
        rows,
        "trace_id string, span_id string, parent_span_id string, service string,"
        "resource string, kind string, status_code int, is_error boolean,"
        "end_ts timestamp, duration_ns long",
    ).withColumn("env", F.lit("prod"))


def test_mark_top_level_rules(spark):
    got = {
        (r["trace_id"], r["span_id"]): r["is_top_level"]
        for r in mark_top_level(_spans(spark)).collect()
    }
    assert got[("A", "s1")] is True  # no parent
    assert got[("A", "s2")] is False  # same-service parent
    assert got[("A", "s3")] is True  # parent on another service
    assert got[("B", "s9")] is True  # parent span absent from trace


def test_apm_stats_counts_and_quantiles(spark):
    marked = mark_top_level(_spans(spark))
    out = apm_stats(marked, bucket_s=10, compute_stats_by_span_kind=False)
    by_key = {(r["service"], r["resource"], r["status_code"]): r for r in out.collect()}
    err = by_key[("backend", "job", 500)]
    assert err["hits"] == 1 and err["errors"] == 1 and err["duration_ns"] == 2000
    assert err["ok_p50_ns"] is None  # no ok spans in the error-status group
    ok = by_key[("backend", "job", 200)]
    assert ok["hits"] == 1 and ok["errors"] == 0 and ok["duration_ns"] == 300
    # single ok span of 300 ns: every quantile is its bucket midpoint
    assert ok["ok_p50_ns"] == ok["ok_p99_ns"]
    assert abs(ok["ok_p50_ns"] - 300) <= 300 / 8
    # s2 (not top-level, kind internal) must not contribute without the flag
    assert ("frontend", "render", 200) not in by_key
    widened = apm_stats(marked, bucket_s=10, compute_stats_by_span_kind=True)
    assert ("frontend", "render") not in {
        (r["service"], r["resource"]) for r in widened.collect()
    }  # 'internal' is still not an eligible kind


def test_apm_stats_kind_widening(spark):
    spans = _spans(spark).withColumn(
        "kind", F.when(F.col("span_id") == "s2", "client").otherwise(F.col("kind"))
    )
    out = apm_stats(
        mark_top_level(spans), bucket_s=10, compute_stats_by_span_kind=True
    )
    keys = {(r["service"], r["resource"]) for r in out.collect()}
    assert ("frontend", "render") in keys


def test_haproxy_roundtrip_nulls(spark):
    from opentelemetry_collector_contrib_spark.operators.haproxy import (
        parse_haproxy_stats,
        render_haproxy_stat,
    )

    df = spark.createDataFrame([(1,)], "id long")
    rendered = render_haproxy_stat(
        df,
        {
            "pxname": F.lit("web"),
            "svname": F.lit("FRONTEND"),
            "status": F.lit("OPEN"),
            "scur": F.lit(7),
            "conn_tot": F.lit(1234),
        },
    )
    row = parse_haproxy_stats(rendered, "body").collect()[0]
    assert row["hap_pxname"] == "web" and row["hap_scur"] == 7
    assert row["hap_conn_tot"] == 1234
    assert row["hap_act"] is None and row["hap_lbtot"] is None
    # a fed-through header line parses to NULLs, not an error
    hdr = spark.createDataFrame(
        [("# pxname,svname,qcur",)], "body string"
    )
    out = parse_haproxy_stats(hdr, "body").collect()[0]
    assert out["hap_pxname"] == "# pxname"  # callers drop via the real header row shape
    assert out["hap_scur"] is None


def test_remote_tap_budget(spark):
    from opentelemetry_collector_contrib_spark.operators.filter import remote_tap

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(seconds=i // 10)) for i in range(40)
    ]  # 10 rows in each of 4 seconds
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = remote_tap(df, 3, order_cols=("id",)).collect()
    assert len(out) == 12
    ids = sorted(r["id"] for r in out)
    assert ids[:3] == [0, 1, 2]  # first rows of the first second, stable order
    with pytest.raises(ValueError):
        remote_tap(df, 0)
