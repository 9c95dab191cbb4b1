"""webhook / osquery / macOS unified-logging ingest mappings vs the
reference components (req_to_log.go, osquery.go, receiver_darwin.go)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.event_ingest import (
    macos_log_lines,
    osquery_logs,
    webhook_events,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_webhook_json_boundary_split_preserves_raw_text(spark):
    body = '{"a":1, "nested":{"x":[1,2]}}\n  {"b":"two"}["arr",3] trailing-garbage'
    df = _df(spark, [(body,)], "body string")
    rows = webhook_events(df, "body", split="json").collect()
    # three top-level JSON values with their original text; the trailing
    # garbage stops the scan (decoder.Decode error -> break)
    assert [r["wh_body"] for r in rows] == [
        '{"a":1, "nested":{"x":[1,2]}}', '{"b":"two"}', '["arr",3]',
    ]
    # nothing decodable -> raw body passes through
    rows = webhook_events(_df(spark, [("not json",)], "body string"), "body", split="json").collect()
    assert [r["wh_body"] for r in rows] == ["not json"]


def test_webhook_newline_and_none_modes(spark):
    df = _df(spark, [("l1\nl2\nl3",)], "body string")
    assert [r["wh_body"] for r in webhook_events(df, "body", split="newline").collect()] == [
        "l1", "l2", "l3",
    ]
    assert [r["wh_body"] for r in webhook_events(df, "body", split="none").collect()] == [
        "l1\nl2\nl3",
    ]


def test_webhook_header_regex_and_query_params(spark):
    df = spark.range(1).select(
        F.lit("x").alias("body"),
        F.create_map(
            F.lit("X-Keep"), F.array(F.lit("a"), F.lit("b")),
            F.lit("Authorization"), F.array(F.lit("secret")),
        ).alias("headers"),
        F.create_map(
            F.lit("src"), F.lit("gh"), F.lit("empty"), F.lit("")
        ).alias("query"),
    )
    r, = webhook_events(
        df, "body", headers="headers", query="query",
        split="none", include_headers_regex="^X-",
    ).collect()
    assert r["wh_headers_csv"] == "header.X-Keep=[a|b]"  # Authorization filtered
    assert r["wh_resource_csv"] == "src=gh"  # empty value skipped


def test_osquery_rows_to_records_and_malformed(spark):
    df = _df(
        spark,
        [
            ("select 1", '[{"pid":"7","name":"sh"},{"pid":"8","name":"zsh"}]'),
            ("select 2", "[]"),
            ("select 3", "not-json"),
        ],
        "query string, rows_json string",
    )
    rows = osquery_logs(df, "query", "rows_json").orderBy("os_attrs_csv").collect()
    assert len(rows) == 2  # empty + malformed emit nothing
    assert rows[0]["os_body"] == "select 1"
    assert rows[0]["os_attrs_csv"] == "name=sh,pid=7"
    assert rows[1]["os_attrs_csv"] == "name=zsh,pid=8"


def test_macos_severity_completion_and_timestamp(spark):
    lines = [
        '{"timestamp":"2023-10-12 08:15:23.123456-0700","messageType":"Fault","eventMessage":"m"}',
        '{"timestamp":"bad","messageType":"Mystery"}',
        '{"count":540659,"finished":1}',
        "** log archive scan complete **",
        "",
    ]
    df = _df(spark, [(ln,) for ln in lines], "line string")
    rows = macos_log_lines(df, "line", fmt="ndjson").collect()
    assert len(rows) == 2  # completion trailer, banner, blank all drop
    r = rows[0]
    assert (r["ml_severity_text"], r["ml_severity_num"]) == ("Fault", 21)
    # -0700 offset: 08:15:23.123456 local = 15:15:23.123456 UTC
    assert r["ml_ts_us"] == 1697123723_123456
    r = rows[1]
    assert r["ml_ts_us"] is None and r["ml_severity_num"] == 0
    # non-JSON styles: body-only records
    r, = macos_log_lines(
        _df(spark, [("plain syslog line",)], "line string"), "line", fmt="syslog"
    ).collect()
    assert r["ml_body"] == "plain syslog line" and r["ml_severity_text"] is None


def test_webhook_header_regex_with_backslash_class_and_quote(spark):
    # regression: the pattern must survive backslash classes and quotes
    # (a SQL-spliced expr would collapse \d or break on the apostrophe)
    df = spark.range(1).select(
        F.lit("x").alias("body"),
        F.create_map(
            F.lit("X-Req-7"), F.array(F.lit("a")),
            F.lit("X-Req-d"), F.array(F.lit("b")),
            F.lit("X-O'Brien"), F.array(F.lit("c")),
        ).alias("headers"),
    )
    r, = webhook_events(
        df, "body", headers="headers", split="none",
        include_headers_regex=r"^X-Req-\d+$",
    ).collect()
    assert r["wh_headers_csv"] == "header.X-Req-7=[a]"
    r, = webhook_events(
        df, "body", headers="headers", split="none",
        include_headers_regex=r"^X-O'",
    ).collect()
    assert r["wh_headers_csv"] == "header.X-O'Brien=[c]"
