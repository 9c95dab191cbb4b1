"""Exporter wire-format renders (operators/render.py) against the
reference's own golden strings: rfc5424_formatter_test.go:21-56 and
rfc3164_formatter_test.go:17-53 expectations verbatim, plus escape-chain
robustness for the JSON renders."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.render import (
    render_es_bulk,
    render_prometheus_text,
    render_splunk_hec,
    render_syslog_rfc3164,
    render_syslog_rfc5424,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _one(df, col):
    return df.select(col).first()[0]


def test_rfc5424_golden_full_fields(spark):
    # rfc5424_formatter_test.go:21-36
    expected = (
        "<165>1 2003-08-24T05:14:15.000003Z 192.0.2.1 myproc 8710 - -"
        " It's time to make the do-nuts.\n"
    )
    df = spark.createDataFrame([(_ts("2003-08-24T05:14:15.000003"),)], "ts timestamp")
    out = render_syslog_rfc5424(
        df,
        hostname=F.lit("192.0.2.1"),
        appname=F.lit("myproc"),
        proc_id=F.lit("8710"),
        message=F.lit("It's time to make the do-nuts."),
    )
    assert _one(out, "syslog_line") == expected
    framed = render_syslog_rfc5424(
        df,
        hostname=F.lit("192.0.2.1"),
        appname=F.lit("myproc"),
        proc_id=F.lit("8710"),
        message=F.lit("It's time to make the do-nuts."),
        octet_counting=True,
    )
    assert _one(framed, "syslog_line") == f"{len(expected)} {expected}"


def test_rfc5424_golden_millis_trim_and_msgid(spark):
    # rfc5424_formatter_test.go:38-52 — .003000 microseconds render as .003
    expected = (
        "<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog 111 ID47 -"
        " BOMAn application event log entry...\n"
    )
    df = spark.createDataFrame([(_ts("2003-10-11T22:14:15.003000"),)], "ts timestamp")
    out = render_syslog_rfc5424(
        df,
        hostname=F.lit("mymachine.example.com"),
        appname=F.lit("evntslog"),
        proc_id=F.lit("111"),
        msg_id=F.lit("ID47"),
        message=F.lit("BOMAn application event log entry..."),
    )
    assert _one(out, "syslog_line") == expected


def test_rfc5424_all_defaults_empty_message(spark):
    # sender.go:19-41 defaults; formatMessage: empty message adds no space
    df = spark.createDataFrame([(_ts("2003-08-24T05:14:15"),)], "ts timestamp")
    out = render_syslog_rfc5424(df)
    assert _one(out, "syslog_line") == "<165>1 2003-08-24T05:14:15Z - - - - -\n"


def test_rfc3164_golden(spark):
    # rfc3164_formatter_test.go:17-30
    df = spark.createDataFrame([(_ts("2003-08-24T05:14:15.000003"),)], "ts timestamp")
    out = render_syslog_rfc3164(
        df,
        priority=F.lit("34"),
        hostname=F.lit("mymachine"),
        appname=F.lit("su"),
        message=F.lit("'su root' failed for lonvick on /dev/pts/8"),
    )
    assert (
        _one(out, "syslog_line")
        == "<34>Aug 24 05:14:15 mymachine su: 'su root' failed for lonvick on /dev/pts/8\n"
    )


def test_rfc3164_defaults_and_space_padded_day(spark):
    # rfc3164_formatter_test.go:32-41 (defaults) and :43-53 (Sep  3 pad)
    df = spark.createDataFrame([(_ts("2003-08-24T05:14:15.000003"),)], "ts timestamp")
    out = render_syslog_rfc3164(df, message=F.lit("-"))
    assert _one(out, "syslog_line") == "<165>Aug 24 05:14:15 - -\n"

    df = spark.createDataFrame([(_ts("2024-09-03T23:12:35"),)], "ts timestamp")
    out = render_syslog_rfc3164(
        df,
        priority=F.lit("34"),
        hostname=F.lit("myhost"),
        appname=F.lit("app"),
        message=F.lit("test message"),
    )
    assert _one(out, "syslog_line") == "<34>Sep  3 23:12:35 myhost app: test message\n"


def test_prometheus_render_shapes(spark):
    df = spark.createDataFrame(
        [("http_total", "code=200,method=get", "42"), ("up", None, "1")],
        "name string, labels string, v string",
    )
    out = render_prometheus_text(df, "name", "labels", "v").collect()
    lines = {r["name"]: r["prom_line"] for r in out}
    assert lines["http_total"] == 'http_total{code="200",method="get"} 42'
    assert lines["up"] == "up 1"  # no labels -> no braces


def test_es_bulk_escapes_and_null_fields(spark):
    df = spark.createDataFrame(
        [(1, 'say "hi"\tnow\nback\\slash', None)], "doc_id bigint, txt string, missing string"
    )
    out = render_es_bulk(
        df,
        index=F.lit("idx"),
        doc_id=F.col("doc_id").cast("string"),
        doc_fields={"txt": (F.col("txt"), True), "m": (F.col("missing"), True),
                    "n": (F.lit(7).cast("string"), False)},
    )
    row = out.first()
    assert row["es_action"] == '{"create":{"_index":"idx","_id":"1"}}'
    # both lines must be VALID json that round-trips the raw value
    doc = json.loads(row["es_doc"])
    assert doc == {"txt": 'say "hi"\tnow\nback\\slash', "m": None, "n": 7}


def test_splunk_hec_time_and_optional_index(spark):
    df = spark.createDataFrame(
        [(_ts("2020-01-02T03:04:05.678901"), 'msg "q"', "main"),
         (_ts("2020-01-02T03:04:05"), "plain", None)],
        "ts timestamp, body string, idx string",
    )
    rows = render_splunk_hec(
        df, ts="ts", host=F.lit("h1"), source=F.lit("src"),
        sourcetype=F.lit("st"), index="idx", event="body",
    ).collect()
    ev = {json.loads(r["hec_event"])["event"]: json.loads(r["hec_event"]) for r in rows}
    assert ev['msg "q"']["time"] == 1577934245.678  # truncated to millis
    assert ev['msg "q"']["index"] == "main"
    assert ev["plain"]["time"] == 1577934245.0
    assert "index" not in ev["plain"]  # NULL index omitted entirely
    assert ev["plain"]["host"] == "h1" and ev["plain"]["sourcetype"] == "st"
    # the rendered time field is a fixed 3-decimal literal, not a float repr
    raw = [r["hec_event"] for r in rows if '"event":"plain"' in r["hec_event"]][0]
    assert raw.startswith('{"time":1577934245.000,')


def test_influx_render_no_ts_and_parse(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_influx_line
    from opentelemetry_collector_contrib_spark.operators.render import render_influx_line

    df = spark.createDataFrame([(1,)], "id long")
    rendered = render_influx_line(
        df, F.lit("m1"), tags=[("b", F.lit("x")), ("a", F.lit("y"))],
        fields=[("f", F.lit(42))],
    )
    row = rendered.collect()[0]
    assert row["body"] == "m1,b=x,a=y f=42"  # tags render in caller order
    out = parse_influx_line(rendered, "body").collect()[0]
    assert out["il_measurement"] == "m1"
    assert out["il_tags_csv"] == "a=y,b=x"  # parser sorts
    assert out["il_ts"] is None  # no timestamp slot


def test_zipkin_render_escapes(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import zipkin_json_spans
    from opentelemetry_collector_contrib_spark.operators.render import render_zipkin_json

    df = spark.createDataFrame([(1,)], "id long")
    rendered = render_zipkin_json(
        df,
        trace_id=F.lit("a" * 32), span_id=F.lit("b" * 16), parent_id=None,
        name=F.lit('GET "/x"\nnext'), kind=F.lit("SERVER"),
        ts_us=F.lit(1577934245678901), duration_us=F.lit(12),
        service_name=F.lit("svc"), tags=[("k", F.lit("v,=1"))],
    )
    out = zipkin_json_spans(rendered, "body").collect()[0]
    assert out["span_name"] == 'GET "/x"\nnext'  # JSON escape survives
    assert out["parent_span_id"] is None
    assert out["ts_us"] == 1577934245678901
    assert out["tags_csv"] == "k=v,=1"


def test_emf_parse_drops_directiveless_and_resolves_dims(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_emf
    from opentelemetry_collector_contrib_spark.operators.render import render_emf

    df = spark.createDataFrame([(7,)], "id long")
    rendered = render_emf(
        df, namespace="NS",
        dimensions=[("Service", F.lit("api"))],
        metrics=[("Lat", "Milliseconds", F.lit(1.5)), ("N", "Count", F.lit(3.0))],
        ts_ms=F.lit(1668387032641),
    )
    rows = parse_emf(rendered, "body").orderBy("emf_metric").collect()
    assert [r["emf_metric"] for r in rows] == ["Lat", "N"]
    assert rows[0]["emf_value"] == 1.5 and rows[1]["emf_value"] == 3.0
    assert rows[0]["emf_dims_csv"] == "Service=api"
    assert rows[0]["emf_ts_ms"] == 1668387032641
    # a plain structured log without the _aws directive emits nothing
    plain = spark.createDataFrame([('{"Version":"1","x":2}',)], "body string")
    assert parse_emf(plain, "body").count() == 0


def test_wavefront_parse_edges(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_wavefront

    rows = [
        ('"cpu load" 1.5 source=h1 env="us west"',),      # quoted name + quoted tag value
        ("mem 42 1577836800 source=h2",),                  # int value + ts, single tag
        ('disk 1 source=h3 note="a\\"b"',),                # escaped quote in tag value
        ("net 1 1577836800",),                             # ts, no tags (legal)
        ("bad 1 noequalsign",),                            # 3rd token neither ts nor tag
        ("short 1",),                                      # only two parts
        ("poison 1 source=h4 brokentag",),                 # one malformed tag poisons all
        ('nl 2 k="line1\\nline2"',),                       # \n escape decodes to newline
    ]
    df = spark.createDataFrame(rows, "body string")
    out = {r["body"]: r for r in parse_wavefront(df).collect()}
    r = out['"cpu load" 1.5 source=h1 env="us west"']
    assert r["wf_name"] == "cpu load" and r["wf_value"] == 1.5 and not r["wf_is_int"]
    assert r["wf_ts_s"] is None and r["wf_tags_csv"] == "env=us west,source=h1"
    r = out["mem 42 1577836800 source=h2"]
    assert r["wf_is_int"] and r["wf_ts_s"] == 1577836800 and r["wf_tags_csv"] == "source=h2"
    assert out['disk 1 source=h3 note="a\\"b"']["wf_tags_csv"] == 'note=a"b,source=h3'
    r = out["net 1 1577836800"]
    assert r["wf_name"] == "net" and r["wf_tags_csv"] is None
    for bad in ("bad 1 noequalsign", "short 1", "poison 1 source=h4 brokentag"):
        assert out[bad]["wf_name"] is None, bad
    assert out['nl 2 k="line1\\nline2"']["wf_tags_csv"] == "k=line1\nline2"


def test_wavefront_render_roundtrip_mixed_ts(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_wavefront
    from opentelemetry_collector_contrib_spark.operators.render import render_wavefront

    df = spark.createDataFrame([(1, 10), (2, None)], "id long, t int")
    rendered = render_wavefront(
        df, F.lit("m"), value=F.lit(7), ts_s=F.col("t"),
        tags=[("source", F.lit("s"))],
    )
    got = {r["id"]: r["body"] for r in rendered.collect()}
    assert got[1] == "m 7 10 source=s" and got[2] == "m 7 source=s"
    parsed = {r["id"]: r for r in parse_wavefront(rendered).collect()}
    assert parsed[1]["wf_ts_s"] == 10 and parsed[2]["wf_ts_s"] is None
    assert parsed[2]["wf_tags_csv"] == "source=s"


def test_libhoney_eventtime_ladder_and_defaults(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_libhoney

    batches = [
        ('[{"time":"1700000000123","data":{"k":"v"}},'
         '{"time":"1700000000.25","samplerate":4,"data":{"service.name":"api"}}]',),
        ('[{"time":"2023-11-14T22:13:20.123456Z","samplerate":2,"data":{}}]',),
    ]
    df = spark.createDataFrame(batches, "body string")
    rows = parse_libhoney(df, dataset="ds").orderBy("lh_ts_us").collect()
    # 13-digit epoch = milliseconds (exact integer path)
    assert rows[0]["lh_ts_us"] == 1700000000123000
    assert rows[0]["lh_samplerate"] == 1           # default when absent
    assert rows[0]["lh_service"] == "ds"           # dataset fallback
    assert rows[0]["lh_data_csv"] == "k=v"
    # RFC3339 with micros
    assert rows[1]["lh_ts_us"] == 1700000000123456 and rows[1]["lh_samplerate"] == 2
    # float seconds floor to micros
    assert rows[2]["lh_ts_us"] == 1700000000250000
    assert rows[2]["lh_samplerate"] == 4 and rows[2]["lh_service"] == "api"
    assert rows[2]["lh_data_csv"] is None          # service.name is a used field


def test_xray_segment_parse_edges(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_xray_segment

    rows = [
        # well-formed, no subsegments, no annotations
        ('{"trace_id":"1-5f84c7a1-e7d1852db8c4fd35d88bf49a","id":"00f067aa0ba902b7",'
         '"name":"web","start_time":1.5e9,"end_time":1.5000001e9}',),
        # malformed trace id (too short) -> xr_trace_id NULL, row still emitted
        ('{"trace_id":"1-abc-def","id":"00f067aa0ba902b8","name":"x",'
         '"start_time":1,"end_time":2,"error":true}',),
        # not a segment at all -> dropped
        ("[1,2,3]",),
    ]
    df = spark.createDataFrame(rows, "body string")
    out = parse_xray_segment(df).orderBy("xr_id").collect()
    assert len(out) == 2
    a, b = out
    assert a["xr_trace_id"] == "5f84c7a1e7d1852db8c4fd35d88bf49a"
    assert a["xr_start_us"] == 1_500_000_000_000_000 and not a["xr_error"]
    assert a["xr_annotations_csv"] is None and not a["xr_is_subsegment"]
    assert b["xr_trace_id"] is None and b["xr_error"] and not b["xr_fault"]


def test_faro_parse_kind_semantics(spark):
    from opentelemetry_collector_contrib_spark.operators.faro import parse_faro

    payload = (
        '{"logs":[{"timestamp":"2024-01-01T00:00:00.000Z","message":"m",'
        '"level":"","context":{"b":"2","a":"1"}}],'
        '"exceptions":[{"timestamp":"t","type":"Error","value":"boom"}],'
        '"measurements":[{"timestamp":"t","type":"cls","values":{"cls":0.25}}],'
        '"events":[{"timestamp":"t","name":"nav","domain":"browser",'
        '"attributes":{"to":"/x"}}],'
        '"meta":{"app":{"name":"a1","version":"1.2","environment":"prod"},'
        '"session":{"id":"sess"},"user":{"id":"u9"}}}'
    )
    df = spark.createDataFrame([(payload,)], "body string")
    rows = {r["fr_kind"]: r for r in parse_faro(df).collect()}
    assert set(rows) == {"log", "exception", "measurement", "event"}
    assert rows["log"]["fr_level"] == "info"          # empty level -> default
    assert rows["log"]["fr_kv_csv"] == "context_a=1,context_b=2"
    assert rows["exception"]["fr_message"] == "Error: boom"
    assert rows["exception"]["fr_level"] == "error"
    assert rows["measurement"]["fr_kv_csv"] == "value_cls=0.250000"  # %f form
    assert rows["event"]["fr_event_name"] == "nav"
    assert rows["event"]["fr_kv_csv"] == "event_data_to=/x"
    assert all(r["fr_app_name"] == "a1" and r["fr_session_id"] == "sess" for r in rows.values())
    # payloads with no parseable envelope drop
    assert parse_faro(spark.createDataFrame([("]",)], "body string")).count() == 0


def test_cloudflare_ndjson_formats_and_mapping(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_cloudflare

    body = (
        '{"ZoneName":"z.com","EdgeStartTimestamp":1700000000,"EdgeResponseStatus":200,"X":"1"}\n'
        '{"EdgeStartTimestamp":1700000001,"EdgeResponseStatus":650}\n'
        "\n"
        "not json\n"
    )
    df = spark.createDataFrame([(body,)], "body string")
    rows = parse_cloudflare(df, timestamp_format="unix").orderBy("cf_ts_us").collect()
    assert len(rows) == 2
    a, b = rows
    assert a["cf_zone"] == "z.com" and a["cf_ts_us"] == 1700000000000000
    assert a["cf_severity_text"] == "Info" and a["cf_severity_num"] == 9
    # all fields pass through when no mapping is configured
    assert "X=1" in a["cf_attrs_csv"] and "ZoneName=z.com" in a["cf_attrs_csv"]
    # status >= 600 -> unspecified severity (logs.go:443-445)
    assert b["cf_zone"] is None and b["cf_severity_num"] is None

    nano = spark.createDataFrame(
        [('{"EdgeStartTimestamp":1700000000123456789}',)], "body string"
    )
    r = parse_cloudflare(nano, timestamp_format="unixnano").collect()[0]
    assert r["cf_ts_us"] == 1700000000123456


def test_alertmanager_sanitize_and_splits(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_alertmanager
    from opentelemetry_collector_contrib_spark.operators.render import (
        _am_sanitize,
        render_alertmanager,
    )

    # sanitizeLabelName (alertmanager_exporter.go:57-70)
    assert _am_sanitize("service.tier") == "service_tier"
    assert _am_sanitize("0rate") == "_0rate"
    assert _am_sanitize("a-b c9") == "a_b_c9"

    df = spark.createDataFrame([(1,)], "id long")
    rendered = render_alertmanager(
        df,
        starts_at=F.lit("2024-01-01 00:00:00").cast("timestamp"),
        severity=F.lit("warning"),
        event_name=F.lit("exception"),
        labels=[("k8s.pod", F.lit("p1")), ("drop", F.lit(None).cast("string"))],
        body=F.lit("boom"),
        trace_id=F.lit(None).cast("string"),  # empty trace id -> omitted
    )
    row = parse_alertmanager(rendered, "body").collect()[0]
    assert row["am_severity"] == "warning" and row["am_event_name"] == "exception"
    assert row["am_labels_csv"] == "k8s_pod=p1"  # NULL-valued label dropped
    assert row["am_body"] == "boom" and row["am_trace_id"] is None
    assert row["am_annotations_csv"] is None
    assert row["am_starts_at"] == "2024-01-01T00:00:00.000Z"


def test_azure_level_number_and_time_fallback(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import (
        parse_azure_resource_logs,
    )

    body = (
        '{"records":['
        '{"timeStamp":"2024-01-01T00:00:00Z","category":"c1","operationName":"op",'
        '"level":2.0,"durationMs":"not-a-number","correlationId":""},'
        '{"time":"2024-01-01T00:00:01Z","category":"c2","operationName":"op2",'
        '"level":"Verbose"},'
        '{"category":"dropped-no-timestamp","operationName":"op3"}'
        "]}"
    )
    df = spark.createDataFrame([(body,)], "body string")
    rows = parse_azure_resource_logs(df).orderBy("az_ts_us").collect()
    assert len(rows) == 2  # missing both time fields -> errMissingTimestamp drop
    a, b = rows
    # timeStamp fallback + numeric level: severity = number, text = raw token
    assert a["az_ts_us"] == 1704067200000000 and a["az_severity_num"] == 2
    assert a["az_severity_text"] == "2.0"
    assert a["az_duration_ms"] is None and a["az_correlation_id"] is None
    # unknown level name -> unspecified severity, text preserved
    assert b["az_severity_num"] is None and b["az_severity_text"] == "Verbose"


def test_datadog_series_skips_and_rate_scaling(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import (
        parse_datadog_series_v1,
    )

    body = (
        '{"series":['
        '{"metric":"m1","type":"rate","interval":20,"points":[[1700000000,2.5],[1700000010]]},'
        '{"metric":"m2","points":[[1700000000,1.0]]},'
        '{"metric":"m3","type":"count","host":"h","tags":["a:1","u:x:y"],'
        '"points":[[1700000000,3.0]]}'
        "]}"
    )
    df = spark.createDataFrame([(body,)], "body string")
    rows = parse_datadog_series_v1(df).orderBy("dd_metric").collect()
    # m2 (no type) dropped entirely; m1's 1-element point dropped
    assert [r["dd_metric"] for r in rows] == ["m1", "m3"]
    assert rows[0]["dd_value"] == 50.0            # 2.5 * interval 20
    assert rows[0]["dd_otel_type"] == "sum_delta"
    assert rows[1]["dd_tags_csv"] == "a=1,u=x:y"  # first-colon split only
    assert rows[1]["dd_host"] == "h"


def test_expvar_circular_pause_buffer(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_expvar

    pause = [0] * 256
    pause[(300 + 255) % 256] = 777  # NumGC=300 wraps the ring
    body = (
        '{"memstats":{"TotalAlloc":10,"NumGC":300,"GCCPUFraction":0.125,'
        f'"PauseNs":{pause}}}}}'
    )
    df = spark.createDataFrame([(body,), ("{}",)], "body string")
    out = {r["ev_metric"]: r["ev_value"] for r in parse_expvar(df).collect()}
    assert out["process.runtime.memstats.total_alloc"] == 10.0
    assert out["process.runtime.memstats.num_gc"] == 300.0
    assert out["process.runtime.memstats.gc_cpu_fraction"] == 0.125
    assert out["process.runtime.memstats.last_pause"] == 777.0
    # a body without memstats contributes no rows (scraper errors)
    assert parse_expvar(df).count() == 26


def test_mezmo_defaults_and_meta_folding(spark):
    from opentelemetry_collector_contrib_spark.operators.parse import parse_mezmo
    from opentelemetry_collector_contrib_spark.operators.render import render_mezmo

    df = spark.createDataFrame([(1,)], "id long")
    rendered = render_mezmo(
        df, ts_ms=F.lit(1700000000123), line=F.lit("x" * 20000),  # over 16 KiB
        level=F.lit(""), hostname=F.lit("hostA"),
    )
    row = parse_mezmo(rendered, "body").collect()[0]
    assert row["mz_level"] == "info"                # empty -> default
    assert len(row["mz_line"]) == 16 * 1024         # maxMessageSize truncation
    assert row["mz_app"] is None and row["mz_hostname"] == "hostA"
    assert row["mz_meta_csv"] is None and row["mz_ts_ms"] == 1700000000123


def test_honeycomb_markers_ottl_gating(spark):
    from opentelemetry_collector_contrib_spark.operators.render import honeycomb_markers

    df = spark.createDataFrame(
        [(1, "err", "u"), (2, "ok", "v")], "id long, kind string, url string"
    )
    out = honeycomb_markers(
        df,
        markers=[
            {"type": "alert", "condition": 'attributes["kind"] == "err"',
             "message_col": "kind", "url_col": "url"},
            {"type": "all", "condition": "true", "dataset": "d1"},
        ],
    ).collect()
    by = {(r["id"], r["hm_type"]): r for r in out}
    assert set(by) == {(1, "alert"), (1, "all"), (2, "all")}
    assert by[(1, "alert")]["hm_body"] == '{"message":"err","type":"alert","url":"u"}'
    assert by[(2, "all")]["hm_dataset"] == "d1" and by[(2, "all")]["hm_body"] == '{"type":"all"}'
