"""plans/stanza_chain.py — the filelog receiver's `operators:` list as a
config-compiled DataFrame chain (validation table mirrors the stanza
unmarshal-by-type errors)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.stanza_chain import (
    apply_stanza_operators,
    validate_stanza_ops,
)


@pytest.fixture()
def logs(spark):
    return spark.createDataFrame(
        [
            ("a", "2024-03-01T10:00:00 [ERROR] auth: denied key=1"),
            ("b", "2024-03-01T10:00:01 [info] web: ok"),
            ("c", "not a log line"),
        ],
        "id string, text string",
    )


_RX = r"^(?P<log_ts>\S+) \[(?P<lvl>\w+)\] (?P<comp>\w+): (?P<msg>.*)$"


def test_chain_parse_send_keeps_nonmatching(logs):
    out = apply_stanza_operators(
        logs,
        [
            {"type": "regex_parser", "regex": _RX},
            {"type": "severity_parser", "parse_from": "lvl"},
            {"type": "time_parser", "parse_from": "log_ts", "layout": "%Y-%m-%dT%H:%M:%S"},
            {"type": "router", "routes": [{"expr": "severity_number >= 17", "output": "errors"}]},
        ],
    ).collect()
    rows = {r["id"]: r for r in out}
    assert len(rows) == 3  # send: the garbage row survives with NULLs
    assert rows["a"]["comp"] == "auth" and rows["a"]["severity_text"] == "ERROR"
    assert rows["a"]["route_id"] == "errors" and rows["b"]["route_id"] == "general"
    assert rows["b"]["severity_text"] == "INFO"  # case-insensitive alias
    assert rows["c"]["comp"] is None and rows["c"]["severity_number"] == 0
    assert rows["a"]["event_ts"] is not None and rows["c"]["event_ts"] is None


def test_chain_on_error_drop(logs):
    out = apply_stanza_operators(
        logs, [{"type": "regex_parser", "regex": _RX, "on_error": "drop"}]
    )
    assert out.count() == 2 and out.filter(F.col("comp").isNull()).count() == 0


def test_chain_field_ops_and_filter(logs):
    out = apply_stanza_operators(
        logs,
        [
            {"type": "regex_parser", "regex": _RX},
            {"type": "add", "field": "attributes.env", "value": "prod"},
            {"type": "copy", "from": "comp", "to": "component"},
            {"type": "move", "from": "msg", "to": "message"},
            {"type": "filter", "expr": "component = 'web'"},  # filter DROPS matches
            {"type": "retain", "fields": ["id", "env", "component", "message"]},
        ],
    )
    assert out.columns == ["id", "env", "component", "message"]
    got = {r["id"]: r for r in out.collect()}
    assert set(got) == {"a", "c"} and got["a"]["env"] == "prod"
    assert got["a"]["component"] == "auth" and got["a"]["message"] == "denied key=1"


def test_chain_kv_parser(spark):
    df = spark.createDataFrame([("k1=v1 k2=v2",)], "text string")
    out = apply_stanza_operators(df, [{"type": "key_value_parser"}]).collect()[0]
    assert out["kv"]["k1"] == "v1" and out["kv"]["k2"] == "v2"


@pytest.mark.parametrize(
    "ops,msg",
    [
        ([{"type": "nope"}], "unknown operator type"),
        ([{"type": "regex_parser"}], "needs `regex`"),
        ([{"type": "regex_parser", "regex": "^no groups$"}], "named capture group"),
        ([{"type": "regex_parser", "regex": "(?P<a>x", }], None),  # malformed -> re.error
        ([{"type": "regex_parser", "regex": "(?P<a>x)", "on_error": "boom"}], "send|drop"),
        ([{"type": "csv_parser"}], "needs `header`"),
        ([{"type": "time_parser"}], "needs `layout`"),
        ([{"type": "move", "from": "a"}], "needs `from` and `to`"),
        ([{"type": "router", "routes": []}], "non-empty"),
        ([{"type": "router", "routes": [{"expr": "x"}]}], "`expr` and `output`"),
    ],
)
def test_chain_validation_errors(ops, msg):
    with pytest.raises(Exception) as ei:
        validate_stanza_ops(ops)
    if msg:
        assert msg.replace("`", "") in str(ei.value).replace("`", "")


def test_yaml_filelog_operators_end_to_end(spark):
    """A collector YAML whose filelog receiver carries an operators: list
    builds a running pipeline with the chain as the parse stage."""
    from opentelemetry_collector_contrib_spark.fixtures import ensure_tier
    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        build_from_collector_yaml,
    )

    doc = """
receivers:
  filelog:
    include: [/var/log/app/*.log]
    operators:
      - type: regex_parser
        regex: '^(?P<log_ts>\\S+) \\[(?P<lvl>\\w+)\\] (?P<comp>\\w+): (?P<msg>.*)$'
        parse_from: body
      - type: severity_parser
        parse_from: lvl
service:
  pipelines:
    logs:
      receivers: [filelog]
"""
    df = build_from_collector_yaml(spark, doc, source_path=ensure_tier("t1"))
    assert {"comp", "msg", "severity_text", "severity_number"} <= set(df.columns)
    assert df.filter(df.severity_number >= 17).count() > 0


def test_yaml_logstransform_processor_ops(spark):
    """processor/logstransformprocessor: the same operators list as a
    processor; receiver ops run first, then these, in config order."""
    from opentelemetry_collector_contrib_spark.fixtures import ensure_tier
    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        build_from_collector_yaml,
        spec_from_collector_yaml,
    )

    doc = """
receivers:
  filelog:
    include: [/x]
    operators:
      - type: regex_parser
        regex: '^(?P<log_ts>\\S+) \\[(?P<lvl>\\w+)\\] (?P<comp>\\w+): (?P<msg>.*)$'
processors:
  logstransform:
    operators:
      - type: severity_parser
        parse_from: lvl
      - type: add
        field: attributes.stage
        value: post
"""
    spec = spec_from_collector_yaml(doc, source_path="/tmp/ignored")
    assert [o["type"] for o in spec["stanza_operators"]] == [
        "regex_parser", "severity_parser", "add",
    ]
    df = build_from_collector_yaml(spark, doc, source_path=ensure_tier("t1"))
    assert df.filter(df.stage != "post").count() == 0
    assert df.filter(df.severity_number >= 17).count() > 0


def test_chain_full_parser_transformer_coverage(spark):
    """Every remaining stanza parser/transformer type dispatches: syslog,
    uri, trace, jsonarray, scope, sanitize_utf8, unquote, assign_keys,
    regex_replace, noop, recombine."""
    df = spark.createDataFrame(
        [
            ("c1", 1, '<34>1 2024-01-01T00:00:00Z h app 1 mid - hello', '"q"', '["a","b"]', "https://x.io/p?k=v", "00-000102030405060708090a0b0c0d0e0f-0102030405060708-01"),
            ("c1", 2, '<34>1 2024-01-01T00:00:01Z h app 1 mid - world', '"r"', '["c","d"]', "http://y.io/", "00-000102030405060708090a0b0c0d0e0f-0102030405060709-00"),
        ],
        "conv string, i int, text string, quoted string, csvish string, url string, tp string",
    )
    out = apply_stanza_operators(
        df,
        [
            {"type": "noop"},
            {"type": "syslog_parser", "protocol": "rfc5424"},
            {"type": "uri_parser", "parse_from": "url"},
            {"type": "trace_parser", "parse_from": "tp"},
            {"type": "scope_name_parser", "parse_from": "syslog_appname"},
            {"type": "sanitize_utf8", "parse_from": "text"},
            {"type": "unquote", "field": "quoted"},
            {"type": "jsonarray_parser", "parse_from": "csvish"},
            {"type": "assign_keys", "field": "parsed_array", "keys": ["k1", "k2"]},
            {"type": "regex_replace", "field": "quoted", "regex": "q", "replace_with": "Q"},
        ],
    )
    r = {x["i"]: x for x in out.collect()}
    assert r[1]["syslog_severity"] == 2 and r[1]["syslog_appname"] == "app"
    assert r[1]["scope_name"] == "app" and r[1]["quoted"] == "Q"
    assert r[2]["quoted"] == "r"  # unquoted, no 'q' to replace
    assert r[1]["uri_host"] == "x.io" and r[1]["uri_scheme"] == "https"
    assert r[1]["trace_id"] == "000102030405060708090a0b0c0d0e0f"
    assert r[1]["trace_sampled"] is True and r[2]["trace_sampled"] is False
    assert r[1]["kv"]["k1"] == "a" and r[2]["kv"]["k2"] == "d"

    rec = apply_stanza_operators(
        df.selectExpr("conv", "i", "text"),
        [
            {
                "type": "recombine",
                "source_identifier": "conv",
                "order_field": "i",
                "is_first_entry": "i = 1",
                "combine_field": "text",
                "combine_with": " | ",
            }
        ],
    ).collect()
    assert len(rec) == 1 and rec[0]["n_lines"] == 2 and " | " in rec[0]["combined"]


def test_chain_new_validation_errors():
    import pytest

    for ops, msg in [
        ([{"type": "syslog_parser", "protocol": "rfc9999"}], "rfc5424|rfc3164"),
        ([{"type": "assign_keys", "keys": ["a"]}], "field"),
        ([{"type": "unquote"}], "unquote needs"),
        ([{"type": "regex_replace", "regex": "x"}], "replace_with"),
        ([{"type": "recombine", "is_first_entry": "x"}], "source_identifier"),
        ([{"type": "recombine", "source_identifier": "c", "order_field": "i"}], "is_first_entry"),
    ]:
        with pytest.raises(ValueError) as ei:
            validate_stanza_ops(ops)
        assert msg.replace("`", "") in str(ei.value).replace("`", "")


def test_stanza_chain_streaming_matches_batch(spark, tmp_path):
    """The chain is stateless projections, so it composes with readStream
    unchanged: an availableNow drain through the same operators: list must
    equal the batch run on the same files (the receiver's streaming vs a
    backfill reading identical bytes)."""
    import json as _json

    d = tmp_path / "chain_in"
    d.mkdir()
    rows = [
        {"id": 1, "text": "2024-01-01T00:00:01 [ERROR] auth: denied"},
        {"id": 2, "text": "2024-01-01T00:00:02 [info] web: ok"},
        {"id": 3, "text": "garbage"},
    ]
    (d / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    schema = "id int, text string"
    ops = [
        {"type": "regex_parser", "regex": _RX},
        {"type": "severity_parser", "parse_from": "lvl"},
        {"type": "time_parser", "parse_from": "log_ts", "layout": "%Y-%m-%dT%H:%M:%S"},
        {"type": "router", "routes": [{"expr": "severity_number >= 17", "output": "errors"}]},
    ]

    def pipe(df):
        out = apply_stanza_operators(df, ops)
        return out.select("id", "comp", "severity_text", "severity_number", "event_ts", "route_id")

    sdf = pipe(spark.readStream.schema(schema).json(str(d)))
    assert sdf.isStreaming
    (
        sdf.writeStream.format("memory").queryName("chain_stream")
        .option("checkpointLocation", str(tmp_path / "chain_ck"))
        .trigger(availableNow=True).start().awaitTermination(60)
    )
    got = sorted(tuple(r) for r in spark.table("chain_stream").collect())
    want = sorted(tuple(r) for r in pipe(spark.read.schema(schema).json(str(d))).collect())
    assert got == want and len(got) == 3
    by_id = {t[0]: t for t in got}
    assert by_id[1][5] == "errors" and by_id[2][5] == "general"
    assert by_id[3][1] is None and by_id[3][4] is None


def test_regex_parser_mixed_named_unnamed_groups(spark):
    """Named groups keep their true capture indices when unnamed groups
    precede them in the pattern."""
    df = spark.createDataFrame([("abc ERROR",)], "text string")
    out = apply_stanza_operators(
        df, [{"type": "regex_parser", "regex": r"^(\w+) (?P<lvl>\w+)$"}]
    ).collect()[0]
    assert out["lvl"] == "ERROR"


def test_regex_parser_group_shadowing_source(spark):
    """A group named after the source column must not corrupt its sibling
    extracts (all groups evaluate against the pre-projection frame)."""
    df = spark.createDataFrame([("E hello",)], "text string")
    out = apply_stanza_operators(
        df, [{"type": "regex_parser", "regex": r"^(?P<text>\w+) (?P<msg>\w+)$"}]
    ).collect()[0]
    assert out["text"] == "E" and out["msg"] == "hello"


def test_json_parser_schemaless_and_csv_string_header(spark):
    df = spark.createDataFrame([('{"a":"1","b":"x"}', "1,ERROR,boot")], "j string, c string")
    out = apply_stanza_operators(
        df,
        [
            {"type": "json_parser", "parse_from": "j"},  # stanza: schema-less -> map
            {"type": "csv_parser", "parse_from": "c", "header": "id,severity,message"},
        ],
    ).collect()[0]
    assert out["parsed_json"]["a"] == "1" and out["parsed_json"]["b"] == "x"
    assert out["parsed_csv"]["severity"] == "ERROR" and out["parsed_csv"]["message"] == "boot"


def test_malformed_regex_raises_value_error():
    import pytest

    with pytest.raises(ValueError, match="malformed regex"):
        validate_stanza_ops([{"type": "regex_parser", "regex": "(?P<a>x"}])


def test_yaml_logstransform_without_receiver_ops_keeps_parse(spark):
    """logstransform ops with NO receiver operators must run AFTER the
    default parse stage, not replace it — the ops reference parsed columns."""
    from opentelemetry_collector_contrib_spark.fixtures import ensure_tier
    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        build_from_collector_yaml,
        spec_from_collector_yaml,
    )

    doc = """
receivers:
  filelog:
    include: [/x]
processors:
  logstransform:
    operators:
      - type: severity_parser
        parse_from: sev
"""
    spec = spec_from_collector_yaml(doc, source_path="/tmp/ignored")
    assert "stanza_operators" not in spec
    assert [o["type"] for o in spec["stanza_operators_post"]] == ["severity_parser"]
    df = build_from_collector_yaml(spark, doc, source_path=ensure_tier("t1"))
    # 'sev' only exists because the default parse bank still ran
    assert {"sev", "severity_text", "severity_number"} <= set(df.columns)
    assert df.filter(df.severity_number >= 17).count() > 0


def test_service_pipeline_applies_stanza_operators(spark):
    """A service pipeline spec carrying stanza_operators must run them as
    the parse stage (build_service mirrors build_pipeline)."""
    from opentelemetry_collector_contrib_spark.fixtures import ensure_tier
    from opentelemetry_collector_contrib_spark.plans.config import build_service

    svc = {
        "pipelines": {
            "logs/in": {
                "receivers": [{"path": ensure_tier("t1")}],
                "spec": {
                    "stanza_operators": [
                        {"type": "regex_parser", "regex": _RX},
                        {"type": "severity_parser", "parse_from": "lvl"},
                    ],
                    "order": {"enabled": False},
                },
                "exporters": ["sink:parsed"],
            },
        },
    }
    out = build_service(spark, svc)["sinks"]["parsed"]
    assert {"comp", "severity_number"} <= set(out.columns)
    assert out.filter(out.severity_number >= 17).count() > 0


def test_service_connector_fed_rejects_stanza_operators():
    import pytest

    from opentelemetry_collector_contrib_spark.plans.config import validate_service

    with pytest.raises(ValueError, match="drop 'stanza_operators'"):
        validate_service({
            "pipelines": {
                "a": {"receivers": [{"path": "/x"}], "exporters": ["c"]},
                "b": {
                    "receivers": ["c"],
                    "spec": {"stanza_operators": [{"type": "noop"}]},
                    "exporters": ["sink:x"],
                },
            },
            "connectors": {"c": {"type": "forward"}},
        })


def test_time_parser_location(spark):
    """stanza time block `location`: zone-less strings are wall-clock time
    IN that IANA zone; the parsed instant converts to UTC (EST = UTC-5)."""
    df = spark.createDataFrame([("2024-01-15 00:00:00",)], "t string")
    out = apply_stanza_operators(
        df,
        [{"type": "time_parser", "parse_from": "t",
          "layout": "%Y-%m-%d %H:%M:%S", "location": "America/New_York"}],
    ).select(F.unix_micros("event_ts").alias("us")).collect()[0]
    assert out["us"] == 1705294800_000000  # 2024-01-15T05:00:00Z


def test_java_invalid_regex_fails_at_build(spark):
    """A pattern Python accepts but the Java engine rejects (conditional
    group syntax, unsupported in java.util.regex) must raise ValueError at
    build time, not mid-job."""
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="Java regex engine"):
        apply_stanza_operators(
            df, [{"type": "regex_parser", "regex": r"(?P<a>x)(?(a)y|z)"}]
        )


def test_if_gate_on_parser_and_add(logs):
    # helper/transformer.go: the op runs only where `if` is true; other
    # entries pass through untouched (parsed columns NULL there)
    out = apply_stanza_operators(
        logs,
        [
            {"type": "regex_parser", "regex": _RX, "if": "id != 'b'"},
            {"type": "add", "field": "env", "value": "prod", "if": "id = 'a'"},
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["lvl"] == "ERROR" and rows["a"]["env"] == "prod"
    assert rows["b"]["lvl"] is None and rows["b"]["env"] is None  # gated out
    assert rows["c"]["lvl"] is None  # gated in but non-matching (send)
    assert rows["b"]["text"].endswith("web: ok")  # untouched passthrough


def test_if_gate_on_remove_preserves_ungated(logs):
    out = apply_stanza_operators(
        logs, [{"type": "remove", "field": "text", "if": "id = 'a'"}]
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["text"] is None       # removed where gated
    assert rows["b"]["text"] is not None   # preserved where not


def test_if_gate_composes_with_filter(logs):
    # drop iff gate AND expr
    out = apply_stanza_operators(
        logs, [{"type": "filter", "expr": "text rlike 'ok'", "if": "id = 'b'"}]
    )
    assert {r["id"] for r in out.collect()} == {"a", "c"}
    out2 = apply_stanza_operators(
        logs, [{"type": "filter", "expr": "text rlike 'ok'", "if": "id = 'a'"}]
    )
    assert {r["id"] for r in out2.collect()} == {"a", "b", "c"}


def test_if_gate_validation():
    with pytest.raises(ValueError):
        validate_stanza_ops([{"type": "router", "routes": [], "if": "true"}])
    with pytest.raises(ValueError):
        validate_stanza_ops([{"type": "add", "field": "x", "value": 1, "if": "  "}])
