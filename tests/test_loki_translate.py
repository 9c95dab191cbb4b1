"""Loki translator stream-label tables — mirrors the observable cases of
pkg/translator/loki convert_test.go / logs_to_loki_test.go over the flat
map<string,string> relational model."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.loki_translate import loki_stream_labels


def _run(spark, log_attrs, res_attrs, severity=None, defaults_enabled=None):
    df = spark.createDataFrame(
        [(1, log_attrs, res_attrs, severity)],
        "i int, log_attrs map<string,string>, res_attrs map<string,string>, sev string",
    )
    return loki_stream_labels(
        df, severity_col="sev", defaults_enabled=defaults_enabled
    ).collect()[0]


def test_default_labels_job_instance_exporter(spark):
    r = _run(
        spark,
        {},
        {"service.name": "api", "service.namespace": "prod", "service.instance.id": "i-1"},
    )
    assert r["loki_labels"] == "exporter=OTLP,instance=i-1,job=prod/api"
    assert r["loki_format"] == "json" and r["loki_tenant"] == ""


def test_job_without_namespace_and_disabled_defaults(spark):
    r = _run(spark, {}, {"service.name": "api"})
    assert r["loki_labels"] == "exporter=OTLP,job=api"
    r2 = _run(spark, {}, {"service.name": "api"}, defaults_enabled={"exporter": False, "job": False})
    assert r2["loki_labels"] == ""


def test_hint_labels_from_both_sides_and_merge_order(spark):
    # resource hint picks from resource; record's resource hint ALSO picks
    # from resource; attribute hint picks from the record map and wins ties
    r = _run(
        spark,
        {"loki.attribute.labels": "env", "env": "from-log", "loki.resource.labels": "zone"},
        {"loki.resource.labels": "region", "region": "eu", "zone": "z1", "env": "from-res"},
        defaults_enabled={"exporter": False},
    )
    assert r["loki_labels"] == "env=from-log,region=eu,zone=z1"
    # promoted labels and hint keys are stripped from both maps — any
    # attr NAMED like a merged label goes, wherever the value came from
    # (convert.go:146 checks the name against the merged LabelSet)
    assert r["log_attrs_rest"] == {}
    assert r["res_attrs_rest"] == {}


def test_dotted_label_names_normalize(spark):
    r = _run(
        spark,
        {"loki.attribute.labels": "http.status_code", "http.status_code": "500"},
        {},
        defaults_enabled={"exporter": False},
    )
    assert r["loki_labels"] == "http_status_code=500"


def test_level_added_from_severity_unless_present(spark):
    r = _run(spark, {}, {}, severity="ERROR", defaults_enabled={"exporter": False})
    assert r["loki_labels"] == "level=ERROR"
    # existing level attribute wins
    r2 = _run(
        spark,
        {"level": "custom"},
        {},
        severity="ERROR",
        defaults_enabled={"exporter": False},
    )
    assert r2["loki_labels"] == "level=custom"
    # gate off
    r3 = _run(spark, {}, {}, severity="ERROR", defaults_enabled={"exporter": False, "level": False})
    assert r3["loki_labels"] == ""


def test_tenant_hint_indirect_lookup(spark):
    # hint names the attribute holding the tenant; resource-first for both
    r = _run(
        spark,
        {"team": "log-team"},
        {"loki.tenant": "team", "team": "res-team"},
        defaults_enabled={"exporter": False},
    )
    assert r["loki_tenant"] == "res-team"
    r2 = _run(spark, {"loki.tenant": "team", "team": "log-team"}, {}, defaults_enabled={"exporter": False})
    assert r2["loki_tenant"] == "log-team"
    r3 = _run(spark, {"loki.tenant": "missing"}, {}, defaults_enabled={"exporter": False})
    assert r3["loki_tenant"] == ""


def test_format_hint_resource_first(spark):
    r = _run(spark, {"loki.format": "logfmt"}, {}, defaults_enabled={"exporter": False})
    assert r["loki_format"] == "logfmt"
    r2 = _run(
        spark, {"loki.format": "logfmt"}, {"loki.format": "raw"}, defaults_enabled={"exporter": False}
    )
    assert r2["loki_format"] == "raw"
