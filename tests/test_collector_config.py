"""Collector-YAML shim (plans/collector_config.py): a collector-shaped
config translates into a validated spec and builds a running pipeline."""

import pytest

from opentelemetry_collector_contrib_spark.plans.collector_config import (
    build_from_collector_yaml,
    spec_from_collector_yaml,
)
from opentelemetry_collector_contrib_spark.plans.config import validate_spec

YAML_DOC = """
receivers:
  filelog:
    include: [/var/log/app/*.log]
processors:
  transform:
    log_statements:
      - context: log
        statements:
          - set(env, "prod")
          - set(sev, "unknown") where sev == nil
  filter:
    logs:
      log_record:
        - 'text == "drop me"'
  probabilistic_sampler:
    sampling_percentage: 100
  tail_sampling:
    policies:
      - name: errs
        type: status_code
        status_code:
          status_codes: [err]
      - name: big
        type: span_count
        span_count:
          min_spans: 2
      - name: both
        type: and
        and:
          and_sub_policy:
            - name: a
              type: latency
              latency:
                threshold_ms: 10
            - name: b
              type: probabilistic
              probabilistic:
                sampling_percentage: 100
connectors:
  routing:
    default_pipelines: [logs/general]
    table:
      - condition: 'status == "err"'
        pipelines: [logs/errors]
      - condition: 'tool != "none"'
        pipelines: [logs/tool_events, logs/mirror]
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [transform, filter]
      exporters: [routing]
"""


def test_yaml_translates_to_valid_spec(spark):  # OTTL validation builds Columns → needs a context
    spec = spec_from_collector_yaml(YAML_DOC, source_path="/tmp/ignored")
    assert spec["source"] == {"path": "/tmp/ignored"}
    assert spec["transform"] == ['set(env, "prod")', 'set(sev, "unknown") where sev == nil']
    assert spec["filter"] == ['text == "drop me"']
    assert spec["sample"]["kind"] == "probabilistic_portable" and spec["sample"]["percent"] == 100
    pol = {p["name"]: p for p in spec["tail_sampling"]["policies"]}
    assert pol["errs"] == {"name": "errs", "type": "status_code", "values": ["err"]}
    assert pol["big"]["min"] == 2
    assert [s["type"] for s in pol["both"]["of"]] == ["latency", "probabilistic"]
    assert spec["routes"]["default"] == "general"
    assert spec["routes"]["table"][0] == {"name": "errors", "condition": 'status == "err"', "mode": "move"}
    assert spec["routes"]["table"][1]["mode"] == "copy"  # fans to 2 pipelines
    validate_spec(spec)  # compiles every OTTL string eagerly


def test_yaml_builds_running_pipeline(spark):
    from opentelemetry_collector_contrib_spark.fixtures import ensure_tier

    df = build_from_collector_yaml(spark, YAML_DOC, source_path=ensure_tier("t1"))
    rows = df.count()
    assert rows > 0
    assert "route_id" in df.columns and "env" in df.columns
    assert df.filter(df.env != "prod").count() == 0
    routes = {r["route_id"] for r in df.select("route_id").distinct().collect()}
    assert routes <= {"errors", "tool_events", "general"}


def test_unsupported_components_fail_loud():
    with pytest.raises(ValueError, match="unsupported processor"):
        spec_from_collector_yaml(
            "receivers: {filelog: {include: [/x]}}\nprocessors: {memory_limiter: {}}\n"
        )
    with pytest.raises(ValueError, match="unknown collector sections"):
        spec_from_collector_yaml("bogus_section: {}\n")
    with pytest.raises(ValueError, match="needs include"):
        spec_from_collector_yaml("receivers: {filelog: {}}\n")
