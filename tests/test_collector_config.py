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


# ---------------------------------------------------------------------------
# service::pipelines graph — connectors as edges
# ---------------------------------------------------------------------------

def _svc(src):
    return {
        "pipelines": {
            "logs/in": {
                "receivers": [{"path": src}],
                "spec": {"order": {"enabled": False}},
                "exporters": ["count/all"],
            },
            "metrics/out": {"receivers": ["count/all"], "exporters": ["sink:counts"]},
        },
        "connectors": {"count/all": {"type": "count", "dims": ["role"]}},
    }


def test_service_graph_count_edge(spark):
    from opentelemetry_collector_contrib_spark.fixtures import ensure_tier
    from opentelemetry_collector_contrib_spark.plans.config import build_service

    src = ensure_tier("t1")
    out = build_service(spark, _svc(src))
    counts = {r["role"]: r["log_count"] for r in out["sinks"]["counts"].collect()}
    raw = spark.read.parquet(src)
    from pyspark.sql import functions as F

    expected = {r["role"]: r["n"] for r in raw.groupBy("role").agg(F.count("*").alias("n")).collect()}
    assert counts == expected


def test_service_graph_forward_and_shared_edge(spark):
    from opentelemetry_collector_contrib_spark.fixtures import ensure_tier
    from opentelemetry_collector_contrib_spark.plans.config import build_service

    src = ensure_tier("t1")
    svc = _svc(src)
    # forward bridge: identity edge feeding a second pipeline with a filter
    svc["connectors"]["fwd"] = {"type": "forward"}
    svc["pipelines"]["logs/in"]["exporters"].append("fwd")
    svc["pipelines"]["logs/tap"] = {
        "receivers": ["fwd"],
        "spec": {"filter": ['role != "user"'], "order": {"enabled": False}},
        "exporters": ["sink:users"],
    }
    out = build_service(spark, svc)
    users = out["sinks"]["users"]
    assert users.filter(users.role != "user").count() == 0
    assert users.count() > 0


def test_service_graph_validation_errors(spark):
    import pytest
    from opentelemetry_collector_contrib_spark.plans.config import validate_service

    with pytest.raises(ValueError, match="not used as a receiver"):
        validate_service({
            "pipelines": {"a": {"receivers": [{"path": "/x"}], "exporters": ["c"]}},
            "connectors": {"c": {"type": "forward"}},
        })
    with pytest.raises(ValueError, match="not used as an exporter"):
        validate_service({
            "pipelines": {"a": {"receivers": ["c"], "exporters": ["sink:x"]}},
            "connectors": {"c": {"type": "forward"}},
        })
    with pytest.raises(ValueError, match="unknown connector receiver"):
        validate_service({"pipelines": {"a": {"receivers": ["nope"], "exporters": ["sink:x"]}}})
    with pytest.raises(ValueError, match="drop 'parse'"):
        validate_service({
            "pipelines": {
                "a": {"receivers": [{"path": "/x"}], "exporters": ["c"]},
                "b": {"receivers": ["c"], "spec": {"parse": {"bank": "native"}}, "exporters": ["sink:x"]},
            },
            "connectors": {"c": {"type": "forward"}},
        })
    with pytest.raises(ValueError, match="dims is required"):
        validate_service({
            "pipelines": {
                "a": {"receivers": [{"path": "/x"}], "exporters": ["c"]},
                "b": {"receivers": ["c"], "exporters": ["sink:x"]},
            },
            "connectors": {"c": {"type": "count"}},
        })


def test_service_graph_cycle_fails(spark):
    import pytest
    from opentelemetry_collector_contrib_spark.plans.config import build_service

    svc = {
        "pipelines": {
            "a": {"receivers": ["c2"], "exporters": ["c1"]},
            "b": {"receivers": ["c1"], "exporters": ["c2", "sink:x"]},
        },
        "connectors": {"c1": {"type": "forward"}, "c2": {"type": "forward"}},
    }
    with pytest.raises(ValueError, match="cyclic service graph"):
        build_service(spark, svc)


NETFLOW_YAML = """
receivers:
  netflow:
    scheme: netflow
    format: v5
    spool: __SPOOL__
processors:
  filter:
    logs:
      log_record:
        - nf_transport == "udp"
exporters:
  file:
    path: /tmp/out
service:
  pipelines:
    logs:
      receivers: [netflow]
      processors: [filter]
      exporters: [file]
"""


def test_netflow_receiver_yaml_pipeline(spark, tmp_path):
    """A collector config with a netflow receiver builds a pipeline whose
    parse stage IS the flow decoder; processors see nf_* columns."""
    from opentelemetry_collector_contrib_spark.operators.netflow import synthesize_netflow_v5

    spool = str(tmp_path / "nf")
    src = spark.range(20).selectExpr("id AS event_id", "id % 3 AS user_id")
    synthesize_netflow_v5(src).write.parquet(spool)
    yaml_doc = NETFLOW_YAML.replace("__SPOOL__", spool)
    spec = spec_from_collector_yaml(yaml_doc)
    assert spec["source"] == {"wire_spool": spool, "wire": "netflow_v5"}
    df = build_from_collector_yaml(spark, yaml_doc)
    # 2 records per packet; the filter drops the UDP one
    assert df.count() == 20
    assert df.filter(df.nf_transport != "tcp").count() == 0


def test_netflow_receiver_yaml_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="spool"):
        spec_from_collector_yaml("receivers:\n  netflow: {scheme: netflow}\n")
    with _pytest.raises(ValueError, match="scheme"):
        spec_from_collector_yaml("receivers:\n  netflow: {scheme: tcp, spool: /x}\n")
    with _pytest.raises(ValueError, match="format"):
        spec_from_collector_yaml("receivers:\n  netflow: {spool: /x, format: v7}\n")
    spec = spec_from_collector_yaml("receivers:\n  netflow: {spool: /x, format: v9}\n")
    assert spec["source"] == {"wire_spool": "/x", "wire": "netflow_v9"}
