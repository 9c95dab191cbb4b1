"""Tests for the OTTL statement compiler and the config-driven pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl_compiler import (
    apply_statements,
    parse_condition,
    parse_statement,
)
from opentelemetry_collector_contrib_spark.plans.config import build_pipeline, validate_spec


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("c1", 0, "user", "hello world", "none", None),
        ("c1", 1, "assistant", "LOG lvl=err", "search", "err"),
        ("c2", 0, "system", "boot", "none", "ok"),
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, status string")


def test_set_literal(df):
    out = apply_statements(df, ['set(pipeline, "logs")'])
    assert out.filter(F.col("pipeline") != "logs").count() == 0


def test_set_where_condition(df):
    out = apply_statements(df, ['set(flagged, true) where status == "err"'])
    got = {r["conv_id"] + str(r["turn_idx"]): r["flagged"] for r in out.collect()}
    assert got["c11"] is True
    assert got["c10"] is None  # untouched rows keep the (absent->null) value


def test_set_converter_and_math(df):
    out = apply_statements(df, ["set(t2, turn_idx * 10 + 1)", 'set(up, ToUpperCase(role))'])
    r = {r["turn_idx"]: r for r in out.filter(F.col("conv_id") == "c1").collect()}
    assert r[1]["t2"] == 11
    assert r[0]["up"] == "USER"


def test_body_path_maps_to_text(df):
    out = apply_statements(df, ['set(head, Substring(body, 0, 5))'])
    assert out.filter(F.col("conv_id") == "c2").collect()[0]["head"] == "boot"


def test_attributes_index_path(df):
    cond = parse_condition('attributes["status"] == "err" and role == "assistant"')
    assert df.filter(cond).count() == 1


def test_delete_and_keep(df):
    out = apply_statements(df, ["delete_key(status)"])
    assert "status" not in out.columns
    out2 = apply_statements(df, ['keep_keys(conv_id, turn_idx)'])
    assert out2.columns == ["conv_id", "turn_idx"]


def test_condition_or_not(df):
    cond = parse_condition('not (status == "ok") and turn_idx >= 1')
    # null status rows: null comparison -> null -> not(null)=null -> filtered out (reference: false)
    assert df.filter(cond).count() == 1


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_statement("set(x,")
    with pytest.raises(ValueError):
        parse_statement('unknown_editor(x, 1)')
    with pytest.raises(ValueError):
        parse_condition('NoSuchFn(x) == 1')


def test_config_pipeline(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.fixtures import dims_dir, ensure_dims, ensure_tier

    ensure_dims()
    spec = {
        "source": {"path": ensure_tier("t1")},
        "parse": {"bank": "native"},
        "transform": ['set(engine, "spark")'],
        "enrich": [
            {
                "dim_path": dims_dir() + "/tool_dim.parquet",
                "key": "tool",
                "defaults": {"tool_category": "Unknown", "tool_cost_weight": 0.0},
            }
        ],
        "routes": {
            "default": "general",
            "table": [{"name": "errors", "condition": 'status == "err"', "mode": "move"}],
        },
        "aggregates": {"per_conv": {"keys": ["conv_id"]}},
    }
    routed = build_pipeline(spark, spec)
    assert routed.filter(F.col("engine") != "spark").count() == 0
    # route parity with the hand-built pipeline's route condition
    n_err = routed.filter(F.col("route_id") == "errors").count()
    assert n_err == routed.filter(F.col("status") == "err").count()
    assert "turn_rn" in routed.columns


def test_config_validation():
    with pytest.raises(ValueError):
        validate_spec({"source": {}})
    with pytest.raises(ValueError):
        validate_spec({"source": {"path": "x"}, "routes": {"table": []}})
    with pytest.raises(ValueError):
        validate_spec({"source": {"path": "x"}, "transform": ["set(x"]})
    with pytest.raises(ValueError):
        validate_spec({"source": {"path": "x"}, "bogus_section": {}})