"""Data-contract checks: one-aggregate-pass validation semantics."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.plans.contracts import validate_contract


def test_contract_check_semantics(spark):
    df = spark.createDataFrame(
        [
            ("a", 0, "user"),
            ("a", 1, "assistant"),
            ("a", 1, "tool"),       # duplicate (conv, idx)
            (None, 2, "user"),      # null conv
            ("b", -1, "user"),      # negative idx
            ("b", 3, "robot"),      # bad role
        ],
        "conv_id string, turn_idx int, role string",
    )
    checks = [
        {"type": "not_null", "col": "conv_id"},
        {"type": "range", "col": "turn_idx", "min": 0},
        {"type": "enum", "col": "role", "allowed": ["system", "user", "assistant", "tool"]},
        {"type": "unique", "cols": ["conv_id", "turn_idx"]},
        {"type": "regex", "col": "conv_id", "pattern": "^[ab]$"},
        # a lenient budget: 1 bad role in 6 rows passes at 20%
        {"name": "role_lenient", "type": "enum", "col": "role",
         "allowed": ["system", "user", "assistant", "tool"],
         "max_violation_frac": 0.2},
    ]
    out = {r.check: r for r in validate_contract(df, checks).collect()}
    assert out["not_null:conv_id"].n_violations == 1
    assert out["range:turn_idx"].n_violations == 1  # NULL conv row's idx=2 fine
    assert out["enum:role"].n_violations == 1 and out["enum:role"].passed is False
    assert out["unique:conv_id_turn_idx"].n_violations == 1
    assert out["regex:conv_id"].n_violations == 0  # NULL doesn't violate regex
    assert out["role_lenient"].passed is True
    assert all(r.n_rows == 6 for r in out.values())


def test_contract_single_pass_plan(spark, t1):
    from opentelemetry_collector_contrib_spark.plans.contracts import (
        transcript_contract,
        validate_contract,
    )

    out = validate_contract(t1, transcript_contract())
    rows = {r.check: r.passed for r in out.collect()}
    assert len(rows) == 6 and all(rows.values())  # fixture satisfies its contract
    # all checks ride ONE aggregate over ONE scan (inspect the final
    # adaptive section only — toString repeats the scan in Initial Plan)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
