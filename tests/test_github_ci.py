"""githubreceiver webhook → trace conversion — deterministic ids vs
hashlib.sha256, unique-step naming, timestamp correction, and the
reference's status quirks (trace_event_handling.go:24-539)."""

from __future__ import annotations

import datetime as dt
import hashlib

from opentelemetry_collector_contrib_spark.operators.github_ci import (
    workflow_job_spans,
    workflow_run_spans,
)


def _sha_hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _t(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, sec)


_JOB_SCHEMA = (
    "run_id bigint, run_attempt int, check_run_id bigint, job_name string, "
    "created_at timestamp, started_at timestamp, completed_at timestamp, conclusion string, "
    "steps array<struct<name string, number int, status string, conclusion string, "
    "started_at timestamp, completed_at timestamp>>"
)


def test_job_queue_step_topology_and_ids(spark):
    steps = [
        ("checkout", 1, "completed", "success", _t(1), _t(2)),
        ("test", 2, "completed", "failure", _t(2), _t(3)),
        ("test", 3, "completed", "skipped", _t(3), _t(3)),
    ]
    df = spark.createDataFrame(
        [(42, 2, 777, "build", _t(0), _t(5), _t(30), "success", steps)], _JOB_SCHEMA
    )
    rows = {(r["span_type"], r["name"]): r for r in workflow_job_spans(df).collect()}
    assert len(rows) == 5  # job + queue + 3 steps

    trace = _sha_hex("422t")[:32]
    root = _sha_hex("422s")[16:32]
    job_id = _sha_hex("777-j")[16:32]

    job = rows[("job", "build")]
    assert job["trace_id"] == trace
    assert job["span_id"] == job_id
    assert job["parent_span_id"] == root
    assert job["status_code"] == "STATUS_CODE_OK"

    q = rows[("queue", "queue-build")]
    assert q["span_id"] == _sha_hex("777-q")[16:32]
    assert q["parent_span_id"] == job_id
    assert q["queue_duration_ns"] == 5e9  # created -> started delta

    # duplicate step names uniquify "test", "test-1" but share the raw-name id
    s0 = rows[("step", "checkout")]
    s1 = rows[("step", "test")]
    s2 = rows[("step", "test-1")]
    assert s0["span_id"] == _sha_hex("777-checkout-s")[16:32]
    assert s1["span_id"] == _sha_hex("777-test-s")[16:32] == s2["span_id"]
    assert all(r["parent_span_id"] == job_id for r in (s0, s1, s2))


def test_step_status_quirks_and_message(spark):
    steps = [
        ("a", 1, "completed", "skipped", _t(1), _t(2)),
        ("b", 2, "in_progress", None, _t(2), _t(3)),
        ("c", 3, "completed", "cancelled", _t(3), _t(4)),
    ]
    df = spark.createDataFrame(
        [(1, 1, 9, "j", _t(0), _t(0), _t(9), "failure", steps)], _JOB_SCHEMA
    )
    rows = {r["name"]: r for r in workflow_job_spans(df).filter("span_type='step'").collect()}
    # reference quirk: skipped -> task status "failure", code UNSET (:427-429)
    assert rows["a"]["task_status"] == "failure"
    assert rows["a"]["status_code"] == "STATUS_CODE_UNSET"
    # default branch keeps the raw step status field
    assert rows["b"]["task_status"] == "in_progress"
    assert rows["c"]["task_status"] == "cancellation"
    # step status message is the JOB conclusion (:438)
    assert all(r["status_message"] == "failure" for r in rows.values())


def test_timestamp_correction_collapses_reversed(spark):
    df = spark.createDataFrame(
        [(1, 1, 9, "j", _t(10), _t(5), _t(3), "success", [])], _JOB_SCHEMA
    )
    rows = {r["span_type"]: r for r in workflow_job_spans(df).collect()}
    assert rows["job"]["start_ts"] == rows["job"]["end_ts"] == _t(10)
    assert rows["queue"]["start_ts"] == rows["queue"]["end_ts"] == _t(10)
    assert rows["queue"]["queue_duration_ns"] == 0.0


def test_run_root_span_and_previous_link(spark):
    schema = (
        "run_id bigint, run_attempt int, workflow_name string, run_started_at timestamp, "
        "updated_at timestamp, conclusion string, previous_attempt_url string, repo_name string"
    )
    df = spark.createDataFrame(
        [
            (7, 2, "CI", _t(0), _t(50), "failure", "https://api/prev", "My_Repo"),
            (8, 1, "CI", _t(0), _t(50), "skipped", None, ""),
        ],
        schema,
    )
    rows = {r["span_id"]: r for r in workflow_run_spans(df).collect()}
    r7 = rows[_sha_hex("72s")[16:32]]
    assert r7["trace_id"] == _sha_hex("72t")[:32]
    assert r7["kind"] == "SPAN_KIND_SERVER"
    assert r7["status_code"] == "STATUS_CODE_ERROR"
    assert r7["link_trace_id"] == _sha_hex("71t")[:32]  # previous attempt
    assert r7["service_name"] == "my-repo"  # lowercase, _ -> -
    r8 = rows[_sha_hex("81s")[16:32]]
    assert r8["link_trace_id"] is None
    assert r8["service_name"] == "unknown_service"
    assert r8["run_status"] == "skip"
