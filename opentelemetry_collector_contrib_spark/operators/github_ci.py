"""GitHub Actions CI telemetry — ``receiver/githubreceiver``'s webhook →
trace conversion (trace_event_handling.go:24-539, model.go:103-290) as
native projections.

The receiver turns ``workflow_run`` / ``workflow_job`` webhook events into
deterministic CICD traces:

  - trace id    = sha256("{run_id}{run_attempt}t")[:16 bytes]
                  (newTraceID, trace_event_handling.go:91-110)
  - root/parent = sha256("{run_id}{run_attempt}s")[8:16 bytes]
                  (newParentSpanID, :112-124)
  - with the UseCheckRunID gate (default on since v0.151.0):
    job span    = sha256("{check_run_id}-j")[8:16]
    queue span  = sha256("{check_run_id}-q")[8:16]
    step span   = sha256("{check_run_id}-{step_name}-s")[8:16]
                  (newSpanIDFromCheckRun, :464-480)

Topology per workflow_job event: a job span (parent = the run's root
span), a ``queue-{job}`` child carrying the created→started delta as
``cicd.pipeline.run.queue.duration`` ns (:482-539), and one child per
step with duplicate step names uniquified ``name, name-1, name-2 …``
(newUniqueSteps, :329-364).

Faithfully reproduced reference quirks (cited so they're auditable):
``skipped`` steps stamp task status "failure" (not "skip",
trace_event_handling.go:427-429), every step's status MESSAGE is the
job's conclusion (:438), and reversed timestamps collapse to a
zero-duration span at the later instant (correctActionTimestamps,
:126-140).

Everything is sha2/when/transform Column work — one codegen projection
plus a single posexplode for steps; no Python, no shuffle. At 10^12
webhook rows this runs at scan speed and partitions by input split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KIND_SERVER = "SPAN_KIND_SERVER"
_KIND_INTERNAL = "SPAN_KIND_INTERNAL"


def _trace_id(run_id: Column, run_attempt: Column) -> Column:
    return F.substring(
        F.sha2(F.concat(run_id.cast("string"), run_attempt.cast("string"), F.lit("t")), 256), 1, 32
    )


def _parent_span_id(run_id: Column, run_attempt: Column) -> Column:
    return F.substring(
        F.sha2(F.concat(run_id.cast("string"), run_attempt.cast("string"), F.lit("s")), 256), 17, 16
    )


def _check_run_span_id(input_str: Column) -> Column:
    return F.substring(F.sha2(input_str, 256), 17, 16)


def _status_code(conclusion: Column) -> Column:
    """createRootSpan/createParentSpan status switch (:166-175, :253-262)."""
    low = F.lower(F.coalesce(conclusion, F.lit("")))
    return (
        F.when(low == "success", F.lit("STATUS_CODE_OK"))
        .when(low == "failure", F.lit("STATUS_CODE_ERROR"))
        .otherwise(F.lit("STATUS_CODE_UNSET"))
    )


def _corrected(start: Column, end: Column) -> tuple[Column, Column]:
    """correctActionTimestamps: end before start → zero-duration at start."""
    return start, F.when(end < start, start).otherwise(end)


def _service_name(repo_name: Column) -> Column:
    """getServiceName fallback chain tail (model.go:270-289): formatted
    repo name — lowercase, underscores → hyphens; empty → unknown_service."""
    formatted = F.replace(F.lower(repo_name), F.lit("_"), F.lit("-"))
    return F.when(F.coalesce(repo_name, F.lit("")) == "", F.lit("unknown_service")).otherwise(
        formatted
    )


def workflow_run_spans(df: DataFrame) -> DataFrame:
    """workflow_run events → one root span each (handleWorkflowRun :24-46,
    createRootSpan :142-201).

    Input columns: run_id, run_attempt, workflow_name, run_started_at,
    updated_at, conclusion, previous_attempt_url (nullable), repo_name.
    """
    run_id, attempt = F.col("run_id"), F.col("run_attempt")
    start, end = _corrected(F.col("run_started_at"), F.col("updated_at"))
    low = F.lower(F.coalesce(F.col("conclusion"), F.lit("")))
    # getWorkflowRunAttrs status switch (model.go:132-146): skipped → "skip",
    # cancelled → "cancellation", otherwise the lowered raw value
    run_status = (
        F.when(low == "success", F.lit("success"))
        .when(low == "failure", F.lit("failure"))
        .when(low == "skipped", F.lit("skip"))
        .when(low == "cancelled", F.lit("cancellation"))
        .otherwise(low)
    )
    prev_link = F.when(
        (F.coalesce(F.col("previous_attempt_url"), F.lit("")) != "") & (attempt > 1),
        _trace_id(run_id, attempt - 1),
    )
    return df.select(
        _trace_id(run_id, attempt).alias("trace_id"),
        _parent_span_id(run_id, attempt).alias("span_id"),
        F.lit(None).cast("string").alias("parent_span_id"),
        F.col("workflow_name").alias("name"),
        F.lit(_KIND_SERVER).alias("kind"),
        start.alias("start_ts"),
        end.alias("end_ts"),
        _status_code(F.col("conclusion")).alias("status_code"),
        F.coalesce(F.col("conclusion"), F.lit("")).alias("status_message"),
        prev_link.alias("link_trace_id"),
        _service_name(F.col("repo_name")).alias("service_name"),
        run_status.alias("run_status"),
    )


def workflow_job_spans(df: DataFrame) -> DataFrame:
    """workflow_job events → job + queue + step spans (handleWorkflowJob
    :50-88, createParentSpan :204-276, createJobQueueSpan :482-539,
    createStepSpans/createStepSpan :307-440), UseCheckRunID ids.

    Input columns: run_id, run_attempt, check_run_id, job_name,
    created_at, started_at, completed_at, conclusion, and
    steps: array<struct<name string, number int, status string,
    conclusion string, started_at timestamp, completed_at timestamp>>.

    Output: one row per span; span_type ∈ {job, queue, step}.
    """
    run_id, attempt, crid = F.col("run_id"), F.col("run_attempt"), F.col("check_run_id")
    trace = _trace_id(run_id, attempt)
    root = _parent_span_id(run_id, attempt)
    job_span = _check_run_span_id(F.concat(crid.cast("string"), F.lit("-j")))
    queue_span = _check_run_span_id(F.concat(crid.cast("string"), F.lit("-q")))

    job_start, job_end = _corrected(F.col("created_at"), F.col("completed_at"))
    q_start, q_end = _corrected(F.col("created_at"), F.col("started_at"))
    queue_ns = (
        (F.unix_micros(q_end.cast("timestamp")) - F.unix_micros(q_start.cast("timestamp"))) * 1000
    ).cast("double")

    base = df.select(
        run_id, attempt, crid, "job_name", "conclusion", "steps",
        trace.alias("trace_id"), root.alias("root_id"),
        job_span.alias("job_span_id"), queue_span.alias("queue_span_id"),
        job_start.alias("job_start"), job_end.alias("job_end"),
        q_start.alias("q_start"), q_end.alias("q_end"), queue_ns.alias("queue_ns"),
    )

    common = [
        F.col("trace_id"),
        F.lit(_KIND_INTERNAL).alias("kind"),
        F.coalesce(F.col("conclusion"), F.lit("")).alias("status_message"),
    ]
    jobs = base.select(
        *common,
        F.col("job_span_id").alias("span_id"),
        F.col("root_id").alias("parent_span_id"),
        F.col("job_name").alias("name"),
        F.lit("job").alias("span_type"),
        F.col("job_start").alias("start_ts"),
        F.col("job_end").alias("end_ts"),
        _status_code(F.col("conclusion")).alias("status_code"),
        F.lit(None).cast("double").alias("queue_duration_ns"),
        F.lit(None).cast("string").alias("task_status"),
    )
    queues = base.select(
        *common,
        F.col("queue_span_id").alias("span_id"),
        F.col("job_span_id").alias("parent_span_id"),
        F.concat(F.lit("queue-"), F.col("job_name")).alias("name"),
        F.lit("queue").alias("span_type"),
        F.col("q_start").alias("start_ts"),
        F.col("q_end").alias("end_ts"),
        F.lit("STATUS_CODE_UNSET").alias("status_code"),
        F.col("queue_ns").alias("queue_duration_ns"),
        F.lit(None).cast("string").alias("task_status"),
    )

    # newUniqueSteps occurrence numbering: the k-th duplicate of a name
    # keeps the raw name for k=1 and gains "-(k-1)" after — computed
    # natively from the array itself
    steps = F.col("steps")
    uniq = F.transform(
        steps,
        lambda s, i: F.struct(
            s.alias("s"),
            F.when(
                F.size(F.filter(steps, lambda x: x["name"] == s["name"])) == 1, s["name"]
            )
            .otherwise(
                F.when(
                    F.size(F.filter(F.slice(steps, F.lit(1), i), lambda x: x["name"] == s["name"])) == 0,
                    s["name"],
                ).otherwise(
                    F.concat(
                        s["name"],
                        F.lit("-"),
                        F.size(
                            F.filter(F.slice(steps, F.lit(1), i), lambda x: x["name"] == s["name"])
                        ).cast("string"),
                    )
                )
            )
            .alias("uname"),
        ),
    )
    st = base.withColumn("u", F.explode(uniq))
    s = F.col("u.s")
    s_low = F.lower(F.coalesce(s["conclusion"], F.lit("")))
    s_start, s_end = _corrected(s["started_at"], s["completed_at"])
    # step status switch (:421-436): success/failure map to themselves,
    # skipped ALSO maps the task-status attr to "failure" (reference
    # behavior, :427-429), cancelled → "cancellation"; default keeps the
    # raw step status field; status message is the JOB conclusion (:438)
    task_status = (
        F.when(s_low == "success", F.lit("success"))
        .when(s_low == "failure", F.lit("failure"))
        .when(s_low == "skipped", F.lit("failure"))
        .when(s_low == "cancelled", F.lit("cancellation"))
        .otherwise(F.coalesce(s["status"], F.lit("")))
    )
    step_code = (
        F.when(s_low == "success", F.lit("STATUS_CODE_OK"))
        .when(s_low == "failure", F.lit("STATUS_CODE_ERROR"))
        .otherwise(F.lit("STATUS_CODE_UNSET"))
    )
    step_rows = st.select(
        F.col("trace_id"),
        F.lit(_KIND_INTERNAL).alias("kind"),
        F.coalesce(F.col("conclusion"), F.lit("")).alias("status_message"),
        _check_run_span_id(
            F.concat(F.col("check_run_id").cast("string"), F.lit("-"), s["name"], F.lit("-s"))
        ).alias("span_id"),
        F.col("job_span_id").alias("parent_span_id"),
        F.col("u.uname").alias("name"),
        F.lit("step").alias("span_type"),
        s_start.alias("start_ts"),
        s_end.alias("end_ts"),
        step_code.alias("status_code"),
        F.lit(None).cast("double").alias("queue_duration_ns"),
        task_status.alias("task_status"),
    )

    cols = [
        "trace_id", "span_id", "parent_span_id", "name", "span_type", "kind",
        "start_ts", "end_ts", "status_code", "status_message",
        "queue_duration_ns", "task_status",
    ]
    return (
        jobs.select(*cols)
        .unionByName(queues.select(*cols))
        .unionByName(step_rows.select(*cols))
    )
