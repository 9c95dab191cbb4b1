"""GitLab CI telemetry — ``receiver/gitlabreceiver``'s pipeline-webhook →
trace conversion (traces_event_handling.go:44-380, model.go:66-240) as
native projections.

One pipeline webhook carries the pipeline attributes plus its ``builds``
(jobs) array; stages do NOT get their own webhook events and are DERIVED
by grouping jobs per stage name (newStages :237-259): status = the first
build in array order, start = earliest non-empty job start, finish =
latest non-empty job finish; a stage whose start stays empty (queued,
never ran) is skipped (:85-92).

Deterministic ids hash the RAW GitLab time STRINGS (the receiver cannot
mint ids mid-run, so it derives them from finished/started timestamps —
traces_event_handling.go:152-236):

  trace    = sha256("{pipeline_id}t{finished_at}")[:16 bytes]
  pipeline = sha256("{pipeline_id}{finished_at}")[8:16]
  stage    = sha256("{pipeline_id}{stage}{stage_started_at}")[8:16]
  job      = sha256("{job_id}{job_started_at}")[8:16]

Topology: pipeline root (kind SERVER, name = pipeline name or the commit
title fallback, model.go:71-76), stages under it, jobs under their
stage; a job emits only when its ``finished_at`` is non-empty
(processJobSpans :107-129). Status map (setSpanStatus :347-358):
success → OK, failed/canceled → ERROR, skipped/other → UNSET.

Time strings use GitLab's webhook format ``yyyy-MM-dd HH:mm:ss UTC``;
with that fixed-width format, lexicographic min/max over the strings IS
chronological min/max, so stage-window derivation stays inside one
codegen projection — per-pipeline stage aggregation happens in the
builds array itself (array_distinct + filter), NOT via explode+groupBy:
zero shuffle at 10^12 pipelines. The only explode is the final job
fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GL_TS = "yyyy-MM-dd HH:mm:ss 'UTC'"
_KIND = "SPAN_KIND_SERVER"


def _span_id(input_str: Column) -> Column:
    return F.substring(F.sha2(input_str, 256), 17, 16)


def _trace_id(pipeline_id: Column, finished_at: Column) -> Column:
    return F.substring(
        F.sha2(F.concat(pipeline_id.cast("string"), F.lit("t"), finished_at), 256), 1, 32
    )


def _status_code(status: Column) -> Column:
    low = F.lower(F.coalesce(status, F.lit("")))
    return (
        F.when(low == "success", F.lit("STATUS_CODE_OK"))
        .when(low.isin("failed", "canceled"), F.lit("STATUS_CODE_ERROR"))
        .otherwise(F.lit("STATUS_CODE_UNSET"))
    )


def _us(gl_time: Column) -> Column:
    """Parse a GitLab webhook time string to epoch micros; empty → NULL
    (ANSI-safe: gated, never throws)."""
    ok = gl_time.rlike(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} UTC$")
    return F.when(ok, F.unix_micros(F.to_timestamp(gl_time, _GL_TS)))


def pipeline_spans(df: DataFrame) -> DataFrame:
    """PipelineEvent rows → pipeline + stage + job span rows.

    Input columns: pipeline_id (bigint), pipeline_name, commit_title,
    status, created_at, finished_at (GitLab time strings), and
    builds: array<struct<id bigint, stage string, name string,
    status string, started_at string, finished_at string>>.
    """
    pid = F.col("pipeline_id")
    fin = F.col("finished_at")
    trace = _trace_id(pid, fin)
    p_span = _span_id(F.concat(pid.cast("string"), fin))
    builds = F.col("builds")

    # stages derived in-array: per distinct stage name, first-build status,
    # lexicographic (== chronological) min start / max finish over
    # non-empty strings
    def stage_struct(st: Column) -> Column:
        mine = F.filter(builds, lambda b: b["stage"] == st)
        starts = F.filter(F.transform(mine, lambda b: b["started_at"]), lambda s: s != "")
        fins = F.filter(F.transform(mine, lambda b: b["finished_at"]), lambda s: s != "")
        return F.struct(
            st.alias("stage"),
            F.element_at(mine, 1)["status"].alias("status"),
            F.coalesce(F.array_min(starts), F.lit("")).alias("started_at"),
            F.coalesce(F.array_max(fins), F.lit("")).alias("finished_at"),
        )

    stages_arr = F.transform(
        F.array_distinct(F.transform(builds, lambda b: b["stage"])), stage_struct
    )

    base = df.select(
        pid, fin, builds,
        trace.alias("trace_id"), p_span.alias("p_span"),
        stages_arr.alias("stages"),
        F.when(F.col("pipeline_name") != "", F.col("pipeline_name"))
        .otherwise(F.col("commit_title"))
        .alias("p_name"),
        F.col("status").alias("p_status"),
        F.col("created_at").alias("p_created"),
    )

    cols = [
        "trace_id", "span_id", "parent_span_id", "name", "span_type", "kind",
        "start_us", "end_us", "status_code", "status", "job_id", "stage",
    ]
    pipes = base.select(
        "trace_id",
        F.col("p_span").alias("span_id"),
        F.lit(None).cast("string").alias("parent_span_id"),
        F.col("p_name").alias("name"),
        F.lit("pipeline").alias("span_type"),
        F.lit(_KIND).alias("kind"),
        _us(F.col("p_created")).alias("start_us"),
        _us(F.col("finished_at")).alias("end_us"),
        _status_code(F.col("p_status")).alias("status_code"),
        F.col("p_status").alias("status"),
        F.lit(None).cast("bigint").alias("job_id"),
        F.lit(None).cast("string").alias("stage"),
    )

    st = base.withColumn("s", F.explode("stages")).filter(F.col("s.started_at") != "")
    stage_span = _span_id(
        F.concat(F.col("pipeline_id").cast("string"), F.col("s.stage"), F.col("s.started_at"))
    )
    stages = st.select(
        "trace_id",
        stage_span.alias("span_id"),
        F.col("p_span").alias("parent_span_id"),
        F.col("s.stage").alias("name"),
        F.lit("stage").alias("span_type"),
        F.lit(_KIND).alias("kind"),
        _us(F.col("s.started_at")).alias("start_us"),
        _us(F.col("s.finished_at")).alias("end_us"),
        _status_code(F.col("s.status")).alias("status_code"),
        F.col("s.status").alias("status"),
        F.lit(None).cast("bigint").alias("job_id"),
        F.col("s.stage").alias("stage"),
    )

    jb = base.withColumn("b", F.explode("builds")).filter(F.col("b.finished_at") != "")
    # parent = the job's stage span id, rebuilt from the same derived
    # stage start (stages map lookup in the reference, :117-121)
    b_stage = F.col("b.stage")
    mine = F.filter(F.col("builds"), lambda x: x["stage"] == b_stage)
    stage_start = F.coalesce(
        F.array_min(F.filter(F.transform(mine, lambda x: x["started_at"]), lambda s: s != "")),
        F.lit(""),
    )
    jobs = jb.select(
        "trace_id",
        _span_id(F.concat(F.col("b.id").cast("string"), F.col("b.started_at"))).alias("span_id"),
        _span_id(
            F.concat(F.col("pipeline_id").cast("string"), b_stage, stage_start)
        ).alias("parent_span_id"),
        F.col("b.name").alias("name"),
        F.lit("job").alias("span_type"),
        F.lit(_KIND).alias("kind"),
        _us(F.col("b.started_at")).alias("start_us"),
        _us(F.col("b.finished_at")).alias("end_us"),
        _status_code(F.col("b.status")).alias("status_code"),
        F.col("b.status").alias("status"),
        F.col("b.id").alias("job_id"),
        b_stage.alias("stage"),
    )

    return pipes.select(*cols).unionByName(stages.select(*cols)).unionByName(jobs.select(*cols))
