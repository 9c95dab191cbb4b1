"""Shared DuckDB SQL fragments for the transcript pipeline oracles.

The CTE chain mirrors plans/pipeline.build_routed stage by stage
(parse → enrich → route → stable order) as an INDEPENDENT SQL
implementation over the same parquet bytes — the golden-file oracle
(SURVEY.md §5) in executable form.
"""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TOOL_DIM = os.path.join(REPO, "fixtures_data", "dims", "tool_dim.parquet")
ROLE_DIM = os.path.join(REPO, "fixtures_data", "dims", "role_dim.parquet")


def active_transcripts_path() -> str:
    """Transcript parquet for the ACTIVE scale factor: derives the tier
    from ``SPARK_GRAFT_SF_DIR`` exactly as the Spark side's
    ``tier_for_sf_dir(sf_dir)`` does (check_parity and the driver both
    set sf_dir from the same env/default), so the two engines always
    read the same bytes at EVERY sf — the round-4 verdict flagged six
    spurious sf0.001 FAILs caused by oracles pinning the t2 path while
    the Spark side tiered off ``sf_dir``. Unset env → sf0.01 → t2, the
    driver's contract tier, so driver behavior is byte-identical.
    Sharded tiers materialize as a directory; DuckDB reads those via a
    ``*.parquet`` glob."""
    from ..fixtures import ensure_tier, tier_for_sf_dir

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    path = ensure_tier(tier_for_sf_dir(sf_dir))
    if os.path.isdir(path):
        path = os.path.join(path, "*.parquet")
    return path


def __getattr__(name: str) -> str:
    """PEP 562: ``T2_TRANSCRIPTS`` stays importable (every oracle builder
    does a call-time ``from .transcript_sql import T2_TRANSCRIPTS``) but
    now resolves to the ACTIVE tier's path on each import instead of a
    frozen t2 constant."""
    if name == "T2_TRANSCRIPTS":
        return active_transcripts_path()
    raise AttributeError(name)

KV_RE = r"^LOG lvl=(\w+) tool=(\w+) latency_ms=(\d+) status=(ok|err)$"
SYSLOG_RE = r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}) \[(\w+)\] (\w+): (.*)$"
JSON_RE = r'^\{"event":"(\w+)","tokens":(\d+),"model":"([\w-]+)"\}$'

ROW_COLS_SQL = "conv_id, turn_idx, turn_rn, role, tool, text, pattern_id, route_id, tool_category, role_group"


def pipeline_cte() -> str:
    return f"""
WITH t AS (SELECT * FROM read_parquet('{active_transcripts_path()}')),
parsed AS (
  SELECT t.*,
    CASE WHEN regexp_matches(text, '{KV_RE}') THEN 'kv'
         WHEN regexp_matches(text, '{SYSLOG_RE}') THEN 'syslog'
         WHEN regexp_matches(text, '{JSON_RE}') THEN 'json'
         ELSE 'raw' END AS pattern_id,
    CASE WHEN regexp_matches(text, '{KV_RE}') THEN regexp_extract(text, '{KV_RE}', 1)
         WHEN regexp_matches(text, '{SYSLOG_RE}') THEN regexp_extract(text, '{SYSLOG_RE}', 2) END AS sev,
    CASE WHEN regexp_matches(text, '{KV_RE}') THEN CAST(regexp_extract(text, '{KV_RE}', 3) AS BIGINT) END AS latency_ms,
    CASE WHEN regexp_matches(text, '{KV_RE}') THEN regexp_extract(text, '{KV_RE}', 4) END AS status,
    CASE WHEN regexp_matches(text, '{JSON_RE}') THEN regexp_extract(text, '{JSON_RE}', 1) END AS event_name,
    CASE WHEN regexp_matches(text, '{JSON_RE}') THEN CAST(regexp_extract(text, '{JSON_RE}', 2) AS BIGINT) END AS tokens,
    CASE WHEN regexp_matches(text, '{JSON_RE}') THEN regexp_extract(text, '{JSON_RE}', 3) END AS model,
    CASE WHEN regexp_matches(text, '{SYSLOG_RE}') THEN regexp_extract(text, '{SYSLOG_RE}', 3) END AS component,
    CASE WHEN regexp_matches(text, '{SYSLOG_RE}') THEN regexp_extract(text, '{SYSLOG_RE}', 4) END AS message,
    CASE WHEN regexp_matches(text, '{SYSLOG_RE}') THEN regexp_extract(text, '{SYSLOG_RE}', 1) END AS log_ts
  FROM t
),
enriched AS (
  SELECT p.*,
    coalesce(td.tool_category, 'Unknown') AS tool_category,
    coalesce(td.tool_cost_weight, 0.0) AS tool_cost_weight,
    coalesce(rd.role_group, 'unknown') AS role_group,
    coalesce(rd.severity_default, 'info') AS severity_default
  FROM parsed p
  LEFT JOIN read_parquet('{TOOL_DIM}') td USING (tool)
  LEFT JOIN read_parquet('{ROLE_DIM}') rd USING (role)
),
routed AS (
  SELECT e.*,
    CASE WHEN status = 'err' THEN 'errors'
         WHEN tool <> 'none' AND role = 'assistant' THEN 'tool_events'
         ELSE 'general' END AS route_id,
    (role_group = 'human') AS copy_human_turns
  FROM enriched e
),
ordered AS (
  SELECT r.*, CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS INT) AS turn_rn
  FROM routed r
)
"""
