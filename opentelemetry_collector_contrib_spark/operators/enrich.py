"""Enrichment: the reference's lookup/attributes processors as broadcast joins.

The reference has NO relational join — its "joins" are per-record map lookups
against small external dimensions (processor/lookupprocessor/processor.go,
README `default_value`). That is exactly Spark broadcast-hash-join territory:
the dim ships once per executor, probe stays in whole-stage codegen, zero
shuffle on the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def lookup(
    df: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """lookupprocessor analogue: left broadcast join + default_value fill.

    `defaults` maps dim column → value used when the key misses (the
    lookupprocessor README's `default: "Unknown"` semantics).
    """
    keys = [key] if isinstance(key, str) else key
    out = df.join(broadcast(dim), on=keys, how="left")
    for col, default in (defaults or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return out


def enrich_transcripts(df: DataFrame, tool_dim: DataFrame, role_dim: DataFrame) -> DataFrame:
    """The fixture pipeline's enrich stage: two broadcast lookups.

    tool_dim deliberately misses one tool ('calc') → default 'Unknown'
    category, 0.0 cost (left-join default_value coverage).
    """
    out = lookup(df, tool_dim, "tool", {"tool_category": "Unknown", "tool_cost_weight": 0.0})
    out = lookup(out, role_dim, "role", {"role_group": "unknown", "severity_default": "info"})
    return out


def resource_detection(
    df: DataFrame,
    detectors: tuple[str, ...] = ("env",),
    env: dict[str, str] | None = None,
    extra: dict[str, str] | None = None,
    override: bool = True,
) -> DataFrame:
    """resourcedetectionprocessor analogue: detectors run ONCE on the driver
    (resource identity is per-process metadata, never per-row work) and the
    resulting attributes are stamped as literal columns — a pure projection,
    zero shuffle, fully inside codegen at any scale.

    Detectors mirror processor/resourcedetectionprocessor/README.md:
      env    — parse OTEL_RESOURCE_ATTRIBUTES ("k=v,k=v", W3C Baggage-lite),
               as internal/resourcedetection/env does.
      system — host.name / os.type, as detectors/system does.
    `env` is an injectable mapping (defaults to os.environ) so detection is
    deterministic under test; `extra` appends literal attributes (the
    processor's `attributes` override list). `override=True` (the reference
    default) makes detected values replace an existing column; False keeps
    existing non-null values and only fills gaps (coalesce).

    Attribute keys are flattened dot->underscore into column names (the
    relational surface for resource attrs used across this package).
    """
    import socket
    import sys

    src = dict(env) if env is not None else dict(__import__("os").environ)
    attrs: dict[str, str] = {}
    for det in detectors:
        if det == "env":
            for pair in src.get("OTEL_RESOURCE_ATTRIBUTES", "").split(","):
                if "=" in pair:
                    k, _, v = pair.partition("=")
                    if k.strip():
                        attrs[k.strip()] = v.strip()
        elif det == "system":
            attrs["host.name"] = src.get("HOSTNAME") or socket.gethostname()
            attrs["os.type"] = {"linux": "linux", "darwin": "darwin", "win32": "windows"}.get(
                sys.platform, sys.platform
            )
        else:
            raise ValueError(f"unknown detector {det!r} (supported: env, system)")
    attrs.update(extra or {})
    cols = set(df.columns)
    for k, v in attrs.items():
        col = k.replace(".", "_")
        if override or col not in cols:
            df = df.withColumn(col, F.lit(v))
        else:
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(v)))
    return df
