"""Driver-contract registries: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame query plus (where SQL-expressible) a DuckDB
oracle implementing the identical algorithm."""

from __future__ import annotations

from . import datapipe, profiles_reg, sampling_reg, telemetry  # noqa: F401
