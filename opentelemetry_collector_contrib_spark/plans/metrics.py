"""Pipeline run metrics — the obsreport/componentstatus analogue.

The reference instruments every component with obsreport counters
(accepted/refused/dropped items per processor, queue sizes per exporter)
and the testbed asserts sent==received from them
(testbed/testbed/validator.go:68-117). Our batch analogue: one metrics
object per run recording per-stage wall times, per-sink row counts, and
the lineage run id — written as JSON next to the lineage manifest so a
rerun's resume decisions and the run's throughput are auditable together.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class PipelineMetrics:
    run_id: str
    started_at: float = field(default_factory=time.time)
    stages: dict[str, float] = field(default_factory=dict)      # name -> seconds
    sink_rows: dict[str, int] = field(default_factory=dict)     # sink -> rows written
    input_rows: int = 0
    resumed_sinks: list[str] = field(default_factory=list)

    def time_stage(self, name: str):
        """Context manager: with metrics.time_stage('parse'): ..."""
        metrics = self

        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                metrics.stages[name] = round(
                    metrics.stages.get(name, 0.0) + time.perf_counter() - self.t0, 3
                )
                return False

        return _T()

    def record_sink(self, name: str, rows: int, resumed: bool = False) -> None:
        self.sink_rows[name] = rows
        if resumed:
            self.resumed_sinks.append(name)

    @property
    def rows_per_sec(self) -> float | None:
        total = sum(self.stages.values())
        return round(self.input_rows / total, 1) if total and self.input_rows else None

    def to_dict(self) -> dict:
        return {
            "run_id": self.run_id,
            "started_at": self.started_at,
            "stages": self.stages,
            "sink_rows": self.sink_rows,
            "input_rows": self.input_rows,
            "resumed_sinks": self.resumed_sinks,
            "rows_per_sec": self.rows_per_sec,
        }

    def write(self, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.to_dict(), f, indent=2)
        os.replace(tmp, path)
        return path
