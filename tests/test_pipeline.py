"""End-to-end pipeline tests: stable ordering, enrich defaults, sink writes,
lineage resume — the golden-file / testbed correctness mirror (SURVEY.md §5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.route import FIXTURE_ROUTES, sink_frames
from opentelemetry_collector_contrib_spark.plans.lineage import LineageManifest, write_sinks_resumable


def test_stable_order_matches_turn_idx(routed_t1):
    """row_number over (conv_id ORDER BY turn_idx, ts) must equal turn_idx+1 —
    turn_idx is dense per conv in the fixture, so this is a full determinism
    check of the ordering window over shuffled input."""
    bad = routed_t1.filter(F.col("turn_rn") != F.col("turn_idx") + 1).count()
    assert bad == 0


def test_enrich_defaults(routed_t1):
    """'calc' is missing from tool_dim → category 'Unknown', weight 0.0
    (lookupprocessor default_value)."""
    calc = routed_t1.filter(F.col("tool") == "calc")
    assert calc.count() > 0
    assert calc.filter(F.col("tool_category") != "Unknown").count() == 0
    assert calc.filter(F.col("tool_cost_weight") != 0.0).count() == 0
    known = routed_t1.filter(F.col("tool") == "search")
    assert known.filter(F.col("tool_category") != "retrieval").count() == 0


def test_per_turn_text_equality(spark, routed_t1, t1):
    """North-rule invariant: after the full pipeline, (conv_id, turn_idx) →
    text is byte-identical to the source table."""
    src = t1.select("conv_id", "turn_idx", F.col("text").alias("src_text"))
    joined = routed_t1.select("conv_id", "turn_idx", "text").join(src, ["conv_id", "turn_idx"])
    assert joined.filter(F.col("text") != F.col("src_text")).count() == 0
    assert joined.count() == t1.count()


def test_sink_writes_and_lineage_resume(spark, routed_t1, tmp_path):
    base = str(tmp_path / "sinks")
    sinks = sink_frames(routed_t1, FIXTURE_ROUTES)
    paths = write_sinks_resumable(routed_t1, sinks, base)
    counts1 = {name: spark.read.parquet(p).count() for name, p in paths.items()}
    # total of move sinks == input rows
    total = routed_t1.count()
    assert counts1["errors"] + counts1["tool_events"] + counts1["general"] == total

    # manifest recorded all sinks
    m = LineageManifest(os.path.join(base, "_lineage.json"))
    for s in ["errors", "tool_events", "general", "human_turns"]:
        assert m.is_committed(s)

    # rerun: all sinks skipped (idempotent resume), data unchanged
    paths2 = write_sinks_resumable(routed_t1, sinks, base)
    counts2 = {name: spark.read.parquet(p).count() for name, p in paths2.items()}
    assert counts1 == counts2


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    oracles = e.oracle_sql()
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
