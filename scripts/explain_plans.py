"""Print the formatted physical plans of the headline queries — the
evidence that the pipeline compiles to the plan we designed for:

  q1: scan (ReadSchema pruned to the 6 input columns) → codegen'd parse/
      route projection → 2 BroadcastHashJoins → ONE Exchange
      (hashpartitioning conv_id) feeding the stable-order window
  agg: partial_count/partial_sum before the exchange (map-side combine)
  sinks: no second computation — filters over the routed frame

Usage: python scripts/explain_plans.py [q1|agg|dedup ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentelemetry_collector_contrib_spark.session import get_spark


def main() -> None:
    which = set(sys.argv[1:]) or {"q1", "agg", "dedup"}
    spark = get_spark("explain", master="local[4]", shuffle_partitions=8)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from opentelemetry_collector_contrib_spark.plans.pipeline import build_routed, pipeline_aggregates

    if "q1" in which:
        print("=" * 30, "q1 routed pipeline", "=" * 30)
        build_routed(spark, sf).explain("formatted")
    if "agg" in which:
        print("=" * 30, "per-tool aggregate", "=" * 30)
        routed = build_routed(spark, sf)
        pipeline_aggregates(routed)["agg_per_tool"].explain("formatted")
    if "dedup" in which:
        print("=" * 30, "minhash LSH dedup", "=" * 30)
        from opentelemetry_collector_contrib_spark.operators.dedup import minhash_lsh_dedup_pairs

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        minhash_lsh_dedup_pairs(docs, "doc_id").explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
