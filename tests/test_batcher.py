"""batchprocessor analogue: arrival-order batching as a pure projection."""

from collections import Counter

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.batcher import (
    batch_envelopes,
    batch_records,
)


def test_batch_sizes_bounded_and_total_conserved(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("v")).repartition(3)
    b = batch_records(df, 100)
    sizes = Counter(r["batch_id"] for r in b.collect())
    assert sum(sizes.values()) == 1000
    assert all(v <= 100 for v in sizes.values())
    # every batch except each partition's tail is exactly full
    tails = {bid.rsplit("-", 1)[0]: 0 for bid in sizes}
    full = [v for v in sizes.values() if v == 100]
    assert len(sizes) - len(full) <= len(tails)  # ≤ one partial per partition


def test_batch_stamp_adds_no_exchange(spark):
    df = spark.range(500)
    plan = batch_records(df, 64)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection over the mono id


def test_envelopes_ordered_and_bounded(spark):
    df = spark.range(350).select(F.col("id"), (F.col("id") * 2).alias("v"))
    env = batch_envelopes(df, 100, payload_cols=["id", "v"])
    rows = env.collect()
    assert sum(r["n_records"] for r in rows) == 350
    assert all(r["n_records"] <= 100 for r in rows)
    for r in rows:
        ids = [rec["id"] for rec in r["records"]]
        assert ids == sorted(ids)  # arrival order preserved inside the batch
        assert all(rec["v"] == rec["id"] * 2 for rec in r["records"])
