"""HLL sketch rollup guarantees: lossless merge + bounded error.

DuckDB cannot reproduce DataSketches binary state, so this family is
pytest-gated (like the exponential→native-histogram kernel): the merge
identity is checked EXACTLY and the accuracy against exact distinct is
checked within the published HLL error bound.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.sketches import (
    distinct_sketch_rollup,
    merge_sketch_rollup,
    sketch_estimates,
)

LG_K = 12


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet").withColumn(
        "day", F.date_trunc("day", "ts")
    )


def test_merged_hourly_equals_direct_daily(spark, events):
    hourly = distinct_sketch_rollup(
        events,
        ["day", F.date_trunc("hour", "ts").alias("hour"), "event_type"],
        "user_id",
        lg_k=LG_K,
    )
    rolled = sketch_estimates(merge_sketch_rollup(hourly, ["day", "event_type"]))
    direct = sketch_estimates(
        distinct_sketch_rollup(events, ["day", "event_type"], "user_id", lg_k=LG_K)
    )
    a = {
        (r.day, r.event_type): (r.distinct_estimate, r.n_rows)
        for r in rolled.collect()
    }
    b = {
        (r.day, r.event_type): (r.distinct_estimate, r.n_rows)
        for r in direct.collect()
    }
    assert a == b  # lossless merge: identical estimates AND row counts


def test_estimates_within_hll_error_bound(spark, events):
    est = {
        r.event_type: r.distinct_estimate
        for r in sketch_estimates(
            distinct_sketch_rollup(events, ["event_type"], "user_id", lg_k=LG_K)
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    # published HLL relative standard error ~1.04/sqrt(2^lg_k); allow 3 sigma
    bound = 3 * 1.04 / math.sqrt(2**LG_K)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, bound * n), (k, est[k], n)


def test_global_rollup_from_fine_tier(spark, events):
    """The cube shape: the global distinct comes from the stored fine
    tier by one more union, never from raw data."""
    fine = distinct_sketch_rollup(events, ["day", "event_type"], "user_id", lg_k=LG_K)
    total = sketch_estimates(
        fine.groupBy().agg(
            F.hll_union_agg("hll").alias("hll"), F.sum("n_rows").alias("n_rows")
        )
    ).collect()[0]
    exact_total = events.select(F.count_distinct("user_id")).collect()[0][0]
    bound = 3 * 1.04 / math.sqrt(2**LG_K)
    assert abs(total.distinct_estimate - exact_total) <= max(2, bound * exact_total)
    assert total.n_rows == events.count()


# ---------------------------------------------------------------------------
# DDSketch quantile rollups: exact merge + relative-error bound
# ---------------------------------------------------------------------------

from opentelemetry_collector_contrib_spark.operators.sketches import (  # noqa: E402
    merge_quantile_rollup,
    quantile_estimates,
    quantile_sketch_rollup,
)

ALPHA = 0.01


def _map_key(df, keys):
    return {
        tuple(getattr(r, k) for k in keys): (sorted(r.buckets.items()), r.zero_n, r.n_rows)
        for r in df.collect()
    }


def test_quantile_merge_is_exact(spark, events):
    hourly = quantile_sketch_rollup(
        events,
        ["day", F.date_trunc("hour", "ts").alias("hour"), "event_type"],
        "value",
        alpha=ALPHA,
    )
    rolled = merge_quantile_rollup(hourly, ["day", "event_type"])
    direct = quantile_sketch_rollup(events, ["day", "event_type"], "value", alpha=ALPHA)
    # merge identity is EXACT: identical bucket maps, not just estimates
    assert _map_key(rolled, ["day", "event_type"]) == _map_key(direct, ["day", "event_type"])


def test_quantile_estimates_within_alpha(spark, events):
    est = quantile_estimates(
        quantile_sketch_rollup(events, ["event_type"], "value", alpha=ALPHA),
        [0.5, 0.95, 0.99],
        alpha=ALPHA,
    )
    got = {r.event_type: (r.p50, r.p95, r.p99) for r in est.collect()}
    vals = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for et, xs in vals.items():
        xs.sort()
        for q, e in zip([0.5, 0.95, 0.99], got[et]):
            exact = xs[math.floor(q * (len(xs) - 1))]
            # DDSketch guarantee: relative error <= alpha (float slack 1e-9)
            assert abs(e - exact) <= ALPHA * exact + 1e-9, (et, q, e, exact)


def test_quantile_zero_and_negative_handling(spark):
    df = spark.createDataFrame(
        [("k", 0.0)] * 5 + [("k", 10.0)] * 5, "g string, value double"
    )
    sk = quantile_estimates(
        quantile_sketch_rollup(df, ["g"], "value", alpha=ALPHA), [0.25, 0.9], alpha=ALPHA
    ).collect()[0]
    assert sk.zero_n == 5 and sk.n_rows == 10
    assert sk.p25 == 0.0
    assert abs(sk.p90 - 10.0) <= ALPHA * 10.0 + 1e-9

    neg = spark.createDataFrame([("k", -1.0)], "g string, value double")
    with pytest.raises(Exception, match="negative value"):
        quantile_sketch_rollup(neg, ["g"], "value").collect()


def test_quantile_reassociation_chain(spark, events):
    """Folding shards one at a time equals one direct sketch — the
    multi-commit snapshot-append sequence (associativity)."""
    parts = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
    shards = [
        quantile_sketch_rollup(p, ["event_type"], "value", alpha=ALPHA) for p in parts
    ]
    folded = merge_quantile_rollup(
        merge_quantile_rollup(shards[0].unionByName(shards[1]), ["event_type"]).unionByName(shards[2]),
        ["event_type"],
    )
    direct = quantile_sketch_rollup(events, ["event_type"], "value", alpha=ALPHA)
    assert _map_key(folded, ["event_type"]) == _map_key(direct, ["event_type"])


# ---------------------------------------------------------------------------
# Count-Min sketches
# ---------------------------------------------------------------------------


def _cm_key(df, keys):
    return {
        tuple(r[k] for k in keys): (dict(r["cm"]), r["n_rows"]) for r in df.collect()
    }


def test_countmin_merge_is_exact(spark, events):
    from opentelemetry_collector_contrib_spark.operators.sketches import (
        countmin_sketch_rollup,
        merge_countmin_rollup,
    )

    hourly = countmin_sketch_rollup(
        events.withColumn("hour", F.date_trunc("hour", "ts")),
        ["day", "hour", "event_type"],
        "user_id",
    )
    merged = merge_countmin_rollup(hourly, ["day", "event_type"])
    direct = countmin_sketch_rollup(events, ["day", "event_type"], "user_id")
    assert _cm_key(merged, ["day", "event_type"]) == _cm_key(direct, ["day", "event_type"])


def test_countmin_one_sided_and_tight_on_fixture(spark, events):
    """estimate >= true count always; with width 1024 >> distinct users the
    overshoot on this fixture is tiny (<= e/width * n_rows bound)."""
    from opentelemetry_collector_contrib_spark.operators.sketches import (
        countmin_estimates,
        countmin_sketch_rollup,
    )

    W, D = 1024, 4
    sk = countmin_sketch_rollup(events, ["event_type"], "user_id", width=W, depth=D)
    items = ["1", "7", "42", "999999"]  # incl. a never-seen item
    est = {
        (r["event_type"], r["item"]): r["cm_est"]
        for r in countmin_estimates(sk, items, width=W, depth=D).collect()
    }
    true = {
        (r["event_type"], str(r["user_id"])): r["n"]
        for r in events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    import math

    for (etype, item), e in est.items():
        t = true.get((etype, item), 0)
        assert e >= t, (etype, item, e, t)
        assert e - t <= math.e / W * totals[etype] * 3  # 3x slack on the bound
    # the never-seen item should estimate ~0 with this width
    assert all(est[(k, "999999")] <= math.e / W * totals[k] * 3 for k in totals)


def test_countmin_null_items_and_reassociation(spark):
    from opentelemetry_collector_contrib_spark.operators.sketches import (
        countmin_sketch_rollup,
        merge_countmin_rollup,
    )

    df = spark.createDataFrame(
        [("g", "a"), ("g", "a"), ("g", None), ("h", None)], "grp string, item string"
    )
    sk = countmin_sketch_rollup(df, ["grp"], "item")
    rows = {r["grp"]: r for r in sk.collect()}
    assert rows["g"]["n_rows"] == 3  # NULL counts toward rows
    assert sum(rows["g"]["cm"].values()) == 2 * 4  # 2 items x depth cells
    assert rows["h"]["cm"] == {} and rows["h"]["n_rows"] == 1  # all-NULL group kept
    # splitting the build arbitrarily and folding in any order is identical
    df_i = spark.createDataFrame(
        [(0, "g", "a"), (1, "g", "a"), (2, "g", None), (3, "h", None)],
        "i long, grp string, item string",
    )
    a = countmin_sketch_rollup(df_i.filter("i < 2"), ["grp"], "item")
    b = countmin_sketch_rollup(df_i.filter("i >= 2"), ["grp"], "item")
    folded = merge_countmin_rollup(a.unionByName(b), ["grp"])
    assert _cm_key(folded, ["grp"]) == _cm_key(sk, ["grp"])
