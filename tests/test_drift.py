"""PSI drift gate: zero on identical distributions, large on a shift."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.drift import psi_drift


def _psi(df):
    return sum(r.psi_term for r in df.collect())


def test_identical_distributions_have_near_zero_psi(spark):
    base = spark.range(2000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 2 == 0).alias("cur"),
    )
    out = psi_drift(base, F.col("x"), F.col("cur"))
    assert abs(_psi(out)) < 1e-9  # same proportions bucket-by-bucket


def test_shifted_distribution_flags_drift(spark):
    # reference uniform on [0, 100); current uniform on [50, 150)
    ref = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("x"), F.lit(False).alias("cur")
    )
    cur = spark.range(1000).select(
        (F.col("id") % 100 + 50).cast("double").alias("x"), F.lit(True).alias("cur")
    )
    out = psi_drift(ref.unionByName(cur), F.col("x"), F.col("cur"))
    assert _psi(out) > 0.25  # investigate-level drift
    rows = {r.bucket: r for r in out.collect()}
    # the disjoint tails: bucket 0 is reference-only, bucket 9 current-only
    assert rows[0].n_cur == 0 and rows[0].n_ref > 0
    assert rows[9].n_ref == 0 and rows[9].n_cur > 0


def test_null_features_excluded_and_constant_feature_single_bucket(spark):
    df = spark.createDataFrame(
        [(5.0, False), (5.0, True), (None, True)], "x double, cur boolean"
    )
    out = psi_drift(df, F.col("x"), F.col("cur")).collect()
    assert len(out) == 1 and out[0].bucket == 0
    assert out[0].n_ref == 1 and out[0].n_cur == 1


def test_categorical_drift_tracks_nulls_and_new_categories(spark):
    from opentelemetry_collector_contrib_spark.operators.drift import (
        psi_drift_categorical,
    )

    df = spark.createDataFrame(
        [("a", False)] * 8 + [("b", False)] * 2
        + [("a", True)] * 2 + [("b", True)] * 4 + [(None, True)] * 4,
        "cat string, cur boolean",
    )
    out = {r.cat: r for r in psi_drift_categorical(df, F.col("cat"), F.col("cur")).collect()}
    assert set(out) == {"a", "b", "<null>"}
    assert out["<null>"].n_ref == 0 and out["<null>"].n_cur == 4
    assert out["<null>"].psi_term > 0  # NULL surge counts as drift
    assert sum(r.psi_term for r in out.values()) > 0.25


def test_ks_drift_detects_shift_and_zero_on_identical(spark):
    from opentelemetry_collector_contrib_spark.operators.drift import ks_drift

    # alternate FULL 0-99 sweeps between sides so both ECDFs are identical
    # (a per-row id%2 split would give evens to one side, odds to the other
    # — genuinely different distributions with a real 1/50 gap)
    same = spark.range(2000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        ((F.col("id") / 100).cast("int") % 2 == 0).alias("cur"),
    )
    r = ks_drift(same, F.col("x"), F.col("cur")).collect()[0]
    assert r.ks_stat == 0.0 and r.n_ref == 1000 and r.n_cur == 1000

    ref = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("x"), F.lit(False).alias("cur")
    )
    cur = spark.range(1000).select(
        (F.col("id") % 100 + 50).cast("double").alias("x"), F.lit(True).alias("cur")
    )
    r2 = ks_drift(ref.unionByName(cur), F.col("x"), F.col("cur")).collect()[0]
    # disjoint halves overlap 50%: the ECDF gap peaks at 0.5 where the
    # reference has finished its exclusive low range
    assert abs(r2.ks_stat - 0.5) < 0.02


def test_window_diff_verdicts_and_noise_floor(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.drift import window_diff

    rows = (
        [("new_k", True)] * 3
        + [("gone_k", False)] * 4
        + [("grew_k", False)] * 2 + [("grew_k", True)] * 5
        + [("stable_k", False)] * 3 + [("stable_k", True)] * 3
        + [("noise_k", True)] * 2  # below min_total=3 → dropped
    )
    df = spark.createDataFrame(rows, "k string, cur boolean")
    out = {r["k"]: r for r in window_diff(df, ["k"], F.col("cur"), min_total=3).collect()}
    assert "noise_k" not in out
    assert out["new_k"]["status"] == "new" and out["new_k"]["ratio"] is None
    assert out["gone_k"]["status"] == "gone" and out["gone_k"]["ratio"] == 0.0
    assert out["grew_k"]["status"] == "grew" and out["grew_k"]["ratio"] == 2.5
    assert out["stable_k"]["status"] == "stable" and out["stable_k"]["ratio"] == 1.0
    # one hash aggregate, no joins
    plan = window_diff(df, ["k"], F.col("cur"))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and plan.count("Exchange") == 1


def test_embedding_drift_identical_and_rotated(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.drift import embedding_drift

    # group 'same': both sides identical direction → cos 1.0
    # group 'flip': current is the negation → cos -1.0
    # group 'only_ref': no current rows → NULL cosine, n_cur 0
    rows = [
        ("same", False, [1.0, 0.0]), ("same", True, [2.0, 0.0]),
        ("flip", False, [1.0, 1.0]), ("flip", True, [-1.0, -1.0]),
        ("only_ref", False, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "g string, cur boolean, embedding array<double>")
    out = {r["g"]: r for r in embedding_drift(df, "g", F.col("cur"), vec_col="embedding").collect()}
    assert out["same"]["centroid_cos"] == 1.0
    assert out["flip"]["centroid_cos"] == -1.0
    assert out["only_ref"]["centroid_cos"] is None and out["only_ref"]["n_cur"] == 0
    assert out["same"]["n_ref"] == 1 and out["same"]["n_cur"] == 1
