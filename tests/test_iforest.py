"""Isolation-forest tests: compiled-expression fidelity vs the pure-Python
traversal, anomaly separation, determinism, and validation errors —
mirroring processor/isolationforestprocessor/isolation_forest_test.go's
scoring-shape assertions."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import iforest


def _cluster(n, seed=1):
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0), rng.gauss(5.0, 1.0)] for _ in range(n)]


def test_c_factor_matches_reference_formula():
    assert iforest.c_factor(0) == 0.0 and iforest.c_factor(1) == 0.0
    n = 50
    expect = 2.0 * (math.log(n - 1) + 0.5772156649) - 2.0 * (n - 1) / n
    assert iforest.c_factor(n) == pytest.approx(expect)


def test_training_deterministic_and_validated():
    data = _cluster(200)
    f1 = iforest.train_isolation_forest(data, num_trees=5, seed=9)
    f2 = iforest.train_isolation_forest(data, num_trees=5, seed=9)
    assert f1 == f2  # frozen dataclasses, full structural equality
    f3 = iforest.train_isolation_forest(data, num_trees=5, seed=10)
    assert f1 != f3
    with pytest.raises(ValueError):
        iforest.train_isolation_forest([])
    with pytest.raises(ValueError):
        iforest.train_isolation_forest([[1.0], [1.0, 2.0]])


def test_compiled_column_matches_python_traversal(spark):
    data = _cluster(300)
    forest = iforest.train_isolation_forest(data, num_trees=7, seed=3)
    probe = _cluster(40, seed=77) + [[9.0, -4.0], [0.0, 5.0]]
    df = spark.createDataFrame(
        [(i, r[0], r[1]) for i, r in enumerate(probe)], ["i", "x", "y"]
    )
    out = iforest.isolation_forest_score(df, ["x", "y"], forest).collect()
    for row in out:
        paths = [iforest.path_length_py(t, [row["x"], row["y"]]) for t in forest.trees]
        expect = 2.0 ** (-(sum(paths) / len(paths)) / forest.expected_path)
        assert row["if_score"] == pytest.approx(round(expect, 6), abs=1e-9)


def test_outlier_scores_above_inliers(spark):
    data = _cluster(500)
    forest = iforest.train_isolation_forest(data, num_trees=15, seed=5)
    rows = [(0, 0.0, 5.0), (1, 0.5, 4.5), (2, 30.0, -30.0)]  # last = far outlier
    df = spark.createDataFrame(rows, ["i", "x", "y"])
    out = {r["i"]: r["if_score"] for r in iforest.isolation_forest_score(df, ["x", "y"], forest).collect()}
    assert out[2] > out[0] and out[2] > out[1]
    assert out[2] > 0.6  # isolates near the root -> strong score


def test_feature_width_mismatch_raises(spark):
    forest = iforest.train_isolation_forest(_cluster(50), num_trees=3)
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError):
        iforest.isolation_forest_score(df, ["x"], forest)
