"""merge_agg_state: incremental aggregate refresh == full recompute,
for every split point and for dims present on only one side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.aggregate import merge_agg_state

SPEC = {"n": "sum", "lo": "min", "hi": "max"}


def _agg(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(0, 2000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.col("id").alias("id"),
    ).persist()


@pytest.mark.parametrize("split", [1, 500, 1999])
def test_any_split_equals_full(rows, split):
    merged = merge_agg_state(
        _agg(rows.filter(F.col("id") < split)),
        _agg(rows.filter(F.col("id") >= split)),
        ["k"],
        SPEC,
    )
    full = _agg(rows)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_one_sided_keys(spark):
    # a dim that exists only in state and one only in delta must carry
    # through the outer join unchanged
    state = spark.createDataFrame([("a", 3, 1, 9)], "k string, n long, lo long, hi long")
    delta = spark.createDataFrame([("b", 2, 5, 6)], "k string, n long, lo long, hi long")
    got = {r.k: (r.n, r.lo, r.hi) for r in merge_agg_state(state, delta, ["k"], SPEC).collect()}
    assert got == {"a": (3, 1, 9), "b": (2, 5, 6)}


def test_reassociation_chain(rows):
    # folding three batches one at a time equals one recompute — the
    # multi-commit snapshot-append sequence
    b1 = _agg(rows.filter(F.col("id") < 700))
    b2 = _agg(rows.filter((F.col("id") >= 700) & (F.col("id") < 1400)))
    b3 = _agg(rows.filter(F.col("id") >= 1400))
    merged = merge_agg_state(merge_agg_state(b1, b2, ["k"], SPEC), b3, ["k"], SPEC)
    full = _agg(rows)
    assert merged.exceptAll(full).count() == 0 and full.exceptAll(merged).count() == 0


def test_unmergeable_op_rejected(spark):
    df = spark.createDataFrame([("a", 1)], "k string, n long")
    with pytest.raises(ValueError, match="unmergeable"):
        merge_agg_state(df, df, ["k"], {"n": "median"})
