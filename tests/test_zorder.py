"""Z-order clustering: key correctness properties and the file-skipping
payoff measured through the snapshot table's own stats pruning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.zorder import (
    cluster_by_zorder,
    zorder_key,
    zorder_sql,
)


def test_key_interleaves_known_bits(spark):
    # x=0b11, y=0b01, bits=2, bounds (0,3): key bits are y1 x1 y0 x0 -> 0b0111
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    got = df.select(
        zorder_key(["x", "y"], [(0, 3), (0, 3)], bits=2).alias("k")
    ).first().k
    assert got == 0b0111


def test_key_locality_monotone_in_box(spark):
    # all points inside a small box have keys within the box's corner keys
    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    k = zorder_key(["x", "y"], [(0, 7), (0, 7)], bits=3)
    rows = df.select("x", "y", k.alias("k")).collect()
    keys = {(r.x, r.y): r.k for r in rows}
    assert len(set(keys.values())) == 64  # bijective on the full grid
    # Morton property: key of (x,y) bounded by keys of box corners it sits in
    assert keys[(0, 0)] == 0 and keys[(7, 7)] == 63


def test_clamp_and_null(spark):
    df = spark.createDataFrame([(99, None)], "x long, y long")
    got = df.select(
        zorder_key(["x", "y"], [(0, 7), (0, 7)], bits=3).alias("k")
    ).first().k
    # x clamps to 7, null y clamps to lo=0 -> same as (7, 0)
    want = spark.createDataFrame([(7, 0)], "x long, y long").select(
        zorder_key(["x", "y"], [(0, 7), (0, 7)], bits=3).alias("k")
    ).first().k
    assert got == want


def test_sql_twin_matches(spark):
    df = spark.range(0, 500).select(
        (F.col("id") * 37 % 256).alias("a"), (F.col("id") * 101 % 256).alias("b")
    )
    df.createOrReplaceTempView("zt")
    via_col = df.select(zorder_key(["a", "b"], [(0, 255), (0, 255)], bits=8).alias("k"))
    via_sql = spark.sql(
        "SELECT "
        + zorder_sql(["a", "b"], [(0, 255), (0, 255)], bits=8).replace("//", "div")
        + " AS k FROM zt"
    )
    assert via_col.exceptAll(via_sql).count() == 0


def test_zorder_prunes_more_files_than_linear_sort(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.plans.snapshots import (
        SnapshotStore,
        prune_files,
        write_snapshot,
    )

    n, files = 40_000, 16
    base = spark.range(0, n).select(
        (F.col("id") * 2654435761 % 2048).alias("a"),
        (F.col("id") * 40503 % 2048).alias("b"),
    )
    # layout 1: classic single-column sort
    linear = base.repartitionByRange(files, "a").sortWithinPartitions("a")
    p1 = str(tmp_path / "linear")
    write_snapshot(linear, p1, mode="overwrite", stats_cols=["a", "b"])
    # layout 2: z-order clustering on both dimensions
    zed = cluster_by_zorder(base, ["a", "b"], [(0, 2047), (0, 2047)], files, bits=11)
    p2 = str(tmp_path / "zed")
    write_snapshot(zed.drop("z_key"), p2, mode="overwrite", stats_cols=["a", "b"])

    snap1, snap2 = SnapshotStore(p1).current(), SnapshotStore(p2).current()
    # b-only stripe: the a-sorted layout cannot prune AT ALL (every file
    # spans the full b range); z-order confines the stripe to the curve
    # blocks whose high b-bits match.
    b_box = [("b", 100, 220)]
    assert len(prune_files(snap1, b_box)) == files
    assert len(prune_files(snap2, b_box)) <= 6
    # a-only stripe: linear is optimal here. `a` holds the LOW interleave
    # position, so its fixed high bits scatter across every combination of
    # b's higher bits — the honest Morton bound for a single low-position
    # stripe is ~files/2, not the b-side's contiguous-block bound.
    a_box = [("a", 100, 220)]
    assert len(prune_files(snap1, a_box)) <= 3
    assert len(prune_files(snap2, a_box)) <= files // 2
    # 2-D box: z-order prunes on BOTH dimensions at once
    box = [("a", 100, 220), ("b", 100, 220)]
    assert len(prune_files(snap2, box)) <= 6
    # and the data under both layouts is identical
    assert (
        spark.read.parquet(*prune_files(SnapshotStore(p2).current(), None))
        .count()
        == n
    )
