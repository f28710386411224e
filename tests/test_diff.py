"""Snapshot diff (CDC) classification contract."""

from __future__ import annotations

from foresttime_builder_spark.operators.diff import snapshot_diff


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 21), (4, "D", 40), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {
        r.k: r.change
        for r in snapshot_diff(old, new, keys=["k"], compare_cols=["s", "v"]).collect()
    }
    # 1 unchanged -> not emitted; 2 value update; 3 deleted; 4 string
    # update; 5 inserted
    assert got == {2: "update", 3: "delete", 4: "update", 5: "insert"}


def test_snapshot_diff_composite_keys_and_nulls(spark):
    old = spark.createDataFrame(
        [(1, "x", None), (1, "y", 5)], "k long, kk string, v long"
    )
    new = spark.createDataFrame(
        [(1, "x", None), (1, "y", None)], "k long, kk string, v long"
    )
    got = {
        (r.k, r.kk): r.change
        for r in snapshot_diff(
            old, new, keys=["k", "kk"], compare_cols=["v"]
        ).collect()
    }
    # (1,x) unchanged (null==null under the hash rendering); (1,y) 5->null
    assert got == {(1, "y"): "update"}
