"""Incremental merge (latest-wins upsert): correctness and idempotency."""

from __future__ import annotations

from foresttime_builder_spark.operators.upsert import merge_latest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_latest_picks_newest(spark):
    base = spark.createDataFrame(
        [("k1", 1, "old"), ("k2", 1, "keep")], "k STRING, v INT, payload STRING"
    )
    updates = spark.createDataFrame(
        [("k1", 2, "new"), ("k3", 1, "ins")], "k STRING, v INT, payload STRING"
    )
    got = _rows(merge_latest(base, updates, ["k"], "v"))
    assert got == [("k1", 2, "new"), ("k2", 1, "keep"), ("k3", 1, "ins")]


def test_merge_latest_tie_break(spark):
    base = spark.createDataFrame([("k1", 1, 10, "a")], "k STRING, v INT, id INT, p STRING")
    updates = spark.createDataFrame(
        [("k1", 1, 11, "b")], "k STRING, v INT, id INT, p STRING"
    )
    got = _rows(merge_latest(base, updates, ["k"], "v", tie_break=["id"]))
    assert got == [("k1", 1, 11, "b")]


def test_merge_latest_idempotent(spark):
    base = spark.createDataFrame(
        [("k1", 1, "x"), ("k2", 3, "y")], "k STRING, v INT, p STRING"
    )
    updates = spark.createDataFrame([("k1", 2, "z")], "k STRING, v INT, p STRING")
    once = merge_latest(base, updates, ["k"], "v")
    twice = merge_latest(once, updates, ["k"], "v")
    assert _rows(once) == _rows(twice)
