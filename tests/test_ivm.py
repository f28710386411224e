"""IVM contract: delta algebra vs full recompute on every change kind,
stored-view passthrough, zero-count group drop, float rejection."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from foresttime_builder_spark.operators.ivm import incremental_group_sum

OLD = [
    (1, "g1", 10),
    (2, "g1", 20),
    (3, "g2", 30),   # deleted in new
    (4, "g2", 40),   # value updated in new
    (5, "g3", 50),   # moves g3 -> g1 in new (g3 empties out)
]
NEW = [
    (1, "g1", 10),   # unchanged
    (2, "g1", 20),   # unchanged
    (4, "g2", 45),
    (5, "g1", 50),
    (6, "g4", 60),   # insert into a brand-new group
]
COLS = ["k", "g", "v"]


def _full(rows):
    agg: dict = {}
    for _, g, v in rows:
        t, n = agg.get(g, (0, 0))
        agg[g] = (t + v, n + 1)
    return agg


def _run(spark, old_agg=None):
    old = spark.createDataFrame(OLD, COLS)
    new = spark.createDataFrame(NEW, COLS)
    rows = incremental_group_sum(old, new, ["k"], "g", "v", old_agg=old_agg)
    return {r["g"]: (r["total"], r["n_rows"]) for r in rows.collect()}


def test_matches_full_recompute(spark):
    assert _run(spark) == _full(NEW)


def test_emptied_group_dropped(spark):
    assert "g3" not in _run(spark)


def test_stored_view_passthrough(spark):
    old_agg = (
        spark.createDataFrame(OLD, COLS)
        .groupBy("g")
        .agg(
            F.sum("v").cast("long").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    assert _run(spark, old_agg=old_agg) == _full(NEW)


def test_rejects_float_values(spark):
    old = spark.createDataFrame([(1, "g", 1.5)], COLS)
    with pytest.raises(ValueError, match="exactly-summable"):
        incremental_group_sum(old, old, ["k"], "g", "v")


def test_null_valued_rows_count_in_deltas(spark):
    # review regression: a deleted NULL-valued row must decrement n_rows
    schema = "k int, g string, v int"
    old = spark.createDataFrame([(1, "a", None), (2, "a", 5)], schema)
    new = spark.createDataFrame([(2, "a", 5)], schema)
    (r,) = incremental_group_sum(old, new, ["k"], "g", "v").collect()
    assert (r["g"], r["total"], r["n_rows"]) == ("a", 5, 1)


def test_null_group_is_a_legal_key(spark):
    # review regression: updates to NULL-group rows must merge null-safely
    schema = "k int, g string, v int"
    old = spark.createDataFrame([(1, None, 5)], schema)
    new = spark.createDataFrame([(1, None, 7)], schema)
    (r,) = incremental_group_sum(old, new, ["k"], "g", "v").collect()
    assert (r["g"], r["total"], r["n_rows"]) == (None, 7, 1)


def test_rejects_interval_like_type_names(spark):
    # 'interval ...' must not sneak past a prefix match on 'int'
    old = spark.createDataFrame([(1, "g", 1)], "k int, g string, v int")
    bad = old.select("k", "g", F.expr("INTERVAL 1 DAY").alias("v"))
    with pytest.raises(ValueError, match="exactly-summable"):
        incremental_group_sum(bad, bad, ["k"], "g", "v")
