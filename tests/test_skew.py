"""Salted (skew-resilient) aggregation and join: identical results to the
plain formulations, with the salt visibly present in the first-stage
shuffle key."""

from __future__ import annotations

from pyspark.sql import functions as F

from foresttime_builder_spark.operators.skew import salted_agg, salted_join
from foresttime_builder_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    got = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", F.col("l_quantity")),
            "n": ("count", F.lit(1)),
            "mn": ("min", F.col("l_quantity")),
            "mx": ("max", F.col("l_quantity")),
        },
        salt=8,
        salt_from=["l_orderkey", "l_linenumber"],
    )
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    )
    assert _rows(got, ["l_returnflag"]) == _rows(want, ["l_returnflag"])


def test_salted_agg_salts_first_shuffle(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    got = salted_agg(
        li,
        ["l_returnflag"],
        {"n": ("count", F.lit(1))},
        salt=8,
        salt_from=["l_orderkey", "l_linenumber"],
    )
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan  # the first-stage grouping carries the salt


def test_salted_agg_rejects_non_algebraic(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    try:
        salted_agg(li, ["l_returnflag"], {"bad": ("avg", F.col("l_quantity"))})
    except ValueError as e:
        assert "algebraic" in str(e)
    else:
        raise AssertionError("avg must be rejected (not two-stage mergeable)")


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    got = salted_join(
        li, o, ["l_orderkey"], salt=4, salt_from=["l_orderkey", "l_linenumber"]
    )
    want = li.join(o, "l_orderkey")
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "o_orderpriority"]
    assert _rows(got.select(cols), cols) == _rows(want.select(cols), cols)
