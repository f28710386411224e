"""Generic as-of join and KMV sketch operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from foresttime_builder_spark.operators.asof import asof_join
from foresttime_builder_spark.operators.sketch import kmv_distinct


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 5, "c"), ("u3", 9, "d")],
        "k STRING, t INT, tag STRING",
    )
    right = spark.createDataFrame(
        [("u1", 10, 1, 100.0), ("u1", 15, 2, 150.0), ("u2", 6, 3, 60.0)],
        "k STRING, t INT, rid INT, px DOUBLE",
    )
    got = {
        (r["tag"]): r["px"]
        for r in asof_join(
            left, right, ["k"], "t", "t", ["px"], right_order=["rid"]
        ).collect()
    }
    # equal timestamps match (inclusive); no earlier right row -> null
    assert got == {"a": 100.0, "b": 150.0, "c": None, "d": None}


def test_asof_join_tie_breaks_by_order(spark):
    left = spark.createDataFrame([("u1", 10)], "k STRING, t INT")
    right = spark.createDataFrame(
        [("u1", 10, 1, 1.0), ("u1", 10, 2, 2.0)], "k STRING, t INT, rid INT, px DOUBLE"
    )
    [row] = asof_join(
        left, right, ["k"], "t", "t", ["px"], right_order=["rid"]
    ).collect()
    assert row["px"] == 2.0  # last in rid order wins


def test_asof_join_rejects_column_clash(spark):
    df = spark.createDataFrame([("u1", 1, 1.0)], "k STRING, t INT, px DOUBLE")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, ["k"], "t", "t", ["px"])


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(F.col("id").alias("x"))
    [row] = kmv_distinct(df, "x", k=64).collect()
    # fewer distinct values than k: the sketch IS the exact count
    assert row["n_exact"] == 40
    assert row["est_distinct"] == 40.0


def test_kmv_estimate_accuracy(spark):
    df = spark.range(5000).select((F.col("id") % 2000).alias("x"))
    [row] = kmv_distinct(df, "x", k=128).collect()
    assert row["n_exact"] == 2000
    # KMV relative error ~ 1/sqrt(k) ≈ 9%; allow 3 sigma
    assert abs(row["est_distinct"] - 2000) / 2000 < 0.27


def test_interval_overlap_join_matches_theta(spark):
    from foresttime_builder_spark.operators.asof import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 10), (2, 15, 25), (3, 100, 101), (4, 5, 6)],
        ["lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(10, 8, 16), (11, 24, 30), (12, 40, 50)], ["rid", "rs", "re"]
    )
    for width in (1, 3, 7, 100):
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                left, right, "ls", "le", "rs", "re", bucket_width=width
            ).collect()
        )
        # theta reference: [ls, le) overlaps [rs, re)
        want = sorted(
            (l[0], r[0])
            for l in [(1, 0, 10), (2, 15, 25), (3, 100, 101), (4, 5, 6)]
            for r in [(10, 8, 16), (11, 24, 30), (12, 40, 50)]
            if l[1] < r[2] and r[1] < l[2]
        )
        assert got == want, f"width={width}"


def test_interval_overlap_validation(spark):
    from foresttime_builder_spark.operators.asof import interval_overlap_join

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_width"):
        interval_overlap_join(None, None, "a", "b", "c", "d", bucket_width=0)


def test_interval_overlap_drops_degenerate_intervals(spark):
    """Empty [x, x) and inverted (end < start) intervals overlap nothing —
    previously an empty interval inside a window passed the strict-< verify
    predicate, and an inverted one fed sequence() a descending range."""
    from foresttime_builder_spark.operators.asof import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 10, 10), (2, 20, 12), (3, 5, 6)], ["lid", "ls", "le"]
    )
    right = spark.createDataFrame(
        [(10, 0, 100), (11, 9, 11), (12, 12, 20)], ["rid", "rs", "re"]
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_width=4
        ).collect()
    )
    # only the well-formed left row (3) matches; rows 1 (empty) and 2
    # (inverted) are dropped even though window 10 strictly contains them
    assert got == [(3, 10)]
    # and degenerate RIGHT rows are dropped symmetrically
    got2 = sorted(
        (r["rid"], r["lid"])
        for r in interval_overlap_join(
            right, left, "rs", "re", "ls", "le", bucket_width=4
        ).collect()
    )
    assert got2 == [(10, 3)]


def test_kmv_by_group_exact_below_k_and_estimate(spark):
    """Groups with < k distinct values report the exact count; a big group
    estimates within the standard KMV error (~1/sqrt(k))."""
    from foresttime_builder_spark.operators.sketch import kmv_distinct_by

    rows = [("small", f"v{i}") for i in range(10)]
    rows += [("big", f"w{i}") for i in range(5000)] * 2   # dup rows collapse
    rows += [(None, "x1"), (None, "x2"), ("nulls", None)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: (r["est_distinct"], r["n_exact"])
           for r in kmv_distinct_by(df, "g", "v", k=64,
                                    with_exact=True).collect()}
    assert got["small"] == (10.0, 10)
    est, n = got["big"]
    assert n == 5000 and abs(est - 5000) / 5000 < 0.5
    # NULL group is a real group; NULL values are excluded entirely
    assert got[None] == (2.0, 2)
    assert "nulls" not in got


def test_kmv_by_precut_is_lossless_and_exact_optin(spark):
    """The per-group hash threshold pre-cut (sketch economics) never
    changes the answer: the tightest allowed oversample (1.0 — mean
    survivor count exactly k, so the Chernoff-tail fallback genuinely
    fires for some groups) must produce bit-identical estimates to an
    effectively-uncut run; and with_exact=False (the default) omits the
    n_exact column."""
    from foresttime_builder_spark.operators.sketch import kmv_distinct_by

    rows = [(f"g{i % 7}", f"v{i}") for i in range(20_000)]
    rows += [(None, f"n{i}") for i in range(300)] + [("tiny", "only")]
    df = spark.createDataFrame(rows, "g string, v string")
    cut = {r["g"]: r["est_distinct"]
           for r in kmv_distinct_by(df, "g", "v", k=64,
                                    oversample=1.0).collect()}
    # oversample so large every per-group threshold saturates at 1.0 —
    # the original full-space ranking
    uncut = {r["g"]: r["est_distinct"]
             for r in kmv_distinct_by(df, "g", "v", k=64,
                                      oversample=1e9).collect()}
    assert cut == uncut and len(cut) == 9 and cut["tiny"] == 1.0
    out = kmv_distinct_by(df, "g", "v", k=64)
    assert out.columns == ["g", "est_distinct"]
