"""Numeric histogram contract: exact integer buckets, null exclusion,
coverage invariants, validation."""

from __future__ import annotations

import pytest

from foresttime_builder_spark.operators.profile import numeric_histogram

VALUES = [0.0, 0.01, 0.99, 1.0, 2.5, 9.99, 10.0, None]


@pytest.fixture(scope="module")
def hist(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "v double")
    rows = numeric_histogram(df, "v", n_buckets=4, scale=100).collect()
    return sorted(
        (r["bucket"], r["lo"], r["hi"], r["n_rows"]) for r in rows
    )


def test_buckets(hist):
    # cents range 0..1000, width ceil(1001/4)=251
    # 0,1,99,100 -> b0; 250 -> b0; 999 -> b3; 1000 -> b3
    assert hist == [
        (0, 0, 251, 5),
        (3, 753, 1004, 2),
    ]


def test_nulls_excluded_and_total_preserved(hist):
    assert sum(n for *_, n in hist) == len([v for v in VALUES if v is not None])


def test_bounds_contain_values(hist):
    for b, lo, hi, _ in hist:
        assert lo < hi
        assert hi - lo == 251


def test_validation():
    with pytest.raises(ValueError, match="n_buckets"):
        numeric_histogram(None, "v", n_buckets=0)
    with pytest.raises(ValueError, match="scale"):
        numeric_histogram(None, "v", scale=0)


def test_equidepth_histogram_contract(spark):
    from foresttime_builder_spark.operators.profile import equidepth_histogram

    # 12 rows into 4 buckets of exactly 3; ties split by id order
    rows = [(i, float(v)) for i, v in enumerate([5, 5, 5, 5, 1, 1, 2, 2, 9, 9, 9, 3])]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = sorted(
        (r["bucket"], r["lo"], r["hi"], r["n_rows"])
        for r in equidepth_histogram(df, "v", "k", n_buckets=4, scale=1).collect()
    )
    # sorted values: 1,1,2,2,3,5,5,5,5,9,9,9
    assert out == [
        (1, 1, 2, 3),
        (2, 2, 5, 3),
        (3, 5, 5, 3),
        (4, 9, 9, 3),
    ]
    assert sum(n for *_, n in out) == 12


def test_equidepth_sampled_estimates_and_determinism(spark):
    from foresttime_builder_spark.operators.profile import (
        equidepth_histogram_sampled,
    )

    n = 20_000
    df = spark.range(n).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    out = equidepth_histogram_sampled(
        df, "v", "k", n_buckets=4, scale=1, fraction=0.25
    )
    rows = sorted(
        (r["bucket"], r["lo"], r["hi"], r["n_sample"], r["n_est"])
        for r in out.collect()
    )
    assert [b for b, *_ in rows] == [1, 2, 3, 4]
    m = sum(s for *_, s, _ in rows)
    # ~25% sample, md5-uniform: within 5 sigma of n/4
    assert abs(m - n / 4) < 5 * (n * 0.25 * 0.75) ** 0.5
    # per-bucket depth estimates recover ~n/4 each within ~12%
    for _, lo, hi, s, est in rows:
        assert abs(est - n / 4) / (n / 4) < 0.12
        assert 0 <= lo <= hi < n
    # uniform values: bucket boundaries near the true quartiles
    for i, (_, lo, hi, *_r) in enumerate(rows):
        assert abs(lo - i * n / 4) < n * 0.03
    # deterministic: identical on re-run
    rows2 = sorted(
        (r["bucket"], r["lo"], r["hi"], r["n_sample"], r["n_est"])
        for r in equidepth_histogram_sampled(
            df, "v", "k", n_buckets=4, scale=1, fraction=0.25
        ).collect()
    )
    assert rows == rows2


def test_equidepth_sampled_validates_fraction(spark):
    import pytest as _pytest

    from foresttime_builder_spark.operators.profile import (
        equidepth_histogram_sampled,
    )

    df = spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    for bad in (0.0, -0.1, 1.5):
        with _pytest.raises(ValueError, match="fraction"):
            equidepth_histogram_sampled(df, "v", "k", fraction=bad)


def test_equidepth_sampled_guards_single_task_sample(spark):
    """An oversized fraction × input must raise at plan time, naming the
    corrective fraction, BEFORE the single-task ntile sort runs — nothing
    else enforces the docstring's error-formula sizing."""
    import pytest as _pytest

    from foresttime_builder_spark.operators.profile import (
        equidepth_histogram_sampled,
    )

    df = spark.range(10_000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    with _pytest.raises(ValueError, match="max_sample_rows"):
        equidepth_histogram_sampled(
            df, "v", "k", fraction=0.5, max_sample_rows=1_000
        )
    # at exactly the bound it runs
    out = equidepth_histogram_sampled(
        df, "v", "k", n_buckets=2, scale=1, fraction=0.1,
        max_sample_rows=1_000,
    )
    assert out.count() == 2


def test_equidepth_sampled_oracle_half_boundary_fraction(spark):
    """Cross-engine .5-boundary regression: fraction=0.56 with n_sample=7
    puts the exact-decimal estimate quotient on 12.5 (round-half-up -> 13)
    while IEEE double division lands just below (12.4999... -> 12).  Any
    engine doing EXACT decimal division here would round apart from
    Spark; the oracle pins the divisor with CAST(... AS DOUBLE) and this
    test proves both engines agree at the boundary (DuckDB's `/` happens
    to promote DECIMAL to DOUBLE already — the CAST makes that
    version-independent instead of relied-upon).  N=16 is pinned so the
    md5 hash filter keeps exactly 7 rows."""
    import duckdb

    from foresttime_builder_spark.operators.profile import (
        equidepth_histogram_sampled,
        equidepth_histogram_sampled_oracle_sql,
    )

    # the divergence class this guards against: exact decimal division
    # says 13, IEEE says 12 — the engines must BOTH say 12
    from decimal import Decimal
    import math

    assert math.floor(Decimal(7) / Decimal("0.56") + Decimal("0.5")) == 13
    assert duckdb.sql(
        "SELECT floor(7 / CAST(0.56 AS DOUBLE) + 0.5)"
    ).fetchone()[0] == 12

    df = spark.range(16).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    got = sorted(
        tuple(r)
        for r in equidepth_histogram_sampled(
            df, "v", "k", n_buckets=1, scale=1, fraction=0.56
        ).collect()
    )
    assert got and got[0][3] == 7, "precondition: hash filter keeps 7 rows"
    assert got[0][4] == 12, "Spark side must divide IEEE doubles"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT CAST(range AS BIGINT) AS k, "
        "CAST(range AS DOUBLE) AS v FROM range(16)"
    )
    sql = equidepth_histogram_sampled_oracle_sql(
        "v", "k", "t", n_buckets=1, scale=1, fraction=0.56
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
