"""Data-quality assertions over pipeline outputs.

The reference validates its built tables with ad-hoc scripts
(``scripts/04-check_db.R``, ``05-check_saplings.R``, ``06-check-annualized.R``
and the grouped any/all checks in SURVEY §2.4 A6).  Here each check is a
DataFrame → violation-count function so they compose into one pass and run
as cheap aggregations at any scale; :func:`run_qa` evaluates a suite and
returns ``{check: violations}``.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, functions as F


def one_row_per_tree_year(df: DataFrame) -> DataFrame:
    """Exactly one row per (tree_ID, YEAR) (``06-check-annualized.R``)."""
    return (
        df.filter(F.col("tree_ID").isNotNull())
        .groupBy("tree_ID", "YEAR")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def unique_spcd_per_tree(df: DataFrame) -> DataFrame:
    """SPCD is a tree-level invariant after tidy (``test-prep_data.R:17``)."""
    return (
        df.filter(F.col("tree_ID").isNotNull())
        .groupBy("tree_ID")
        .agg(F.countDistinct("SPCD").alias("n"))
        .filter(F.col("n") > 1)
    )


def contiguous_year_grid(df: DataFrame) -> DataFrame:
    """The annual grid is dense: count == max-min+1 per tree."""
    return (
        df.filter(F.col("tree_ID").isNotNull())
        .groupBy("tree_ID")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("YEAR") - F.min("YEAR") + 1).alias("span"),
        )
        .filter(F.col("n") != F.col("span"))
    )


def measurements_null_when_fallen(df: DataFrame) -> DataFrame:
    """Fallen dead trees (STANDING_DEAD_CD = 0) carry no measurements
    (``adjust_mortality`` masks)."""
    fallen = F.col("STANDING_DEAD_CD") == 0
    some_measure = (
        F.col("DIA").isNotNull()
        | F.col("HT").isNotNull()
        | F.col("ACTUALHT").isNotNull()
        | F.col("CR").isNotNull()
        | F.col("CULL").isNotNull()
    )
    return df.filter(fallen & some_measure)


def carbon_nonnegative(df: DataFrame) -> DataFrame:
    """Estimated carbon/biomass are never negative."""
    return df.filter(
        (F.col("CARBON_AG") < 0) | (F.col("DRYBIO_AG") < 0)
    )


def carbon_only_for_measured(df: DataFrame) -> DataFrame:
    """No estimate without a height (the eligibility rule)."""
    return df.filter(F.col("CARBON_AG").isNotNull() & F.col("HT").isNull())


ANNUALIZED_SUITE: Mapping[str, Callable[[DataFrame], DataFrame]] = {
    "one_row_per_tree_year": one_row_per_tree_year,
    "unique_spcd_per_tree": unique_spcd_per_tree,
    "contiguous_year_grid": contiguous_year_grid,
    "measurements_null_when_fallen": measurements_null_when_fallen,
}

ESTIMATED_SUITE: Mapping[str, Callable[[DataFrame], DataFrame]] = {
    **ANNUALIZED_SUITE,
    "carbon_nonnegative": carbon_nonnegative,
    "carbon_only_for_measured": carbon_only_for_measured,
}


def run_qa(
    df: DataFrame,
    suite: Mapping[str, Callable[[DataFrame], DataFrame]] = ANNUALIZED_SUITE,
) -> dict[str, int]:
    """Evaluate a suite; returns violation counts (all zeros = healthy)."""
    return {name: check(df).count() for name, check in suite.items()}
