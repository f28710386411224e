"""Population-scaling estimators: simplified-EXPNS vs design-based modes.

The design-based mode (``estimate_population_stratified``) must (a) reduce
exactly to the simplified per-year-EXPNS mode when the strata are
degenerate — one stratum per year with ``EXPNS = area / n_plots`` and
``ADJ_FACTOR_SUBP = 1`` — and (b) reproduce a hand-computed multi-stratum
expansion.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from foresttime_builder_spark.plans.population import (
    estimate_population,
    estimate_population_stratified,
)

PANEL_SCHEMA = (
    "plot_ID string, tree_ID string, YEAR int, PLT_CN string, CONDID int, "
    "CONDPROP_UNADJ double, COND_STATUS_CD int, INTENSITY int, STATUSCD int, "
    "TPA_UNADJ double, CARBON_AG double"
)

ROWS = [
    # plot p1: two live trees, one dead; fully forested condition
    ("p1", "t1", 2020, "cn_p1_2020", 1, 1.0, 1, 1, 1, 6.0, 100.0),
    ("p1", "t2", 2020, "cn_p1_2020", 1, 1.0, 1, 1, 1, 6.0, 200.0),
    ("p1", "t3", 2020, "cn_p1_2020", 1, 1.0, 1, 1, 2, 6.0, 300.0),
    # plot p2: one live tree, half-forested condition
    ("p2", "t4", 2020, "cn_p2_2020", 1, 0.5, 1, 1, 1, 6.0, 400.0),
    # plot p3: non-forested condition (aDI = 0)
    ("p3", "t5", 2020, "cn_p3_2020", 1, 1.0, 2, 1, 1, 6.0, 500.0),
]


@pytest.fixture(scope="module")
def panel(spark):
    return spark.createDataFrame(ROWS, PANEL_SCHEMA)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_degenerate_strata_reduce_to_simplified_mode(spark, panel):
    area = 9000.0
    simple = _one(estimate_population(panel, area=area))

    # one stratum for the year, EXPNS = area / n_plots, ADJ = 1
    assgn = spark.createDataFrame(
        [(f"cn_p{i}_2020", "S2020") for i in (1, 2, 3)],
        "PLT_CN string, STRATUM_CN string",
    )
    stratum = spark.createDataFrame(
        [("S2020", area / 3.0, 1.0)],
        "CN string, EXPNS double, ADJ_FACTOR_SUBP double",
    )
    strat = _one(estimate_population_stratified(panel, stratum, assgn))

    assert strat["total_tons"] == pytest.approx(simple["total_tons"], rel=1e-12)
    assert strat["total_area"] == pytest.approx(simple["total_area"], rel=1e-12)
    assert strat["tons_per_acre"] == pytest.approx(
        simple["tons_per_acre"], rel=1e-12
    )


def test_multi_stratum_expansion_hand_computed(spark, panel):
    # p1 in stratum A (EXPNS 1000, ADJ 1.0); p2, p3 in B (EXPNS 2000, ADJ 1.1)
    assgn = spark.createDataFrame(
        [("cn_p1_2020", "A"), ("cn_p2_2020", "B"), ("cn_p3_2020", "B")],
        "PLT_CN string, STRATUM_CN string",
    )
    stratum = spark.createDataFrame(
        [("A", 1000.0, 1.0), ("B", 2000.0, 1.1)],
        "CN string, EXPNS double, ADJ_FACTOR_SUBP double",
    )
    got = _one(estimate_population_stratified(panel, stratum, assgn))

    # tree totals (live trees on forested land only):
    #   p1: (100 + 200) * 6 * 1.0 * 1000 / 2000 = 900.0 tons
    #   p2: 400 * 6 * 1.1 * 2000 / 2000        = 2640.0 tons
    #   p3: aDI = 0                             = 0
    assert got["total_tons"] == pytest.approx(900.0 + 2640.0, rel=1e-12)
    # area totals over distinct conditions:
    #   p1: 1.0 * 1.0 * 1000 = 1000 ;  p2: 0.5 * 1.1 * 2000 = 1100 ;  p3: 0
    assert got["total_area"] == pytest.approx(2100.0, rel=1e-12)
    assert got["tons_per_acre"] == pytest.approx(3540.0 / 2100.0, rel=1e-12)
