"""Always-on real-FIADB anchor over the published POP tables.

The strongest external oracle in the reference is re-estimating values
FIADB itself publishes (``tests/testthat/test-estimate_carbon.R:55-56``
does it for per-tree carbon).  The TREE table needed for that anchor is
not obtainable here (~100 MB/state, no network), so this module anchors
the *population-scaling* machinery the same way, against real published
rows that ARE available: ``tests/data/fia_pop_sample/`` vendors the
POP_STRATUM / POP_ESTN_UNIT / POP_PLOT_STRATUM_ASSGN rows for four real
evaluations — Delaware 102300/102201 and Rhode Island 442300/442201 —
extracted from the USDA FIA DataMart CSVs (public domain; the same
provenance as the reference's ``inst/exdata`` dimension tables and this
repo's vendored NSVB coefficient CSVs).  All CN key columns are kept as
strings end-to-end (the CN precision contract, SURVEY §2.1 S3).

Three published identities of the FIA sampling design (Bechtold &
Patterson 2005, the same estimation framework the reference's
``vignettes/pop_scaling.qmd`` names) are re-derived with this engine's
own join/aggregation shapes and must hold at machine precision:

1. ``EXPNS = AREA_USED · (P1POINTCNT / P1PNTCNT_EU) / P2POINTCNT`` for
   every stratum of an annual-design evaluation (verified ≤ 2e-16 rel
   on the vendored rows; the 1986/1999 periodic inventories use a
   different stratum-area basis and are deliberately not vendored);
2. the number of plots assigned to a stratum in POP_PLOT_STRATUM_ASSGN
   equals the stratum's published P2POINTCNT;
3. area closure: Σ EXPNS·P2POINTCNT over an estimation unit's strata
   reproduces the published AREA_USED.

On top of the identities, the EXPALL evaluations (102300/442300, where
every ADJ_FACTOR_SUBP = 1) anchor :func:`estimate_population_stratified`
END-TO-END: a unit-condition panel built from the real plot assignments
must yield ``total_area`` equal to the published state total area — the
production code path (broadcast dim join through PLT_CN, distinct-tuple
condition grouping, per-year rollup), not a re-implementation.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

DATA_DIR = os.path.join(os.path.dirname(__file__), "data", "fia_pop_sample")

# (EVALID, expected plot-assignment rows) — EXPALL evals have ADJ=1
EXPALL = ("102300", "442300")
EXPCURR = ("102201", "442201")


@pytest.fixture(scope="module")
def pop(spark):
    def read(tbl):
        df = spark.read.option("header", True).csv(
            os.path.join(DATA_DIR, f"{tbl}.csv")
        )
        # CN keys stay strings; measures cast explicitly
        return df

    strat = read("POP_STRATUM").select(
        "CN",
        "ESTN_UNIT_CN",
        "EVALID",
        F.col("P1POINTCNT").cast("long").alias("P1POINTCNT"),
        F.col("P2POINTCNT").cast("long").alias("P2POINTCNT"),
        F.col("EXPNS").cast("double").alias("EXPNS"),
        F.col("ADJ_FACTOR_SUBP").cast("double").alias("ADJ_FACTOR_SUBP"),
    )
    eu = read("POP_ESTN_UNIT").select(
        "CN",
        "EVALID",
        F.col("AREA_USED").cast("double").alias("AREA_USED"),
        F.col("P1PNTCNT_EU").cast("long").alias("P1PNTCNT_EU"),
    )
    assgn = read("POP_PLOT_STRATUM_ASSGN").select(
        "CN", "STRATUM_CN", "PLT_CN", "EVALID"
    )
    return strat, eu, assgn


def test_expns_formula_matches_published(pop):
    """Identity 1: the published EXPNS is exactly the proportional-P1
    stratum area divided by the plot count, via a broadcast dim join."""
    strat, eu, _ = pop
    joined = strat.join(
        F.broadcast(eu.select(F.col("CN").alias("ESTN_UNIT_CN"),
                              "AREA_USED", "P1PNTCNT_EU")),
        on="ESTN_UNIT_CN",
    )
    bad = joined.filter(
        F.abs(
            F.col("EXPNS")
            - F.col("AREA_USED")
            * (F.col("P1POINTCNT") / F.col("P1PNTCNT_EU"))
            / F.col("P2POINTCNT")
        )
        > 1e-9 * F.col("EXPNS")
    )
    assert strat.count() == 30
    assert bad.count() == 0


def test_assignment_counts_match_published_p2pointcnt(pop):
    """Identity 2: counting real plot assignments per stratum reproduces
    the published P2POINTCNT for all 30 strata."""
    strat, _, assgn = pop
    counts = assgn.groupBy("STRATUM_CN").agg(F.count("*").alias("n"))
    merged = strat.join(
        counts, on=strat["CN"] == counts["STRATUM_CN"], how="left"
    )
    bad = merged.filter(
        F.col("n").isNull() | (F.col("n") != F.col("P2POINTCNT"))
    )
    assert bad.count() == 0
    assert assgn.count() == 1326


def test_area_closure_per_estimation_unit(pop):
    """Identity 3: Σ EXPNS·P2POINTCNT over an estimation unit's strata
    equals the published AREA_USED (machine precision)."""
    strat, eu, _ = pop
    per_eu = strat.groupBy("ESTN_UNIT_CN").agg(
        F.sum(F.col("EXPNS") * F.col("P2POINTCNT")).alias("derived_area")
    )
    merged = per_eu.join(
        eu.select(F.col("CN").alias("ESTN_UNIT_CN"), "AREA_USED"),
        on="ESTN_UNIT_CN",
    )
    rows = merged.collect()
    assert len(rows) == 12
    for r in rows:
        assert r.derived_area == pytest.approx(r.AREA_USED, rel=1e-12)


@pytest.mark.parametrize("evalid", EXPALL)
def test_estimate_population_stratified_closes_on_published_area(
    spark, pop, evalid
):
    """End-to-end: the production ``estimate_population_stratified`` over a
    unit-condition panel built from the REAL plot assignments reproduces
    the published evaluation area.  With CONDPROP=1, aDI=1 per plot and
    the EXPALL evaluation's ADJ_FACTOR_SUBP=1, total_area telescopes to
    Σ EXPNS over assigned plots = Σ published stratum areas = AREA_USED.
    The tree term is anchored with the same data: CARBON·TPA/2000 = 1 acre
    -equivalent per plot makes total_tons equal total_area."""
    from foresttime_builder_spark.plans.population import (
        estimate_population_stratified,
    )

    strat, eu, assgn = pop
    strat_e = strat.filter(F.col("EVALID") == evalid).drop("EVALID")
    assgn_e = assgn.filter(F.col("EVALID") == evalid)

    panel = assgn_e.select(
        "PLT_CN",
        F.col("PLT_CN").alias("plot_ID"),
        F.lit(2023).alias("YEAR"),
        F.lit(1).alias("CONDID"),
        F.lit(1.0).alias("CONDPROP_UNADJ"),
        F.lit(1).alias("COND_STATUS_CD"),
        F.lit(1).alias("INTENSITY"),
        F.lit(1).alias("STATUSCD"),
        F.lit(1.0).alias("TPA_UNADJ"),
        F.lit(2000.0).alias("CARBON_AG"),
    )
    got = estimate_population_stratified(panel, strat_e, assgn_e).collect()
    assert len(got) == 1
    published = (
        eu.filter(F.col("EVALID") == evalid)
        .agg(F.sum("AREA_USED"))
        .first()[0]
    )
    assert got[0].total_area == pytest.approx(published, rel=1e-12)
    assert got[0].total_tons == pytest.approx(published, rel=1e-12)
    assert got[0].tons_per_acre == pytest.approx(1.0, rel=1e-12)


@pytest.mark.parametrize("evalid", EXPCURR)
def test_estimate_population_stratified_adjusted_path_closes(
    spark, pop, evalid
):
    """End-to-end through the ADJ_FACTOR_SUBP ≠ 1 path: the EXPCURR
    evaluations carry real published adjustment factors up to 1.08.  The
    FIA design contract is that the adjustment exactly compensates
    partially-sampled conditions, so a panel whose condition proportion is
    the sampled fraction ``1/ADJ`` of its stratum must close on the
    published AREA_USED: ``CONDPROP · ADJ · EXPNS`` telescopes back to
    ``Σ EXPNS`` over assigned plots = published area.  The tree term is
    anchored identically (``CARBON = 2000/ADJ`` → tons per plot = EXPNS).
    Unlike the EXPALL arm this fails if the engine drops, misjoins, or
    misplaces the ADJ multiply — asserted explicitly below by checking the
    unadjusted sum does NOT close."""
    from foresttime_builder_spark.plans.population import (
        estimate_population_stratified,
    )

    strat, eu, assgn = pop
    strat_e = strat.filter(F.col("EVALID") == evalid).drop("EVALID")
    assgn_e = assgn.filter(F.col("EVALID") == evalid)

    # guard: the fixture must actually exercise the adjusted path
    n_adj = strat_e.filter(F.col("ADJ_FACTOR_SUBP") != 1.0).count()
    assert n_adj > 0, "EXPCURR fixture lost its ADJ!=1 strata"

    # per-plot published ADJ via the same assignment join the engine uses
    plot_adj = assgn_e.select("PLT_CN", "STRATUM_CN").join(
        F.broadcast(
            strat_e.select(
                F.col("CN").alias("STRATUM_CN"), "ADJ_FACTOR_SUBP", "EXPNS"
            )
        ),
        on="STRATUM_CN",
    )
    panel = plot_adj.select(
        "PLT_CN",
        F.col("PLT_CN").alias("plot_ID"),
        F.lit(2023).alias("YEAR"),
        F.lit(1).alias("CONDID"),
        (F.lit(1.0) / F.col("ADJ_FACTOR_SUBP")).alias("CONDPROP_UNADJ"),
        F.lit(1).alias("COND_STATUS_CD"),
        F.lit(1).alias("INTENSITY"),
        F.lit(1).alias("STATUSCD"),
        F.lit(1.0).alias("TPA_UNADJ"),
        (F.lit(2000.0) / F.col("ADJ_FACTOR_SUBP")).alias("CARBON_AG"),
    )
    got = estimate_population_stratified(panel, strat_e, assgn_e).collect()
    assert len(got) == 1
    published = (
        eu.filter(F.col("EVALID") == evalid)
        .agg(F.sum("AREA_USED"))
        .first()[0]
    )
    assert got[0].total_area == pytest.approx(published, rel=1e-12)
    assert got[0].total_tons == pytest.approx(published, rel=1e-12)
    assert got[0].tons_per_acre == pytest.approx(1.0, rel=1e-12)

    # the adjustment is load-bearing: without ADJ the same panel does NOT
    # reproduce the published area (the sampled fractions under-count)
    unadjusted = (
        plot_adj.agg(
            F.sum(F.col("EXPNS") / F.col("ADJ_FACTOR_SUBP"))
        ).first()[0]
    )
    assert unadjusted < published * (1 - 1e-6)
