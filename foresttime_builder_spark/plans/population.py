"""Population / area scaling of per-tree estimates, Spark-first.

The reference documents this as the canonical downstream analytic query over
the annualized + estimated table (``vignettes/pop_scaling.qmd:100-166``) and
a legacy multi-grain aggregation sweep (``carbon_code/R/07_aggregateFIADB.R``,
SURVEY §2.4 A7).  Both are textbook shuffle aggregations:

- :func:`estimate_population`: two grouped sums (tree totals, deduped
  condition/area totals) joined per (plot, year), then a per-year rollup and
  ratio — exactly the vignette's EXPNS / aDI / tDI algebra;
- :func:`multi_grain_sweep`: the reference loops one aggregation per grain
  (~14 passes over the data); here a single ``GROUPING SETS`` pass computes
  every grain in one shuffle (SURVEY §2.4 A7 mapping).

Scale notes: plot-level aggregation shuffles on (plot_ID, YEAR) — the same
key the annualization stage is already partitioned by, so AQE coalesces
rather than re-shuffles; the per-year rollup is a near-free second stage
(thousands of groups).  GROUPING SETS computes all grains with partial
(map-side) aggregation, versus N full passes in the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

LB_PER_TON = 2000.0


def _finite_or_zero(col: F.Column) -> F.Column:
    """NULL / NaN / ±Inf contribute ZERO to population totals, identically
    on both engine sides (oracle: CASE WHEN isfinite(x) THEN x ELSE 0 END).
    Non-finite per-tree estimates are real at the corpus fringe — a
    negative extrapolated DIA under a power law yields NaN — and one such
    row would otherwise poison a whole year's total (where Spark then
    casts NaN->long as 0 while DuckDB's CAST raises)."""
    inf = float("inf")
    return F.when(
        col.isNotNull() & ~F.isnan(col) & (col != inf) & (col != -inf),
        col,
    ).otherwise(F.lit(0.0))


def estimate_population(
    df: DataFrame,
    area: float,
    tree_domain: Column | None = None,
    area_domain: Column | None = None,
    value_col: str = "CARBON_AG",
) -> DataFrame:
    """Per-year population totals and per-acre ratio for ``value_col``
    (reference ``vignettes/pop_scaling.qmd:100-166``).

    Returns one row per YEAR: ``total_tons`` (Σ value·TPA·EXPNS / 2000),
    ``total_area`` (Σ CONDPROP·EXPNS over distinct conditions), and
    ``tons_per_acre``.
    """
    # domain indicators (qmd:103-104); null-safe to 0 like the R arithmetic
    adi_cond = (
        area_domain
        if area_domain is not None
        else (F.col("COND_STATUS_CD") == 1) & (F.col("INTENSITY") == 1)
    )
    tdi_cond = (
        tree_domain if tree_domain is not None else (F.col("STATUSCD") == 1)
    )
    adi = F.when(adi_cond, 1.0).otherwise(0.0)
    tdi = F.when(tdi_cond, 1.0).otherwise(0.0) * adi

    # EXPNS = area / n_distinct(plot) per YEAR (qmd:119-123)
    expns_dim = (
        df.groupBy("YEAR")
        .agg(F.countDistinct("plot_ID").alias("_nplots"))
        .withColumn("EXPNS", F.lit(float(area)) / F.col("_nplots"))
        .drop("_nplots")
    )
    d = df.withColumn("aDI", adi).withColumn("tDI", tdi).join(
        F.broadcast(expns_dim), on="YEAR", how="left"
    )

    # ONE fact pass for both rollups (qmd:141-155).  The reference (and the
    # DuckDB oracle) compute tree totals per plot-year, area totals over
    # DISTINCT condition tuples, then join the two — three shuffles plus a
    # join.  Grouping the single pass by the full distinct tuple instead
    # (the area term's inputs become group keys, so one group exists per
    # row the old DISTINCT produced) makes the area term addable exactly
    # once per group at the year rollup, while the tree terms — summed over
    # a finer partition of the same rows than the old (plot, YEAR) grouping
    # — re-sum to identical year totals.  Two exchanges, no join, and the
    # per-plot intermediate the join existed to align disappears.  Note the
    # tuple deliberately includes the attribute columns, NOT just
    # (plot, YEAR, CONDID): interpolated panels can carry mixed attribute
    # values within one condition (e.g. step-interpolated PLT_CN switching
    # at different midpoints per tree), and the distinct-tuple semantics of
    # the reference counts each combination.
    cond_grp = d.groupBy(
        "YEAR", "plot_ID", "CONDID", "CONDPROP_UNADJ", "EXPNS", "aDI"
    ).agg(
        F.sum(
            _finite_or_zero(F.col(value_col))
            * F.coalesce(F.col("TPA_UNADJ"), F.lit(0.0))
            * F.col("EXPNS")
            * F.col("tDI")
            / LB_PER_TON
        ).alias("_cond_tons")
    )
    return (
        cond_grp.groupBy("YEAR")
        .agg(
            F.sum("_cond_tons").alias("total_tons"),
            F.sum(
                F.coalesce(F.col("CONDPROP_UNADJ"), F.lit(0.0))
                * F.col("EXPNS")
                * F.col("aDI")
            ).alias("total_area"),
        )
        .withColumn(
            "tons_per_acre",
            # nullif: a zero-area year (every condition non-sampled or
            # NULL-proportioned) must yield NULL, not 0/0 -> NaN — Spark
            # silently casts NaN->long as 0 while DuckDB's CAST raises
            F.col("total_tons") / F.nullif(F.col("total_area"), F.lit(0.0))
        )
    )


def estimate_population_stratified(
    df: DataFrame,
    pop_stratum: DataFrame,
    pop_assgn: DataFrame,
    tree_domain: Column | None = None,
    area_domain: Column | None = None,
    value_col: str = "CARBON_AG",
) -> DataFrame:
    """Design-based population totals using the FIA POP tables
    (the reference downloads-but-never-reads them, ``R/fia_download.R:2-12``;
    ``vignettes/pop_scaling.qmd:36-44,112-118`` names design-based
    stratified estimation — rFIA / EVALIDator style — as the sanity band
    the simplified per-year EXPNS approximates).

    Each plot inherits its stratum's expansion: ``POP_PLOT_STRATUM_ASSGN``
    maps ``PLT_CN → STRATUM_CN`` and ``POP_STRATUM`` carries ``EXPNS``
    (acres represented per plot in the stratum) and ``ADJ_FACTOR_SUBP``
    (non-sampled-area adjustment).  Totals are then

        Σ value · TPA · ADJ_FACTOR_SUBP · EXPNS      (tree domain)
        Σ CONDPROP · ADJ_FACTOR_SUBP · EXPNS         (area domain)

    summed per plot-year and rolled up per year — the textbook
    post-stratified expansion.  With one stratum per year and
    ``EXPNS = area / n_plots``, ``ADJ = 1`` this reduces exactly to
    :func:`estimate_population` (pinned by a pytest equivalence case).

    Scale notes: the POP tables are dimension-sized (one row per plot
    assignment / per stratum) and broadcast; the fact-side plan is
    identical to the simplified mode — same two grouped sums on
    (plot_ID, YEAR), no extra shuffle.
    """
    adi_cond = (
        area_domain
        if area_domain is not None
        else (F.col("COND_STATUS_CD") == 1) & (F.col("INTENSITY") == 1)
    )
    tdi_cond = (
        tree_domain if tree_domain is not None else (F.col("STATUSCD") == 1)
    )
    adi = F.when(adi_cond, 1.0).otherwise(0.0)
    tdi = F.when(tdi_cond, 1.0).otherwise(0.0) * adi

    strat = pop_stratum.select(
        F.col("CN").alias("STRATUM_CN"), "EXPNS", "ADJ_FACTOR_SUBP"
    )
    dim = pop_assgn.select("PLT_CN", "STRATUM_CN").join(
        F.broadcast(strat), on="STRATUM_CN"
    )
    d = (
        df.join(F.broadcast(dim), on="PLT_CN", how="left")
        .withColumn("aDI", adi)
        .withColumn("tDI", tdi)
    )

    # same single-pass distinct-tuple shape as estimate_population (see the
    # comment there).  The stratum attributes (EXPNS, ADJ_FACTOR_SUBP)
    # join through the step-interpolated PLT_CN, which CAN differ across
    # trees within one plot-year — including them in the group key is what
    # keeps this exactly equal to the reference's DISTINCT-then-sum.
    cond_grp = d.groupBy(
        "YEAR",
        "plot_ID",
        "CONDID",
        "CONDPROP_UNADJ",
        "EXPNS",
        "ADJ_FACTOR_SUBP",
        "aDI",
    ).agg(
        F.sum(
            _finite_or_zero(F.col(value_col))
            * F.coalesce(F.col("TPA_UNADJ"), F.lit(0.0))
            * F.coalesce(F.col("ADJ_FACTOR_SUBP"), F.lit(0.0))
            * F.coalesce(F.col("EXPNS"), F.lit(0.0))
            * F.col("tDI")
            / LB_PER_TON
        ).alias("_cond_tons")
    )
    return (
        cond_grp.groupBy("YEAR")
        .agg(
            F.sum("_cond_tons").alias("total_tons"),
            F.sum(
                F.coalesce(F.col("CONDPROP_UNADJ"), F.lit(0.0))
                * F.coalesce(F.col("ADJ_FACTOR_SUBP"), F.lit(0.0))
                * F.coalesce(F.col("EXPNS"), F.lit(0.0))
                * F.col("aDI")
            ).alias("total_area"),
        )
        .withColumn(
            "tons_per_acre",
            # nullif: a zero-area year (every condition non-sampled or
            # NULL-proportioned) must yield NULL, not 0/0 -> NaN — Spark
            # silently casts NaN->long as 0 while DuckDB's CAST raises
            F.col("total_tons") / F.nullif(F.col("total_area"), F.lit(0.0))
        )
    )


def multi_grain_sweep(
    df: DataFrame,
    grains: Sequence[Sequence[str]],
    value_col: str = "CARBON_AG",
    weight_col: str = "TPA_UNADJ",
) -> DataFrame:
    """The legacy per-grain aggregation sweep in ONE pass via grouping sets
    (reference runs ~14 separate summaries, ``carbon_code/R/07_aggregateFIADB.R:22-32``).

    ``grains`` is a list of column-name lists; the output carries each grain's
    columns (null outside its grain) plus a ``grain`` label, the weighted sum
    of ``value_col`` and the row count.
    """
    all_cols = sorted({c for g in grains for c in g})
    sets_sql = ", ".join(
        "(" + ", ".join(g) + ")" if g else "()" for g in grains
    )
    w = F.coalesce(F.col(weight_col), F.lit(0.0))
    v = _finite_or_zero(F.col(value_col))
    d = df.withColumn("_wv", v * w)
    d.createOrReplaceTempView("_sweep_in")
    cols = ", ".join(all_cols)
    label = (
        "concat_ws('|', "
        + ", ".join(
            f"CASE WHEN grouping({c}) = 0 THEN '{c}' END" for c in all_cols
        )
        + ")"
    )
    return d.sparkSession.sql(
        f"""
        SELECT {cols}, {label} AS grain,
               sum(_wv) AS weighted_value,
               count(*) AS n_rows
        FROM _sweep_in
        GROUP BY GROUPING SETS ({sets_sql})
        """
    )
