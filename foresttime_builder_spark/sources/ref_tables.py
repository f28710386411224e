"""Loaders for the published USFS reference/dimension tables shipped as
package resources (see ``resources/``; originally FIA DataMart / NSVB
publication data, staged by the reference's ``data-raw/prep_internal_data.R``).

All of these are tiny (10 – 2,697 rows) and are always broadcast.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

_RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")


def cached(spark: SparkSession, key: str, build) -> DataFrame:
    """Per-session memo for the tiny broadcast dims: building them is pure
    driver-side work, so repeated plan builds (q26/q27/q28 each rebuild the
    whole chain) should pay it once per session."""
    cache = getattr(spark, "_ft_ref_cache", None)
    if cache is None:
        cache = {}
        spark._ft_ref_cache = cache
    if key not in cache:
        cache[key] = build()
    return cache[key]

COEF_NAMES = (
    "volib",
    "volbk",
    "volob",
    "rcumib",
    "rcumob",
    "total_biomass",
    "bark_biomass",
    "branch_biomass",
    "foliage",
)


@lru_cache(maxsize=None)
def csv_rows(name: str, spec: tuple[tuple[str, str], ...]) -> tuple[tuple, ...]:
    """Parse one packaged reference CSV driver-side into typed python rows.

    These dims are 10 – 2,697 rows; parsing them with the csv module and
    shipping via ``createDataFrame`` costs ~1 ms, where a ``spark.read.csv``
    per plan build costs ~150 ms of JVM round trips and a file scan —
    measurable when a pipeline build touches six dims (q25-q28)."""
    import csv as _csv

    out = []
    with open(os.path.join(_RES, name), newline="") as f:
        for rec in _csv.DictReader(f):
            row = []
            for col, kind in spec:
                v = rec.get(col)
                if v in (None, "", "NA"):
                    row.append(None)
                elif kind == "int":
                    row.append(int(float(v)))
                elif kind == "double":
                    row.append(float(v))  # handles 'Inf'
                else:
                    row.append(v)
            out.append(tuple(row))
    return tuple(out)


def sql_lit(v, kind: str) -> str:
    """One typed SQL literal for a VALUES row."""
    if v is None:
        return f"CAST(NULL AS {kind.upper()})"
    if kind == "double":
        if v != v:  # NaN
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"  # repr round-trips IEEE-exactly
    if kind == "int":
        return str(int(v))
    if kind == "boolean":
        return "true" if v else "false"
    return "'" + str(v).replace("'", "''") + "'"


def values_df(spark: SparkSession, rows, spec: tuple[tuple[str, str], ...]) -> DataFrame:
    """A small dimension as a pure-JVM ``VALUES`` relation.

    ``createDataFrame`` over python rows yields an ``ExistingRDD`` scan:
    every broadcast of it runs a Spark job that deserializes pickled rows.
    A ``VALUES`` literal parses to a ``LocalRelation``, which broadcasts
    driver-side with no job at all — measured seconds of per-query savings
    across the ~10 dims the carbon chain touches."""
    if not rows:
        ddl = ", ".join(f"{c} {k.upper()}" for c, k in spec)
        return spark.createDataFrame([], ddl)
    cols = ", ".join(c for c, _ in spec)
    vals = ", ".join(
        "(" + ", ".join(sql_lit(v, k) for v, (_, k) in zip(row, spec)) + ")"
        for row in rows
    )
    return spark.sql(f"SELECT * FROM VALUES {vals} AS t({cols})")


def _dim(spark: SparkSession, name: str, spec: tuple[tuple[str, str], ...]) -> DataFrame:
    return cached(
        spark, name, lambda: values_df(spark, csv_rows(name, spec), spec)
    )


_SPECIES_SPEC = (
    ("SPCD", "int"),
    ("JENKINS_SPGRPCD", "int"),
    ("SFTWD_HRDWD", "string"),
    ("WOODLAND", "string"),
    ("CARBON_RATIO_LIVE", "double"),
    ("WOOD_SPGR_GREENVOL_DRYWT", "double"),
)


def ref_species(spark: SparkSession) -> DataFrame:
    """SPCD-keyed species properties (subset of REF_SPECIES consumed by the
    pipeline: reference ``R/prep_carbon.R:14-22``, ``R/interpolate_data.R:85``)."""
    return _dim(spark, "REF_SPECIES.csv", _SPECIES_SPEC)


def tpa_rules(spark: SparkSession) -> DataFrame:
    """DESIGNCD × [min_DIA, max_DIA) → TPA_UNADJ band rules
    (``data-raw/DESIGNCD_TPA.csv``; 'Inf' parses to +infinity)."""
    return _dim(
        spark,
        "DESIGNCD_TPA.csv",
        (
            ("DESIGNCD", "int"),
            ("min_DIA", "double"),
            ("max_DIA", "double"),
            ("TPA_UNADJ", "double"),
        ),
    )


def decay_prop(spark: SparkSession) -> DataFrame:
    return _dim(
        spark,
        "REF_TREE_DECAY_PROP.csv",
        (
            ("DECAYCD", "int"),
            ("SFTWD_HRDWD", "string"),
            ("DENSITY_PROP", "double"),
            ("BARK_LOSS_PROP", "double"),
            ("BRANCH_LOSS_PROP", "double"),
        ),
    )


def carbon_ratio_dead(spark: SparkSession) -> DataFrame:
    return _dim(
        spark,
        "REF_TREE_CARBON_RATIO_DEAD.csv",
        (
            ("SFTWD_HRDWD", "string"),
            ("DECAYCD", "int"),
            ("CARBON_RATIO", "double"),
        ),
    )


_CRPROP_SPEC = (
    ("CARTgrp", "string"),
    ("Province", "string"),
    ("hwd_yn", "string"),
    ("CRmn", "double"),
    ("Nobs", "string"),
)


def median_crprop(spark: SparkSession) -> DataFrame:
    """Median crown proportion by province × hardwood flag, with literal
    'UNDEFINED' province fallback rows (``data-raw/median_crprop.csv``)."""

    def build() -> DataFrame:
        rows = [
            (*r, "S" if r[2] == "N" else "H")
            for r in csv_rows("median_crprop.csv", _CRPROP_SPEC)
        ]
        spec = (*_CRPROP_SPEC, ("SFTWD_HRDWD", "string"))
        return values_df(spark, rows, spec)

    return cached(spark, "median_crprop.csv", build)


def crprop_undefined() -> dict[str, float]:
    """The 'UNDEFINED'-province crown-proportion fallback values, resolved
    driver-side (no Spark job: the reference reads them with a filter+collect,
    ``R/estimate_carbon.R:27-33``)."""
    return {
        ("S" if r[2] == "N" else "H"): r[3]
        for r in csv_rows("median_crprop.csv", _CRPROP_SPEC)
        if r[1] == "UNDEFINED"
    }


def coef_table(spark: SparkSession, name: str) -> DataFrame:
    """One NSVB coefficient table. Exactly one of the three level keys
    (SPCD_DIVISION, SPCD, JENKINS_SPGRPCD) is non-null per row; SPCD is kept
    as string because planted loblolly/slash pine rows use '1_131'-style
    keys."""
    assert name in COEF_NAMES, name
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("nullValue", "NA")
        .csv(os.path.join(_RES, "coefs", f"{name}_coefs.csv"))
    )
    for c in df.columns:
        if c == "SPCD_DIVISION":
            df = df.withColumn(c, F.col(c).cast("string"))
        elif c == "SPCD":
            df = df.withColumn(c, F.col(c).cast("string"))
        elif c == "JENKINS_SPGRPCD":
            df = df.withColumn(c, F.col(c).cast("int"))
        elif c == "equation":
            df = df.withColumn(c, F.col(c).cast("double"))
        else:
            df = df.withColumn(c, F.col(c).cast("double"))
    return df


def all_coef_tables(spark: SparkSession) -> dict[str, DataFrame]:
    return {n: coef_table(spark, n) for n in COEF_NAMES}
