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


def _read_csv(spark: SparkSession, name: str, schema: str | None = None) -> DataFrame:
    path = os.path.join(_RES, name)
    reader = spark.read.option("header", True).option("nullValue", "NA")
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def ref_species(spark: SparkSession) -> DataFrame:
    """SPCD-keyed species properties (subset of REF_SPECIES consumed by the
    pipeline: reference ``R/prep_carbon.R:14-22``, ``R/interpolate_data.R:85``)."""
    # JENKINS_SPGRPCD is stored as "7.0"-style floats; an INT schema would
    # silently null it under PERMISSIVE csv parsing
    return _read_csv(
        spark,
        "REF_SPECIES.csv",
        "SPCD INT, JENKINS_SPGRPCD DOUBLE, SFTWD_HRDWD STRING, WOODLAND STRING, "
        "CARBON_RATIO_LIVE DOUBLE, WOOD_SPGR_GREENVOL_DRYWT DOUBLE",
    ).withColumn("JENKINS_SPGRPCD", F.col("JENKINS_SPGRPCD").cast("int"))


def tpa_rules(spark: SparkSession) -> DataFrame:
    """DESIGNCD × [min_DIA, max_DIA) → TPA_UNADJ band rules
    (``data-raw/DESIGNCD_TPA.csv``; 'Inf' parses to +infinity)."""
    df = _read_csv(
        spark,
        "DESIGNCD_TPA.csv",
        "DESIGNCD INT, min_DIA DOUBLE, max_DIA STRING, TPA_UNADJ DOUBLE",
    )
    return df.withColumn(
        "max_DIA",
        F.when(F.col("max_DIA") == "Inf", F.lit(float("inf"))).otherwise(
            F.col("max_DIA").cast("double")
        ),
    )


def decay_prop(spark: SparkSession) -> DataFrame:
    return _read_csv(
        spark,
        "REF_TREE_DECAY_PROP.csv",
        "CN STRING, DECAYCD INT, SFTWD_HRDWD STRING, DENSITY_PROP DOUBLE, "
        "BARK_LOSS_PROP DOUBLE, BRANCH_LOSS_PROP DOUBLE",
    ).drop("CN")


def carbon_ratio_dead(spark: SparkSession) -> DataFrame:
    return _read_csv(
        spark,
        "REF_TREE_CARBON_RATIO_DEAD.csv",
        "CN STRING, SFTWD_HRDWD STRING, DECAYCD INT, CARBON_RATIO DOUBLE",
    ).drop("CN")


def median_crprop(spark: SparkSession) -> DataFrame:
    """Median crown proportion by province × hardwood flag, with literal
    'UNDEFINED' province fallback rows (``data-raw/median_crprop.csv``)."""
    df = _read_csv(
        spark,
        "median_crprop.csv",
        "CARTgrp STRING, Province STRING, hwd_yn STRING, CRmn DOUBLE, Nobs STRING",
    )
    return df.withColumn(
        "SFTWD_HRDWD", F.when(F.col("hwd_yn") == "N", "S").otherwise("H")
    )


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
