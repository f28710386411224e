"""NSVB carbon/biomass estimation pipeline, Spark-first.

Stage parity with the reference chain ``prep_carbon → estimate_carbon →
predictCRM2`` (reference ``R/prep_carbon.R:11-91``,
``R/estimate_carbon.R:10-105``, ``R/predictCRM2.R:4-626``), re-expressed as
broadcast reference joins + one lazy ``withColumn`` DAG:

- the reference's ~14 merge-by-ID passes (one per predicted response) are
  pessimizations of eager R evaluation and are **not** copied — every
  response is a column expression over the same row (SURVEY §2.3 J15/§4);
- coefficient precedence (``combineLevels2``) becomes three broadcast joins
  + matched-level pick per response (:mod:`..functions.nsvb`);
- the only non-codegen step is the vectorized bisection for HT4/HTSAW.

Division-by-zero edges (zero combined biomass or zero present volume) yield
null here — Spark/ANSI-friendly — where R would produce Inf/NaN
(``R/predictCRM2.R:485-529``); both are "no meaningful estimate" and the
oracle mirrors the null convention via ``nullif``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from foresttime_builder_spark.functions.helpers import (
    get_division,
    get_province,
    r_if_else,
)
from foresttime_builder_spark.functions import nsvb
from foresttime_builder_spark.functions.nsvb import cf
from foresttime_builder_spark.sources import ref_tables

LB_PER_FT3 = 62.4


def prep_carbon(df: DataFrame) -> DataFrame:
    """Attach species / decay / carbon-ratio reference data and derive the
    Walker-code input columns (reference ``R/prep_carbon.R:11-91``)."""
    spark = df.sparkSession
    species = ref_tables.ref_species(spark).select(
        "SPCD",
        "JENKINS_SPGRPCD",
        "SFTWD_HRDWD",
        "CARBON_RATIO_LIVE",
        F.col("WOOD_SPGR_GREENVOL_DRYWT").alias("WDSG"),
    )
    decay = ref_tables.decay_prop(spark)
    cull_ratio = (
        decay.filter(F.col("DECAYCD") == 3)
        .select("SFTWD_HRDWD", F.col("DENSITY_PROP").alias("CULL_DECAY_RATIO"))
    )
    dead_ratio = ref_tables.carbon_ratio_dead(spark)

    out = (
        df.join(F.broadcast(species), on="SPCD", how="left")
        .join(F.broadcast(cull_ratio), on="SFTWD_HRDWD", how="left")
        .join(F.broadcast(decay), on=["DECAYCD", "SFTWD_HRDWD"], how="left")
        .join(F.broadcast(dead_ratio), on=["DECAYCD", "SFTWD_HRDWD"], how="left")
    )

    live = F.col("STATUSCD") == 1
    out = (
        out.withColumn(
            "CULL_DECAY_RATIO", r_if_else(live, F.col("CULL_DECAY_RATIO"), 1.0)
        )
        .withColumn(
            "STANDING_DEAD_CD", r_if_else(live, 0, F.col("STANDING_DEAD_CD"))
        )
        .withColumn("DECAYCD", r_if_else(live, 0, F.col("DECAYCD")))
        .withColumn("DECAY_WD", r_if_else(live, 1.0, F.col("DENSITY_PROP")))
        .withColumn("DECAY_BK", r_if_else(live, 1.0, F.col("BARK_LOSS_PROP")))
        .withColumn("DECAY_BR", r_if_else(live, 1.0, F.col("BRANCH_LOSS_PROP")))
        .withColumn(
            "C_FRAC",
            r_if_else(
                live,
                F.col("CARBON_RATIO_LIVE") * 100,
                F.col("CARBON_RATIO") * 100,
            ),
        )
        .withColumn("PROVINCE", get_province(F.col("ECOSUBCD")))
        .withColumn("DIVISION", get_division(F.col("ECOSUBCD")))
        .withColumn("CULL", F.coalesce(F.col("CULL"), F.lit(0.0)))
    )
    return out


def estimate_carbon(df_prepped: DataFrame, keep_all: bool = False) -> DataFrame:
    """Run the NSVB equation system on the estimable subset and join the
    estimates back (reference ``R/estimate_carbon.R:10-105``).

    ``keep_all=True`` returns the estimable-subset rows with every
    intermediate response column (the reference's ``all.vars = TRUE``) —
    used by the differential-test harness; the default mirrors the
    reference's output contract (input + ``DRYBIO_AG`` + ``CARBON_AG``).
    """
    spark = df_prepped.sparkSession
    crprop = ref_tables.median_crprop(spark)
    cr_dim = crprop.select(
        F.col("Province").alias("PROVINCE"), "SFTWD_HRDWD", "CRmn"
    )
    undef = {
        r["SFTWD_HRDWD"]: r["CRmn"]
        for r in crprop.filter(F.col("Province") == "UNDEFINED").collect()
    }

    fiadb = (
        df_prepped.filter((F.col("JENKINS_SPGRPCD") < 10) & F.col("HT").isNotNull())
        .join(F.broadcast(cr_dim), on=["SFTWD_HRDWD", "PROVINCE"], how="left")
        .withColumn(
            "CRmn",
            F.coalesce(
                F.col("CRmn"),
                F.when(F.col("SFTWD_HRDWD") == "S", F.lit(undef.get("S")))
                .when(F.col("SFTWD_HRDWD") == "H", F.lit(undef.get("H"))),
            ),
        )
        .withColumn("BROKEN_TOP", ~(F.col("HT") == F.col("ACTUALHT")))
        .withColumn(
            "CR",
            r_if_else(
                F.col("CR").isNull() & (F.col("STATUSCD") == 1), 0.0, F.col("CR")
            ),
        )
        .withColumn("STDORGCD", F.coalesce(F.col("STDORGCD"), F.lit(0)))
        .withColumn(
            "SPCD",
            F.when(
                F.col("SPCD").isin(111, 131) & (F.col("STDORGCD") == 1),
                F.concat(F.lit("1_"), F.col("SPCD").cast("string")),
            ).otherwise(F.col("SPCD").cast("string")),
        )
        .withColumn("CULL", F.coalesce(F.col("CULL"), F.lit(0.0)))
        .withColumn(
            "SPCD_DIVISION", F.concat_ws(" ", F.col("SPCD"), F.col("DIVISION"))
        )
    )

    est = predict_crm2(fiadb)
    if keep_all:
        return est

    back = est.select(
        "plot_ID",
        "tree_ID",
        "YEAR",
        F.col("BIOMASS").alias("DRYBIO_AG"),
        F.col("CARBON").alias("CARBON_AG"),
    )
    return df_prepped.join(back, on=["plot_ID", "tree_ID", "YEAR"], how="left")


def predict_crm2(data: DataFrame) -> DataFrame:
    """The NSVB 40-column prediction/deduction/harmonization DAG
    (reference ``R/predictCRM2.R:4-626``), as one lazy column plan."""
    spark = data.sparkSession
    coefs = ref_tables.all_coef_tables(spark)

    d = data.withColumn(
        "SPCD_NUMERIC",
        F.regexp_replace(F.col("SPCD"), "^1_", "").cast("double"),
    )
    d = d.withColumn("k", F.when(F.col("SPCD_NUMERIC") < 300, 9.0).otherwise(11.0))
    d = d.withColumn("saw", F.when(F.col("SPCD_NUMERIC") < 300, 7.0).otherwise(9.0))
    # var_names mapping (R/predictCRM2.R:29): DBH<-DIA, THT<-HT
    d = d.withColumn("DBH", F.col("DIA")).withColumn("THT", F.col("HT"))
    dbh, tht, wdsg = F.col("DBH"), F.col("THT"), F.col("WDSG")

    # ---- gross volume predictions (coef resolution per response) ----
    d = nsvb.resolve_coefs(d, coefs["volib"], "vib")
    d = d.withColumn(
        "VTOTIB_GROSS",
        nsvb.equation_value(
            "vib", dbh, tht, wdsg, F.col("k"), available=nsvb.available_coefs(d, "vib")
        ),
    )
    d = nsvb.resolve_coefs(d, coefs["volbk"], "vbk")
    d = d.withColumn(
        "VTOTBK_GROSS",
        nsvb.equation_value(
            "vbk", dbh, tht, wdsg, F.col("k"), available=nsvb.available_coefs(d, "vbk")
        ),
    )
    d = d.withColumn("VTOTOB_GROSS", F.col("VTOTIB_GROSS") + F.col("VTOTBK_GROSS"))

    # merch/sawlog heights: (rcumob ⋈ volob) coefs + bisection, floor at 5 ft
    pair = lambda lv: nsvb.merge_coef_pair(coefs["rcumob"], coefs["volob"], lv)
    d = nsvb.resolve_coefs(d, pair, "mh")
    for name, dlim in (("HT4", F.lit(4.0)), ("HTSAW", F.col("saw"))):
        root = nsvb.find_ht(
            dbh, tht, dlim,
            cf("mh", "a"), cf("mh", "b"), cf("mh", "c"),
            cf("mh", "alpha"), cf("mh", "beta"),
        )
        d = d.withColumn(
            name,
            F.when(root.isNull(), None).otherwise(F.greatest(root, F.lit(5.0))),
        )

    # section volumes from the rcumib ratio profile
    d = nsvb.resolve_coefs(d, coefs["rcumib"], "rib")
    al, be = cf("rib", "alpha"), cf("rib", "beta")
    vib, vob = F.col("VTOTIB_GROSS"), F.col("VTOTOB_GROSS")
    d = (
        d.withColumn("VMERIB_GROSS", nsvb.find_vol(al, be, tht, 1.0, F.col("HT4"), vib))
        .withColumn("VMEROB_GROSS", nsvb.find_vol(al, be, tht, 1.0, F.col("HT4"), vob))
        .withColumn("VMERBK_GROSS", F.col("VMEROB_GROSS") - F.col("VMERIB_GROSS"))
        .withColumn("VSTPIB_GROSS", nsvb.find_vol(al, be, tht, 0.0, 1.0, vib))
        .withColumn("VSTPOB_GROSS", nsvb.find_vol(al, be, tht, 0.0, 1.0, vob))
    )
    # no stump volumes for saplings (R/predictCRM2.R:162)
    for c in ("VSTPIB_GROSS", "VSTPOB_GROSS"):
        d = d.withColumn(c, F.when(F.col("DIA") < 5.0, None).otherwise(F.col(c)))
    d = (
        d.withColumn("VSTPBK_GROSS", F.col("VSTPOB_GROSS") - F.col("VSTPIB_GROSS"))
        .withColumn(
            "VTOPIB_GROSS", vib - F.col("VMERIB_GROSS") - F.col("VSTPIB_GROSS")
        )
        .withColumn(
            "VTOPOB_GROSS", vob - F.col("VMEROB_GROSS") - F.col("VSTPOB_GROSS")
        )
        .withColumn("VTOPBK_GROSS", F.col("VTOPOB_GROSS") - F.col("VTOPIB_GROSS"))
        .withColumn("VSAWIB_GROSS", nsvb.find_vol(al, be, tht, 1.0, F.col("HTSAW"), vib))
        .withColumn("VSAWOB_GROSS", nsvb.find_vol(al, be, tht, 1.0, F.col("HTSAW"), vob))
        .withColumn("VSAWBK_GROSS", F.col("VSAWOB_GROSS") - F.col("VSAWIB_GROSS"))
    )

    # broken-top height ratio (equation 6.1, rcumib coefs)
    d = d.withColumn(
        "HT_RAT_ADJ",
        F.pow(1 - F.pow(1 - F.col("ACTUALHT") / tht, al), be),
    )
    d = d.withColumn(
        "HT_RAT_ADJ",
        r_if_else(F.col("ACTUALHT") < tht, F.col("HT_RAT_ADJ"), 1.0),
    )

    # ---- present (broken-top adjusted) volumes (R/predictCRM2.R:244-288) ----
    adj = F.col("HT_RAT_ADJ")
    d = (
        d.withColumn("VTOTIB_PRESENT", vib * adj)
        .withColumn("VTOTBK_PRESENT", F.col("VTOTBK_GROSS") * adj)
        .withColumn(
            "VTOTOB_PRESENT", F.col("VTOTIB_PRESENT") + F.col("VTOTBK_PRESENT")
        )
        .withColumn(
            "VMERIB_PRESENT",
            r_if_else(
                F.col("ACTUALHT") < F.col("HT4"),
                vib * adj - F.col("VSTPIB_GROSS"),
                F.col("VMERIB_GROSS"),
            ),
        )
        .withColumn(
            "VMERBK_PRESENT",
            r_if_else(
                F.col("ACTUALHT") < F.col("HT4"),
                F.col("VTOTBK_GROSS") * adj - F.col("VSTPBK_GROSS"),
                F.col("VMERBK_GROSS"),
            ),
        )
        .withColumn(
            "VMEROB_PRESENT", F.col("VMERIB_PRESENT") + F.col("VMERBK_PRESENT")
        )
        .withColumn(
            "VSAWIB_PRESENT",
            r_if_else(
                F.col("ACTUALHT") < F.col("HTSAW"),
                vib * adj - F.col("VSTPIB_GROSS"),
                F.col("VSAWIB_GROSS"),
            ),
        )
        .withColumn(
            "VSAWBK_PRESENT",
            r_if_else(
                F.col("ACTUALHT") < F.col("HTSAW"),
                F.col("VTOTBK_GROSS") * adj - F.col("VSTPBK_GROSS"),
                F.col("VSAWBK_GROSS"),
            ),
        )
        .withColumn(
            "VSAWOB_PRESENT", F.col("VSAWIB_PRESENT") + F.col("VSAWBK_PRESENT")
        )
        .withColumn("VSTPIB_PRESENT", F.col("VSTPIB_GROSS"))
        .withColumn("VSTPBK_PRESENT", F.col("VSTPBK_GROSS"))
        .withColumn("VSTPOB_PRESENT", F.col("VSTPOB_GROSS"))
        .withColumn(
            "VTOPIB_PRESENT",
            F.col("VTOTIB_PRESENT") - F.col("VMERIB_PRESENT") - F.col("VSTPIB_PRESENT"),
        )
        .withColumn(
            "VTOPBK_PRESENT",
            F.col("VTOTBK_PRESENT") - F.col("VMERBK_PRESENT") - F.col("VSTPBK_PRESENT"),
        )
        .withColumn(
            "VTOPOB_PRESENT", F.col("VTOPIB_PRESENT") + F.col("VTOPBK_PRESENT")
        )
    )
    # broken top below bole height → zero top volumes (null-guarded as in R)
    top_zero = (F.col("ACTUALHT") < F.col("HT4")) & F.col("HT4").isNotNull()
    for c in ("VTOPIB_PRESENT", "VTOPBK_PRESENT", "VTOPOB_PRESENT"):
        d = d.withColumn(c, F.when(top_zero, 0.0).otherwise(F.col(c)))

    # ---- sound volumes: cull/decay deductions (R/predictCRM2.R:292-321) ----
    d = d.withColumn(
        "SND_WOOD_DECAY",
        r_if_else(F.col("CULL") < 99, 1 - F.col("CULL") / 100, 0.0),
    )
    for sec in ("VTOT", "VMER", "VSTP", "VTOP", "VSAW"):
        d = d.withColumn(
            f"{sec}IB_SOUND", F.col(f"{sec}IB_PRESENT") * F.col("SND_WOOD_DECAY")
        )
        d = d.withColumn(
            f"{sec}BK_SOUND", F.col(f"{sec}BK_PRESENT") * F.col("DECAY_BK")
        )
        d = d.withColumn(
            f"{sec}OB_SOUND", F.col(f"{sec}IB_SOUND") + F.col(f"{sec}BK_SOUND")
        )

    # sawlog DBH thresholds: 9" softwood / 11" hardwood, else null
    saw_cols = [
        f"VSAW{x}_{y}" for x in ("IB", "OB", "BK") for y in ("GROSS", "PRESENT", "SOUND")
    ]
    below_saw = (
        ((F.col("SFTWD_HRDWD") == "S") & (dbh < 9.0))
        | ((F.col("SFTWD_HRDWD") == "H") & (dbh < 11.0))
    ) & dbh.isNotNull()
    for c in saw_cols:
        d = d.withColumn(c, F.when(below_saw, None).otherwise(F.col(c)))

    # ---- biomass predictions (R/predictCRM2.R:358-417) ----
    # Total and Branch switch to equation 3.1 at the Jenkins level
    for prefix, table, outcol, jenkins31 in (
        ("tb", "total_biomass", "Total", True),
        ("bb", "bark_biomass", "Bark", False),
        ("br", "branch_biomass", "Branch", True),
        ("fo", "foliage", "FOLIAGE", False),
    ):
        d = nsvb.resolve_coefs(d, coefs[table], prefix)
        eq = cf(prefix, "equation")
        if jenkins31:
            eq = F.when(F.col(f"{prefix}_level") == 3, F.lit(3.1)).otherwise(eq)
        d = d.withColumn(
            outcol,
            nsvb.equation_value(
                prefix, dbh, tht, wdsg, F.col("k"), eq,
                available=nsvb.available_coefs(d, prefix),
            ),
        )

    d = d.withColumn("Wood", vib * wdsg * LB_PER_FT3)

    # ---- reductions (R/predictCRM2.R:425-466) ----
    d = d.withColumn(
        "CULL_REDUCTION",
        r_if_else(
            F.col("STANDING_DEAD_CD") < 1,
            1 - (1 - F.col("CULL_DECAY_RATIO")) * F.col("CULL") / 100,
            1.0,
        ),
    )
    d = d.withColumn(
        "WOOD_REDUCTION", adj * F.col("CULL_REDUCTION") * F.col("DECAY_WD")
    )
    d = d.withColumn("BARK_REDUCTION", adj * F.col("DECAY_BK") * F.col("DECAY_WD"))

    # R pmax propagates NA; Spark greatest ignores nulls — guard explicitly
    d = d.withColumn(
        "CR",
        F.when(F.col("CR").isNull(), None).otherwise(
            F.greatest(F.col("CR"), F.lit(1.0))
        ),
    )
    d = d.withColumn(
        "CRprop_HT",
        1 - F.col("ACTUALHT") / tht * (1 - F.col("CR") / 100),
    )
    d = d.withColumn(
        "CRprop_HT",
        r_if_else(
            F.col("STANDING_DEAD_CD") == 1, F.col("CRmn") / 100, F.col("CRprop_HT")
        ),
    )
    bcp_raw = (F.col("ACTUALHT") - (1 - F.col("CRprop_HT")) * tht) / F.nullif(
        F.col("CRprop_HT") * tht, F.lit(0.0)
    )
    d = d.withColumn(
        "broken_crn_prop",
        F.when(bcp_raw.isNull(), None).otherwise(F.greatest(bcp_raw, F.lit(0.0))),
    )
    d = d.withColumn(
        "broken_crn_prop",
        r_if_else(F.col("broken_crn_prop") < 0.01, 0.0, F.col("broken_crn_prop")),
    )
    d = d.withColumn(
        "broken_crn_prop",
        F.when(~F.col("BROKEN_TOP"), 1.0).otherwise(F.col("broken_crn_prop")),
    )
    d = d.withColumn(
        "BRANCH_REDUCTION",
        F.col("broken_crn_prop") * F.col("DECAY_BR") * F.col("DECAY_WD"),
    )
    d = d.withColumn(
        "FOLIAGE_REDUCTION",
        r_if_else(
            F.col("STANDING_DEAD_CD") == 1, 0.0, F.col("broken_crn_prop")
        ),
    )

    d = (
        d.withColumn("Wood_Reduced", F.col("Wood") * F.col("WOOD_REDUCTION"))
        .withColumn("Bark_Reduced", F.col("Bark") * F.col("BARK_REDUCTION"))
        .withColumn("Branch_Reduced", F.col("Branch") * F.col("BRANCH_REDUCTION"))
        .withColumn("Foliage_Reduced", F.col("FOLIAGE") * F.col("FOLIAGE_REDUCTION"))
        .withColumn(
            "AGB_Reduction_Factor",
            (F.col("Wood_Reduced") + F.col("Bark_Reduced") + F.col("Branch_Reduced"))
            / F.nullif(F.col("Wood") + F.col("Bark") + F.col("Branch"), F.lit(0.0)),
        )
        .withColumn("Total_Reduced", F.col("Total") * F.col("AGB_Reduction_Factor"))
    )

    # ---- harmonization (R/predictCRM2.R:485-534) ----
    d = (
        d.withColumn(
            "TotalC",
            F.col("Wood_Reduced") + F.col("Bark_Reduced") + F.col("Branch_Reduced"),
        )
        .withColumn("Diff", F.col("Total_Reduced") - F.col("TotalC"))
    )
    for comp in ("Wood", "Bark", "Branch"):
        d = d.withColumn(
            f"{comp}R",
            F.col(f"{comp}_Reduced") / F.nullif(F.col("TotalC"), F.lit(0.0)),
        )
        d = d.withColumn(f"{comp}Add", F.col("Diff") * F.col(f"{comp}R"))
        d = d.withColumn(
            f"{comp}F", F.col(f"{comp}Add") + F.col(f"{comp}_Reduced")
        )

    d = d.withColumn(
        "WDSGAdj",
        F.col("WoodF") / F.nullif(F.col("VTOTIB_PRESENT"), F.lit(0.0)) / LB_PER_FT3,
    ).withColumn(
        "BKSGAdj",
        F.col("BarkF") / F.nullif(F.col("VTOTBK_PRESENT"), F.lit(0.0)) / LB_PER_FT3,
    )

    for sec in ("MER", "STP", "TOP", "SAW"):
        d = d.withColumn(
            f"W{sec}IB", F.col(f"V{sec}IB_PRESENT") * F.col("WDSGAdj") * LB_PER_FT3
        )
        d = d.withColumn(
            f"W{sec}BK", F.col(f"V{sec}BK_PRESENT") * F.col("BKSGAdj") * LB_PER_FT3
        )
        d = d.withColumn(f"W{sec}OB", F.col(f"W{sec}IB") + F.col(f"W{sec}BK"))

    d = (
        d.withColumn("WTOTIB", F.col("WoodF"))
        .withColumn("WTOTBK", F.col("BarkF"))
        .withColumn("WTOTOB", F.col("WoodF") + F.col("BarkF"))
        .withColumn("WTOTBCH", F.col("BranchF"))
        .withColumn("WMERBCH", F.col("WTOTBCH") + F.col("WTOPOB"))
        .withColumn("FOLIAGE", F.col("Foliage_Reduced"))
        .withColumn("BIOMASS", F.col("Total_Reduced"))
        .withColumn("CARBON", F.col("BIOMASS") * (F.col("C_FRAC") / 100))
        .withColumn("AGB", F.col("BIOMASS") + F.col("FOLIAGE"))
    )

    # sapling rule: merch/sawlog/stump/top details are not reported
    # (R/predictCRM2.R:548-579)
    sapling_na = (
        "VMERBK_GROSS", "VMERBK_SOUND", "VMERIB_GROSS", "VMERIB_SOUND",
        "VSAWBK_GROSS", "VSAWBK_SOUND", "VSAWIB_GROSS", "VSAWIB_SOUND",
        "VSTPBK_GROSS", "VSTPBK_SOUND", "VSTPIB_GROSS", "VSTPIB_SOUND",
        "VTOPBK_GROSS", "VTOPBK_SOUND", "VTOPIB_GROSS", "VTOPIB_SOUND",
        "WMERBK", "WMERIB", "WSTPBK", "WSTPIB", "WTOPBK", "WTOPIB",
    )
    for c in sapling_na:
        d = d.withColumn(c, F.when(dbh < 5.0, None).otherwise(F.col(c)))
    return d
