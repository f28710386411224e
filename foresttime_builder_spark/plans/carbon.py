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
    return out.withColumns(
        {
            "CULL_DECAY_RATIO": r_if_else(live, F.col("CULL_DECAY_RATIO"), 1.0),
            "STANDING_DEAD_CD": r_if_else(live, 0, F.col("STANDING_DEAD_CD")),
            "DECAYCD": r_if_else(live, 0, F.col("DECAYCD")),
            "DECAY_WD": r_if_else(live, 1.0, F.col("DENSITY_PROP")),
            "DECAY_BK": r_if_else(live, 1.0, F.col("BARK_LOSS_PROP")),
            "DECAY_BR": r_if_else(live, 1.0, F.col("BRANCH_LOSS_PROP")),
            "C_FRAC": r_if_else(
                live,
                F.col("CARBON_RATIO_LIVE") * 100,
                F.col("CARBON_RATIO") * 100,
            ),
            "PROVINCE": get_province(F.col("ECOSUBCD")),
            "DIVISION": get_division(F.col("ECOSUBCD")),
            "CULL": F.coalesce(F.col("CULL"), F.lit(0.0)),
        }
    )


def estimate_carbon(df_prepped: DataFrame, keep_all: bool = False) -> DataFrame:
    """Run the NSVB equation system and attach the estimates
    (reference ``R/estimate_carbon.R:10-105``).

    The reference filters to the estimable subset (woodland species and
    missing-height trees excluded) and LEFT-JOINS the estimates back — only
    because its array-indexing code breaks on NAs.  Here the DAG is
    null-safe, so estimates are computed IN PLACE and gated null for
    ineligible rows: same output, no self-join, and the upstream plan is
    executed once instead of twice (SURVEY §2.3 J11 "avoid entirely").

    ``keep_all=True`` returns every intermediate response column plus an
    ``_eligible`` flag (the reference's ``all.vars = TRUE``) — used by the
    differential-test harness; the default mirrors the reference's output
    contract (prepped input columns + ``DRYBIO_AG`` + ``CARBON_AG``).
    """
    spark = df_prepped.sparkSession
    crprop = ref_tables.median_crprop(spark)
    cr_dim = crprop.select(
        F.col("Province").alias("PROVINCE"), "SFTWD_HRDWD", "CRmn"
    )
    # static fallback values resolved driver-side — no collect() job per build
    undef = ref_tables.crprop_undefined()

    eligible = (F.col("JENKINS_SPGRPCD") < 10) & F.col("HT").isNotNull()
    # the in-place mutations below feed the equations; the caller-visible
    # contract keeps the prepped originals
    mutated = ("CR", "STDORGCD", "SPCD", "CULL")
    stash = {f"_orig_{c}": F.col(c) for c in mutated}

    fiadb = (
        df_prepped.withColumns(stash)
        .join(F.broadcast(cr_dim), on=["SFTWD_HRDWD", "PROVINCE"], how="left")
        .withColumns(
            {
                "CRmn": F.coalesce(
                    F.col("CRmn"),
                    F.when(F.col("SFTWD_HRDWD") == "S", F.lit(undef.get("S")))
                    .when(F.col("SFTWD_HRDWD") == "H", F.lit(undef.get("H"))),
                ),
                "BROKEN_TOP": ~(F.col("HT") == F.col("ACTUALHT")),
                "CR": r_if_else(
                    F.col("CR").isNull() & (F.col("STATUSCD") == 1),
                    0.0,
                    F.col("CR"),
                ),
                "STDORGCD": F.coalesce(F.col("STDORGCD"), F.lit(0)),
                "CULL": F.coalesce(F.col("CULL"), F.lit(0.0)),
            }
        )
        .withColumn(
            "SPCD",
            F.when(
                F.col("SPCD").isin(111, 131) & (F.col("STDORGCD") == 1),
                F.concat(F.lit("1_"), F.col("SPCD").cast("string")),
            ).otherwise(F.col("SPCD").cast("string")),
        )
        .withColumn(
            "SPCD_DIVISION", F.concat_ws(" ", F.col("SPCD"), F.col("DIVISION"))
        )
    )

    est = predict_crm2(fiadb).withColumn("_eligible", eligible)
    if keep_all:
        return est

    restore = {c: F.col(f"_orig_{c}") for c in mutated}
    restore["DRYBIO_AG"] = F.when(eligible, F.col("BIOMASS"))
    restore["CARBON_AG"] = F.when(eligible, F.col("CARBON"))
    out = est.withColumns(restore)
    return out.select(*df_prepped.columns, "DRYBIO_AG", "CARBON_AG")


def predict_crm2(data: DataFrame) -> DataFrame:
    """The NSVB 40-column prediction/deduction/harmonization DAG
    (reference ``R/predictCRM2.R:4-626``), as one lazy column plan.

    Columns are added in dependency-ordered ``withColumns`` batches — one
    analyzer pass per *layer* instead of one per column (a sequential
    ``withColumn`` chain over this ~150-column plan costs tens of seconds of
    driver-side analysis before a single task runs)."""
    d = data.withColumn(
        "SPCD_NUMERIC",
        F.regexp_replace(F.col("SPCD"), "^1_", "").cast("double"),
    )
    # var_names mapping (R/predictCRM2.R:29): DBH<-DIA, THT<-HT
    d = d.withColumns(
        {
            "k": F.when(F.col("SPCD_NUMERIC") < 300, 9.0).otherwise(11.0),
            "saw": F.when(F.col("SPCD_NUMERIC") < 300, 7.0).otherwise(9.0),
            "DBH": F.col("DIA"),
            "THT": F.col("HT"),
        }
    )
    dbh, tht, wdsg = F.col("DBH"), F.col("THT"), F.col("WDSG")

    # ---- coefficient resolution: three broadcast joins against pre-merged
    # per-level dims (built driver-side from the static coef CSVs) + one
    # finest-level-wins CASE pick per coefficient. No extra subplan: the
    # earlier distinct-key-space formulation re-executed the whole upstream
    # pipeline at runtime just to feed the broadcast.
    d = nsvb.attach_coefs(d)

    # ---- gross volume predictions ----
    d = d.withColumn(
        "VTOTIB_GROSS",
        nsvb.equation_value(
            "vib", dbh, tht, wdsg, F.col("k"), available=nsvb.available_coefs(d, "vib")
        ),
    )
    d = d.withColumn(
        "VTOTBK_GROSS",
        nsvb.equation_value(
            "vbk", dbh, tht, wdsg, F.col("k"), available=nsvb.available_coefs(d, "vbk")
        ),
    )
    d = d.withColumn("VTOTOB_GROSS", F.col("VTOTIB_GROSS") + F.col("VTOTBK_GROSS"))

    # merch/sawlog heights: (rcumob ⋈ volob) coefs + bisection, floor at 5 ft
    heights = {}
    for name, dlim in (("HT4", F.lit(4.0)), ("HTSAW", F.col("saw"))):
        root = nsvb.find_ht(
            dbh, tht, dlim,
            cf("mh", "a"), cf("mh", "b"), cf("mh", "c"),
            cf("mh", "alpha"), cf("mh", "beta"),
        )
        heights[name] = F.when(root.isNull(), None).otherwise(
            F.greatest(root, F.lit(5.0))
        )
    d = d.withColumns(heights)

    # section volumes from the rcumib ratio profile
    al, be = cf("rib", "alpha"), cf("rib", "beta")
    vib, vob = F.col("VTOTIB_GROSS"), F.col("VTOTOB_GROSS")
    sap = F.col("DIA") < 5.0  # no stump volumes for saplings (R:162)
    d = d.withColumns(
        {
            "VMERIB_GROSS": nsvb.find_vol(al, be, tht, 1.0, F.col("HT4"), vib),
            "VMEROB_GROSS": nsvb.find_vol(al, be, tht, 1.0, F.col("HT4"), vob),
            "VSTPIB_GROSS": F.when(sap, None).otherwise(
                nsvb.find_vol(al, be, tht, 0.0, 1.0, vib)
            ),
            "VSTPOB_GROSS": F.when(sap, None).otherwise(
                nsvb.find_vol(al, be, tht, 0.0, 1.0, vob)
            ),
            "VSAWIB_GROSS": nsvb.find_vol(al, be, tht, 1.0, F.col("HTSAW"), vib),
            "VSAWOB_GROSS": nsvb.find_vol(al, be, tht, 1.0, F.col("HTSAW"), vob),
            # broken-top height ratio (equation 6.1, rcumib coefs)
            "HT_RAT_ADJ": r_if_else(
                F.col("ACTUALHT") < tht,
                F.pow(1 - F.pow(1 - F.col("ACTUALHT") / tht, al), be),
                1.0,
            ),
        }
    )
    d = d.withColumns(
        {
            "VMERBK_GROSS": F.col("VMEROB_GROSS") - F.col("VMERIB_GROSS"),
            "VSTPBK_GROSS": F.col("VSTPOB_GROSS") - F.col("VSTPIB_GROSS"),
            "VTOPIB_GROSS": vib - F.col("VMERIB_GROSS") - F.col("VSTPIB_GROSS"),
            "VTOPOB_GROSS": vob - F.col("VMEROB_GROSS") - F.col("VSTPOB_GROSS"),
            "VSAWBK_GROSS": F.col("VSAWOB_GROSS") - F.col("VSAWIB_GROSS"),
        }
    )
    d = d.withColumn(
        "VTOPBK_GROSS", F.col("VTOPOB_GROSS") - F.col("VTOPIB_GROSS")
    )

    # ---- present (broken-top adjusted) volumes (R/predictCRM2.R:244-288) ----
    adj = F.col("HT_RAT_ADJ")
    d = d.withColumns(
        {
            "VTOTIB_PRESENT": vib * adj,
            "VTOTBK_PRESENT": F.col("VTOTBK_GROSS") * adj,
            "VMERIB_PRESENT": r_if_else(
                F.col("ACTUALHT") < F.col("HT4"),
                vib * adj - F.col("VSTPIB_GROSS"),
                F.col("VMERIB_GROSS"),
            ),
            "VMERBK_PRESENT": r_if_else(
                F.col("ACTUALHT") < F.col("HT4"),
                F.col("VTOTBK_GROSS") * adj - F.col("VSTPBK_GROSS"),
                F.col("VMERBK_GROSS"),
            ),
            "VSAWIB_PRESENT": r_if_else(
                F.col("ACTUALHT") < F.col("HTSAW"),
                vib * adj - F.col("VSTPIB_GROSS"),
                F.col("VSAWIB_GROSS"),
            ),
            "VSAWBK_PRESENT": r_if_else(
                F.col("ACTUALHT") < F.col("HTSAW"),
                F.col("VTOTBK_GROSS") * adj - F.col("VSTPBK_GROSS"),
                F.col("VSAWBK_GROSS"),
            ),
            "VSTPIB_PRESENT": F.col("VSTPIB_GROSS"),
            "VSTPBK_PRESENT": F.col("VSTPBK_GROSS"),
            "VSTPOB_PRESENT": F.col("VSTPOB_GROSS"),
        }
    )
    # broken top below bole height → zero top volumes (null-guarded as in R)
    top_zero = (F.col("ACTUALHT") < F.col("HT4")) & F.col("HT4").isNotNull()
    d = d.withColumns(
        {
            "VTOTOB_PRESENT": F.col("VTOTIB_PRESENT") + F.col("VTOTBK_PRESENT"),
            "VMEROB_PRESENT": F.col("VMERIB_PRESENT") + F.col("VMERBK_PRESENT"),
            "VSAWOB_PRESENT": F.col("VSAWIB_PRESENT") + F.col("VSAWBK_PRESENT"),
            "VTOPIB_PRESENT": F.when(top_zero, 0.0).otherwise(
                F.col("VTOTIB_PRESENT")
                - F.col("VMERIB_PRESENT")
                - F.col("VSTPIB_PRESENT")
            ),
            "VTOPBK_PRESENT": F.when(top_zero, 0.0).otherwise(
                F.col("VTOTBK_PRESENT")
                - F.col("VMERBK_PRESENT")
                - F.col("VSTPBK_PRESENT")
            ),
        }
    )
    d = d.withColumns(
        {
            "VTOPOB_PRESENT": F.when(top_zero, 0.0).otherwise(
                F.col("VTOPIB_PRESENT") + F.col("VTOPBK_PRESENT")
            ),
            # ---- sound volumes: cull/decay (R/predictCRM2.R:292-321) ----
            "SND_WOOD_DECAY": r_if_else(
                F.col("CULL") < 99, 1 - F.col("CULL") / 100, 0.0
            ),
        }
    )
    secs = ("VTOT", "VMER", "VSTP", "VTOP", "VSAW")
    d = d.withColumns(
        {
            **{
                f"{sec}IB_SOUND": F.col(f"{sec}IB_PRESENT") * F.col("SND_WOOD_DECAY")
                for sec in secs
            },
            **{
                f"{sec}BK_SOUND": F.col(f"{sec}BK_PRESENT") * F.col("DECAY_BK")
                for sec in secs
            },
        }
    )
    d = d.withColumns(
        {
            f"{sec}OB_SOUND": F.col(f"{sec}IB_SOUND") + F.col(f"{sec}BK_SOUND")
            for sec in secs
        }
    )

    # sawlog DBH thresholds: 9" softwood / 11" hardwood, else null
    below_saw = (
        ((F.col("SFTWD_HRDWD") == "S") & (dbh < 9.0))
        | ((F.col("SFTWD_HRDWD") == "H") & (dbh < 11.0))
    ) & dbh.isNotNull()
    d = d.withColumns(
        {
            c: F.when(below_saw, None).otherwise(F.col(c))
            for x in ("IB", "OB", "BK")
            for y in ("GROSS", "PRESENT", "SOUND")
            for c in (f"VSAW{x}_{y}",)
        }
    )

    # ---- biomass predictions (R/predictCRM2.R:358-417) ----
    # Total and Branch switch to equation 3.1 at the Jenkins level
    bio = {}
    for prefix, outcol, jenkins31 in (
        ("tb", "Total", True),
        ("bb", "Bark", False),
        ("br", "Branch", True),
        ("fo", "FOLIAGE", False),
    ):
        eq = cf(prefix, "equation")
        if jenkins31:
            eq = F.when(F.col(f"{prefix}_level") == 3, F.lit(3.1)).otherwise(eq)
        bio[outcol] = nsvb.equation_value(
            prefix, dbh, tht, wdsg, F.col("k"), eq,
            available=nsvb.available_coefs(d, prefix),
        )
    d = d.withColumns(bio)

    # ---- reductions (R/predictCRM2.R:425-466) ----
    d = d.withColumns(
        {
            "Wood": vib * wdsg * LB_PER_FT3,
            "CULL_REDUCTION": r_if_else(
                F.col("STANDING_DEAD_CD") < 1,
                1 - (1 - F.col("CULL_DECAY_RATIO")) * F.col("CULL") / 100,
                1.0,
            ),
            "BARK_REDUCTION": adj * F.col("DECAY_BK") * F.col("DECAY_WD"),
            # R pmax propagates NA; Spark greatest ignores nulls — guard
            "CR": F.when(F.col("CR").isNull(), None).otherwise(
                F.greatest(F.col("CR"), F.lit(1.0))
            ),
        }
    )
    d = d.withColumns(
        {
            "WOOD_REDUCTION": adj * F.col("CULL_REDUCTION") * F.col("DECAY_WD"),
            "CRprop_HT": r_if_else(
                F.col("STANDING_DEAD_CD") == 1,
                F.col("CRmn") / 100,
                1 - F.col("ACTUALHT") / tht * (1 - F.col("CR") / 100),
            ),
        }
    )
    bcp_raw = (F.col("ACTUALHT") - (1 - F.col("CRprop_HT")) * tht) / F.nullif(
        F.col("CRprop_HT") * tht, F.lit(0.0)
    )
    bcp0 = F.when(bcp_raw.isNull(), None).otherwise(F.greatest(bcp_raw, F.lit(0.0)))
    d = d.withColumn(
        "broken_crn_prop",
        F.when(~F.col("BROKEN_TOP"), 1.0).otherwise(
            r_if_else(bcp0 < 0.01, 0.0, bcp0)
        ),
    )
    d = d.withColumns(
        {
            "BRANCH_REDUCTION": F.col("broken_crn_prop")
            * F.col("DECAY_BR")
            * F.col("DECAY_WD"),
            "FOLIAGE_REDUCTION": r_if_else(
                F.col("STANDING_DEAD_CD") == 1, 0.0, F.col("broken_crn_prop")
            ),
        }
    )
    d = d.withColumns(
        {
            "Wood_Reduced": F.col("Wood") * F.col("WOOD_REDUCTION"),
            "Bark_Reduced": F.col("Bark") * F.col("BARK_REDUCTION"),
            "Branch_Reduced": F.col("Branch") * F.col("BRANCH_REDUCTION"),
            "Foliage_Reduced": F.col("FOLIAGE") * F.col("FOLIAGE_REDUCTION"),
        }
    )
    # ---- harmonization (R/predictCRM2.R:485-534) ----
    d = d.withColumns(
        {
            "AGB_Reduction_Factor": (
                F.col("Wood_Reduced") + F.col("Bark_Reduced") + F.col("Branch_Reduced")
            )
            / F.nullif(F.col("Wood") + F.col("Bark") + F.col("Branch"), F.lit(0.0)),
            "TotalC": F.col("Wood_Reduced")
            + F.col("Bark_Reduced")
            + F.col("Branch_Reduced"),
        }
    )
    d = d.withColumn("Total_Reduced", F.col("Total") * F.col("AGB_Reduction_Factor"))
    d = d.withColumns(
        {
            "Diff": F.col("Total_Reduced") - F.col("TotalC"),
            **{
                f"{comp}R": F.col(f"{comp}_Reduced")
                / F.nullif(F.col("TotalC"), F.lit(0.0))
                for comp in ("Wood", "Bark", "Branch")
            },
        }
    )
    d = d.withColumns(
        {
            f"{comp}F": F.col("Diff") * F.col(f"{comp}R") + F.col(f"{comp}_Reduced")
            for comp in ("Wood", "Bark", "Branch")
        }
    )
    d = d.withColumns(
        {
            "WDSGAdj": F.col("WoodF")
            / F.nullif(F.col("VTOTIB_PRESENT"), F.lit(0.0))
            / LB_PER_FT3,
            "BKSGAdj": F.col("BarkF")
            / F.nullif(F.col("VTOTBK_PRESENT"), F.lit(0.0))
            / LB_PER_FT3,
        }
    )
    wsecs = ("MER", "STP", "TOP", "SAW")
    d = d.withColumns(
        {
            **{
                f"W{sec}IB": F.col(f"V{sec}IB_PRESENT") * F.col("WDSGAdj") * LB_PER_FT3
                for sec in wsecs
            },
            **{
                f"W{sec}BK": F.col(f"V{sec}BK_PRESENT") * F.col("BKSGAdj") * LB_PER_FT3
                for sec in wsecs
            },
            "WTOTIB": F.col("WoodF"),
            "WTOTBK": F.col("BarkF"),
            "WTOTOB": F.col("WoodF") + F.col("BarkF"),
            "WTOTBCH": F.col("BranchF"),
            "FOLIAGE": F.col("Foliage_Reduced"),
            "BIOMASS": F.col("Total_Reduced"),
        }
    )
    d = d.withColumns(
        {
            **{f"W{sec}OB": F.col(f"W{sec}IB") + F.col(f"W{sec}BK") for sec in wsecs},
            "CARBON": F.col("BIOMASS") * (F.col("C_FRAC") / 100),
        }
    )
    d = d.withColumns(
        {
            "WMERBCH": F.col("WTOTBCH") + F.col("WTOPOB"),
            "AGB": F.col("BIOMASS") + F.col("FOLIAGE"),
        }
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
    d = d.withColumns(
        {c: F.when(dbh < 5.0, None).otherwise(F.col(c)) for c in sapling_na}
    )
    return d
