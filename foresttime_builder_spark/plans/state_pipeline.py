"""End-to-end per-state pipeline driver + Parquet sink.

Replaces the reference's CI-level fan-out (one GitHub Actions runner per
state, ``scripts/state-parquet.R:1-49`` + ``.github/workflows/
run_workflow.yml:40-48``) with one Spark job over any number of states:

- :func:`run_states` runs ``tidy → expand → interpolate`` ONCE, persists the
  interpolated intermediate, then derives BOTH mortality variants from it
  (mirroring the reuse in ``scripts/state-parquet.R:15-33``) and writes
  ``annualized_midpt`` / ``annualized_mortyr`` parquet datasets partitioned
  by STATECD;
- a single ``repartition(plot_ID)`` after tidy makes every downstream window
  shuffle-free (tree_ID is plot-prefixed, SURVEY §3.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from foresttime_builder_spark.plans import carbon, fia


def annualized_both(
    db: dict[str, DataFrame], estimate: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(midpt, mortyr) annualized(+estimated) tables off one shared
    interpolated intermediate."""
    tidy = fia.fia_tidy(db)
    interp = fia.interpolate_data(fia.expand_data(tidy))
    interp = interp.persist()

    out = []
    # "auto" keeps the reference's runtime downgrade for MORTYR-less states;
    # the probe re-reads the persisted intermediate, so it is cheap here
    for use_mortyr in (False, "auto"):
        adj = fia.adjust_mortality(interp, use_mortyr=use_mortyr)
        if estimate:
            adj = carbon.estimate_carbon(carbon.prep_carbon(adj))
        out.append(adj)
    return out[0], out[1]


def run_states(
    spark: SparkSession,
    db: dict[str, DataFrame],
    out_dir: str,
    estimate: bool = True,
    partition_by: str = "STATECD",
) -> dict[str, str]:
    """Write ``annualized_midpt`` and ``annualized_mortyr`` parquet datasets
    (the reference's ``{state}_midpt.parquet`` / ``{state}_mortyr.parquet``
    outputs, one partitioned dataset instead of one file per state).

    The two variants are TAGGED and UNIONED before the carbon stage, so
    the ~40-column NSVB plan (prep_carbon + estimate_carbon, purely
    row-wise — no windows or aggregates) is built, analyzed, codegen'd,
    and scheduled ONCE for both, and one write job partitioned by
    (variant, STATECD) replaces two full jobs.  Each returned path points
    below the variant partition level, so read-back schemas are identical
    to the former per-dataset layout.
    """
    tidy = fia.fia_tidy(db)
    interp = fia.interpolate_data(fia.expand_data(tidy)).persist()

    # "auto" keeps the reference's runtime downgrade for MORTYR-less
    # states; its probe re-reads the persisted intermediate, so it is
    # cheap here
    tagged = [
        fia.adjust_mortality(interp, use_mortyr=um).withColumn(
            "variant", F.lit(name)
        )
        for name, um in (("annualized_midpt", False),
                         ("annualized_mortyr", "auto"))
    ]
    both = tagged[0].unionByName(tagged[1])
    if estimate:
        both = carbon.estimate_carbon(carbon.prep_carbon(both))

    # recover STATECD from the composite plot key for partitioning
    if partition_by == "STATECD" and "STATECD" not in both.columns:
        both = both.withColumn(
            "STATECD", F.split(F.col("plot_ID"), "_").getItem(0).cast("int")
        )
    part_cols = ["variant"] + (
        [partition_by] if partition_by in both.columns else []
    )
    root = os.path.join(out_dir, "annualized")
    both.write.mode("overwrite").partitionBy(*part_cols).parquet(root)
    # the write consumed the cache; returned paths read the PARQUET, so
    # nothing lazy still needs it — release, or a long-lived session
    # (bench loop, test suite) accumulates one panel cache per call
    interp.unpersist()
    return {
        name: os.path.join(root, f"variant={name}")
        for name in ("annualized_midpt", "annualized_mortyr")
    }
