"""End-to-end state-pipeline gate (q51): CSV → parquet round trip.

The full production path of the reference's per-state job
(``scripts/state-parquet.R:10-49``): raw FIA-shaped CSVs → CSV source layer
(CN→string contract, ``sources/fia.py``) → ``fia_tidy`` → ``expand_data`` →
``interpolate_data`` → ``adjust_mortality`` in BOTH variants →
``estimate_carbon`` → parquet sink → read back.  Everything between the CSV
bytes and the parquet bytes is inside the gate — the component queries
(q25/q26) gate the pipeline stages on a large synthetic panel; this gate
proves the assembled product (including the source layer and the sink) on
the scenario fixture (one named tree per reference test scenario,
FIXTURES.md §2).

The DuckDB oracle rebuilds the identical input as VALUES CTEs
(``sources.fixture_state.values_sql``) and runs the SQL twin of the whole
chain: a tidy-join twin (this module) + the annualize chain
(``fia_on_synthetic.annualize_cte``, per mortality variant) + the NSVB
chain (``carbon_on_synthetic.carbon_cte``).

Note on the empty-plot grid: ``expand_grid`` re-joins original rows on
(plot_ID, tree_ID, YEAR); a NULL tree_ID never equals itself, so an empty
plot's rows come back all-NULL with ``interpolated = true`` in every year —
identically in Spark and the SQL twin (both engines treat NULL join keys as
non-matching).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from foresttime_builder_spark.plans.carbon_on_synthetic import carbon_cte
from foresttime_builder_spark.plans.state_pipeline import run_states
from foresttime_builder_spark.sources import fixture_state
from foresttime_builder_spark.sources.fia import fia_load

#: fia_tidy twin (R/fia_tidy.R:19-142 semantics as implemented in
#: plans/fia.py): prune+filter+composite-ids, the three left joins, the
#: MORTYR/SPCD windows, ACTUALHT coalesce.  The empty-plot full-outer
#: re-join is a no-op (the snapshot IS the plot relation and every plot row
#: survives the left joins — see plans/fia.py:fia_tidy) so the twin omits
#: it.
_TIDY_CTES = """
tplot AS (
  SELECT concat_ws('_', STATECD, UNITCD, COUNTYCD, PLOT) AS plot_ID,
         CN AS PLT_CN, INVYR, DESIGNCD, INTENSITY
  FROM fplot WHERE INVYR >= 2000
),
tgeom AS (SELECT CN AS PLT_CN, INVYR, ECOSUBCD FROM fplotgeom WHERE INVYR >= 2000),
tcond AS (
  SELECT concat_ws('_', STATECD, UNITCD, COUNTYCD, PLOT) AS plot_ID,
         PLT_CN, INVYR, CONDID, CONDPROP_UNADJ, PROP_BASIS, COND_STATUS_CD,
         STDORGCD
  FROM fcond WHERE INVYR >= 2000
),
ttree AS (
  SELECT concat_ws('_', STATECD, UNITCD, COUNTYCD, PLOT) AS plot_ID,
         concat_ws('_', STATECD, UNITCD, COUNTYCD, PLOT, SUBP, TREE) AS tree_ID,
         INVYR, PLT_CN, CONDID, MORTYR, STATUSCD, RECONCILECD, DECAYCD,
         STANDING_DEAD_CD, DIA, CR, HT, ACTUALHT, CULL, SPCD
  FROM ftree WHERE INVYR >= 2000
),
tjoined AS (
  SELECT p.plot_ID, p.PLT_CN, p.INVYR, p.DESIGNCD, p.INTENSITY,
         t.tree_ID, t.CONDID, t.MORTYR, t.STATUSCD, t.RECONCILECD, t.DECAYCD,
         t.STANDING_DEAD_CD, t.DIA, t.CR, t.HT, t.ACTUALHT, t.CULL, t.SPCD,
         g.ECOSUBCD, c.CONDPROP_UNADJ, c.PROP_BASIS, c.COND_STATUS_CD,
         c.STDORGCD
  FROM tplot p
  LEFT JOIN ttree t
    ON t.plot_ID = p.plot_ID AND t.PLT_CN = p.PLT_CN AND t.INVYR = p.INVYR
  LEFT JOIN tgeom g ON g.INVYR = p.INVYR AND g.PLT_CN = p.PLT_CN
  LEFT JOIN tcond c
    ON c.plot_ID = p.plot_ID AND c.INVYR = p.INVYR AND c.PLT_CN = p.PLT_CN
   AND c.CONDID = t.CONDID
),
tidyw AS (
  SELECT *,
    max(MORTYR) OVER (PARTITION BY plot_ID, tree_ID) AS _mortyr,
    last_value(SPCD IGNORE NULLS) OVER (
      PARTITION BY plot_ID, tree_ID ORDER BY INVYR
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS _spcd
  FROM tjoined
),
tidy AS (
  SELECT plot_ID, tree_ID, INVYR, PLT_CN, _mortyr AS MORTYR, _spcd AS SPCD,
         STATUSCD, RECONCILECD, DECAYCD, STANDING_DEAD_CD, DIA, CR, HT,
         coalesce(ACTUALHT, HT) AS ACTUALHT, CULL, CONDID, COND_STATUS_CD,
         STDORGCD, CONDPROP_UNADJ, PROP_BASIS, DESIGNCD, INTENSITY, ECOSUBCD
  FROM tidyw
)"""

_OUT_DOUBLES = ("DIA", "HT", "ACTUALHT", "CULL", "CR", "TPA_UNADJ")
_OUT_INTS = ("STATUSCD", "STANDING_DEAD_CD", "DECAYCD")


def _nan_e4(col) -> F.Column:
    """Fixed-point emission for the cross-engine hash gate: 1e-4 units as a
    BIGINT (NaN → null).  A rounded double's nearest-binary representation
    can sit a hair *below* the decimal value, which the boundary-risk check
    rightly flags as hash-flap hazard; an integer has no representation
    error, so the gate hashes exactly."""
    scaled = F.floor(col * 10000 + F.lit(0.5)).cast("long")
    return F.when(F.isnan(col), None).otherwise(scaled)


def _sql_e4(x: str) -> str:
    """DuckDB twin of :func:`_nan_e4` (same IEEE ops, same fixed point)."""
    return (
        f"CASE WHEN isnan({x}) THEN NULL"
        f" ELSE CAST(floor({x} * 10000 + 0.5) AS BIGINT) END"
    )


def state_pipeline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the whole per-state job on the fixture CSVs; return both
    mortality variants of the parquet output, tagged and rounded for the
    cross-engine hash gate.  ``sf_dir`` is unused (the fixture is its own
    input) but kept for the queries() contract."""
    base = os.path.join(tempfile.gettempdir(), "ftb_q51_state")
    csv_dir, out_dir = os.path.join(base, "csv"), os.path.join(base, "out")
    fixture_state.write_csvs(csv_dir)
    db = fia_load(spark, [fixture_state.STATE], csv_dir)
    paths = run_states(spark, db, out_dir, estimate=True)

    frames = []
    for variant, name in (("midpt", "annualized_midpt"),
                          ("mortyr", "annualized_mortyr")):
        df = spark.read.parquet(paths[name])
        sel = [
            F.lit(variant).alias("variant"),
            "plot_ID",
            "tree_ID",
            F.col("YEAR").cast("int").alias("year"),
            "interpolated",
            *[_nan_e4(F.col(c)).alias(c.lower() + "_e4") for c in _OUT_DOUBLES],
            *[F.col(c).cast("int").alias(c.lower()) for c in _OUT_INTS],
            _nan_e4(F.col("DRYBIO_AG")).alias("drybio_ag_e4"),
            _nan_e4(F.col("CARBON_AG")).alias("carbon_ag_e4"),
        ]
        frames.append(df.select(*sel))
    return frames[0].unionByName(frames[1])


def _variant_sql(use_mortyr: bool) -> str:
    values = ",\n".join(fixture_state.values_sql().values())
    panel_sql = f"WITH {values},{_TIDY_CTES} SELECT * FROM tidy"
    chain = carbon_cte(
        panel_sql=panel_sql, jcase=fixture_state.JCASE, use_mortyr=use_mortyr
    )
    e4 = _sql_e4
    # columns come from the chain's `prep` stage, not `final`: the pipeline's
    # parquet carries prep_carbon's view of the panel (live trees get
    # STANDING_DEAD_CD/DECAYCD = 0, CULL nulls coalesced to 0 —
    # R/prep_carbon.R:62-90), exactly like the reference's
    # left_join(data_prepped, estimates) output contract
    doubles = ",\n  ".join(f"{e4('f.' + c)} AS {c.lower()}_e4" for c in _OUT_DOUBLES)
    ints = ",\n  ".join(f"CAST(f.{c} AS INT) AS {c.lower()}" for c in _OUT_INTS)
    variant = "mortyr" if use_mortyr else "midpt"
    return f"""SELECT '{variant}' AS variant, sub.* FROM (
WITH {chain}
SELECT f.plot_ID, f.tree_ID, CAST(f.YEAR AS INT) AS year, f.interpolated,
  {doubles},
  {ints},
  {e4('c.BIOMASS')} AS drybio_ag_e4,
  {e4('c.CARBON')} AS carbon_ag_e4
FROM prep f
LEFT JOIN carbonout c
  ON f.plot_ID = c.plot_ID AND f.tree_ID = c.tree_ID AND f.YEAR = c.YEAR
) sub"""


def oracle_sql() -> str:
    return (
        _variant_sql(use_mortyr=False)
        + "\nUNION ALL\n"
        + _variant_sql(use_mortyr=True)
    )
