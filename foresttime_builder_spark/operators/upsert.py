"""Incremental merge (upsert) for batch re-runs: latest version per key wins.

The reference refreshes its output by re-running whole states and
overwriting parquet (``scripts/state-parquet.R``, per-state CI matrix in
``.github/workflows/run_workflow.yml:40-48``).  At 100 TB the engine-side
analog is an idempotent MERGE: union the existing table with the update
batch and keep the newest row per business key.  Expressed as a window
dedup, it is one shuffle on the key and needs no transactional storage
layer — and because the pick is deterministic (explicit version +
tie-break ordering, no ``monotonically_increasing_id``), re-running the
same merge is a no-op.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def merge_latest(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Upsert ``updates`` into ``base``: one row per ``keys``, the one with
    the greatest ``(version_col, *tie_break)``.  Insert-or-replace only
    (deletes are a filter upstream).  Schemas must union by name."""
    u = base.unionByName(updates, allowMissingColumns=False)
    order = [F.col(version_col).desc()] + [F.col(c).desc() for c in tie_break]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
