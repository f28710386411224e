"""Snapshot diff (CDC): what changed between two versions of a table.

The reference refreshes its published parquet by overwrite-and-rerun
(``scripts/state-parquet.R`` writes every state's file from scratch each
run); the streaming side of this repo narrows that to a key-level MERGE
(``streaming/events.run_foreach_batch_upsert``).  This operator closes the
remaining gap: given two snapshots, report each key as ``insert`` /
``delete`` / ``update`` — the change feed a downstream consumer (index
refresh, cache invalidation, incremental training-data delivery) actually
wants.

Scale design: each side is projected map-side to ``(keys..., row_hash)``
— an md5 over the normalized compare columns — BEFORE the shuffle, so the
full-outer join on the key moves only keys + 32-byte hashes regardless of
payload width; unchanged keys (the overwhelming majority of a production
diff) are dropped immediately after the join.  Callers that need changed
payloads re-join the emitted keys against the snapshots — a semi-join-
reduced second pass over only the changed fraction, not a wide first pass
over everything.

Cross-engine hash portability: the hash is ``md5(concat_ws('|', cols))``
over the compare columns' STRING renderings, so callers must pass columns
whose rendering is engine-stable (strings, integers, dates — not raw
doubles, whose decimal rendering differs between engines; normalize
doubles to scaled bigints first, as the gate queries do everywhere else).
``concat_ws`` skips NULLs identically in both engines — consistent, but
it means NULL and empty-string compare equal; pre-coalesce to a sentinel
if that distinction matters for a column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """``(keys..., change)`` with ``change`` in ``insert`` (key only in
    ``new``), ``delete`` (only in ``old``), ``update`` (in both, compare
    columns differ).  Unchanged keys are not emitted.

    DuckDB twin: :func:`snapshot_diff_oracle_sql`.
    """
    keys = list(keys)

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *keys,
            F.md5(
                F.concat_ws("|", *[F.col(c).cast("string") for c in compare_cols])
            ).alias(f"h_{tag}"),
        )

    o, n = hashed(old, "old"), hashed(new, "new")
    joined = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("h_old").isNull(), F.lit("insert"))
        .when(F.col("h_new").isNull(), F.lit("delete"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def snapshot_diff_oracle_sql(
    old_sql: str,
    new_sql: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff` — identical hash construction
    (md5 over '|'-joined string renderings) and change classification.
    ``old_sql`` / ``new_sql`` are subqueries producing the two snapshots."""
    keys = list(keys)
    key_list = ", ".join(keys)
    coal_keys = ", ".join(
        f"coalesce(o.{k}, n.{k}) AS {k}" for k in keys
    )
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    h = "md5(concat_ws('|', " + ", ".join(
        f"CAST({c} AS VARCHAR)" for c in compare_cols
    ) + "))"
    return f"""
WITH o AS (SELECT {key_list}, {h} AS h_old FROM ({old_sql})),
n AS (SELECT {key_list}, {h} AS h_new FROM ({new_sql})),
j AS (
  SELECT {coal_keys}, o.h_old, n.h_new
  FROM o FULL OUTER JOIN n ON {on}
)
SELECT {key_list},
       CASE WHEN h_old IS NULL THEN 'insert'
            WHEN h_new IS NULL THEN 'delete'
            WHEN h_old != h_new THEN 'update' END AS change
FROM j
WHERE h_old IS NULL OR h_new IS NULL OR h_old != h_new
"""
