"""Incremental view maintenance (IVM): delta-merge a grouped aggregate.

The materialized-view refresh shape (DBToaster / delta processing): a
grouped ``sum``/``count`` view over a big table is kept current by
applying only the CHANGED rows between two snapshots — never rescanning
the unchanged bulk.  An update is algebraically a delete of the old row
plus an insert of the new one, which also handles rows that MOVE between
groups.  The maintained invariant, and what the gate checks: the merged
view is bit-identical to a full recompute over the new snapshot.

Scale shape (100 TB base, small delta — the production regime):

1. Both snapshots are projected map-side to ``(keys..., group, value)``
   before the full-outer key join (payload never wider than 3 columns).
2. Unchanged keys (the overwhelming majority) are dropped immediately
   after the join; each changed key emits <= 2 delta rows via a 2-element
   ``explode`` (no second pass over either snapshot).
3. The group-level delta is aggregate-sized, and the final merge is a
   full-outer join of two aggregate-sized tables — broadcastable
   whenever the view itself is.
4. Groups whose maintained count reaches zero are dropped (the view
   never carries tombstones).

Exactness: ``value_col`` must be exactly summable (integer / long /
decimal).  Floating-point values would drift between the incremental
and full-recompute paths (``(a+b)-b != a`` in IEEE), silently breaking
the invariant — normalize doubles to scaled BIGINTs first, as the gate
queries do everywhere else.  The operator raises on float inputs.

NULL handling: NULL-valued rows count toward ``n_rows`` and are ignored
by the sum (SQL aggregate semantics); a NULL group is a legal key (the
merge join is null-safe).  One documented deviation from SQL: a group
whose non-null values ALL disappear reports ``total=0`` where a full
recompute's ``sum`` would report NULL — maintaining that distinction
needs a third maintained counter (non-null value count); add one
downstream if it matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["incremental_group_sum", "incremental_group_sum_oracle_sql"]

_EXACT_TYPES = ("int", "bigint", "smallint", "tinyint", "long")


def incremental_group_sum(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    group_col: str,
    value_col: str,
    old_agg: DataFrame | None = None,
) -> DataFrame:
    """Maintain ``SELECT group, sum(value), count(*) GROUP BY group``
    from ``old``'s state to ``new``'s by applying only changed keys.

    Returns ``(group_col, total, n_rows)`` equal to a full recompute
    over ``new``.  ``keys`` must uniquely identify rows per snapshot
    (the CDC contract).  ``old_agg``, when given, must be the maintained
    view of ``old`` with exactly these output columns (e.g. the previous
    call's result read back from the sink); omitted, it is computed from
    ``old`` — still useful for testing the algebra, but the production
    win is passing the stored view.
    """
    keys = list(keys)
    vtype = dict(new.dtypes).get(value_col)
    if vtype is not None and not (
        vtype in _EXACT_TYPES or vtype.startswith("decimal")
    ):
        raise ValueError(
            f"value_col {value_col!r} has type {vtype}; IVM requires an "
            f"exactly-summable type (integer/decimal) — normalize doubles "
            f"to scaled BIGINTs first"
        )

    def proj(df: DataFrame, tag: str) -> DataFrame:
        # _p_* marks ROW PRESENCE — value nullness cannot stand in for it,
        # or NULL-valued rows would vanish from the count delta
        return df.select(
            *keys,
            F.col(group_col).alias(f"_g_{tag}"),
            F.col(value_col).alias(f"_v_{tag}"),
            F.lit(True).alias(f"_p_{tag}"),
        )

    joined = proj(old, "o").join(proj(new, "n"), on=keys, how="full_outer")
    unchanged = (
        F.col("_p_o").isNotNull()
        & F.col("_p_n").isNotNull()
        & F.col("_g_o").eqNullSafe(F.col("_g_n"))
        & F.col("_v_o").eqNullSafe(F.col("_v_n"))
    )
    deltas = (
        joined.filter(~unchanged)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("_g_o").alias("_g"),
                        (-F.col("_v_o")).alias("_dv"),
                        F.when(F.col("_p_o").isNull(), None)
                        .otherwise(F.lit(-1))
                        .cast("long")
                        .alias("_dn"),
                    ),
                    F.struct(
                        F.col("_g_n").alias("_g"),
                        F.col("_v_n").alias("_dv"),
                        F.when(F.col("_p_n").isNull(), None)
                        .otherwise(F.lit(1))
                        .cast("long")
                        .alias("_dn"),
                    ),
                )
            ).alias("_d")
        )
        .select("_d.*")
        .filter(F.col("_dn").isNotNull())
        .groupBy("_g")
        .agg(F.sum("_dv").alias("_ddv"), F.sum("_dn").alias("_ddn"))
    )
    if old_agg is None:
        old_agg = old.groupBy(group_col).agg(
            F.sum(value_col).cast("long").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    merged = old_agg.join(
        # null-safe: a NULL group is a legal grouping key and its deltas
        # must land on its view row, not on a phantom second row
        deltas, old_agg[group_col].eqNullSafe(deltas["_g"]), "full_outer"
    ).select(
        F.coalesce(old_agg[group_col], deltas["_g"]).alias(group_col),
        (
            F.coalesce(F.col("total"), F.lit(0))
            + F.coalesce(F.col("_ddv"), F.lit(0))
        )
        .cast("long")
        .alias("total"),
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_ddn"), F.lit(0))
        )
        .cast("long")
        .alias("n_rows"),
    )
    return merged.filter(F.col("n_rows") > 0)


def incremental_group_sum_oracle_sql(
    new_sql: str, group_col: str, value_col: str
) -> str:
    """The IVM invariant's right-hand side: a FULL RECOMPUTE of the view
    over the new snapshot.  Matching the incremental path against this
    is the whole point of the gate."""
    return f"""
SELECT {group_col},
       CAST(sum({value_col}) AS BIGINT) AS total,
       CAST(count(*) AS BIGINT) AS n_rows
FROM ({new_sql})
GROUP BY {group_col}
"""
