"""Generic as-of (backward-looking temporal) join between two tables.

The reference's legacy interval join assigns each year to its enclosing
survey interval (``scripts/06-check-annualized.R:70``, SURVEY §2.3 J13).
The general two-table form — "for every left row, the latest right row with
``right_time <= left_time`` per key" — is expressed here with the
union-then-window formulation rather than a range join:

- a range/theta join explodes to |left| × |right-per-key| candidate pairs
  before filtering, and Spark plans non-equi conditions as a broadcast
  nested-loop at worst;
- the union form is one shuffle on the key, one ordered window pass, and
  scales linearly at any key cardinality — the standard streaming-friendly
  as-of at 100 TB.

Right rows sort before left rows at equal timestamps, so the join is
*inclusive* (``right_time <= left_time``), matching SQL ASOF-join and the
reference's closed interval bounds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    value_cols: Sequence[str],
    right_order: Sequence[str] = (),
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with ``right[right_on] <= left[left_on]``, matched on ``by``.

    ``right_order`` breaks ties among right rows sharing a timestamp (last
    one in that order wins) — pass a stable id column for determinism.
    ``value_cols`` must not collide with left columns.
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    l2 = left.withColumns({"_t": F.col(left_on), "_src": F.lit(1)})
    # All value columns ride in ONE struct carried only by right rows, and a
    # single last(ignorenulls=True) picks it: every value is guaranteed to
    # come from the SAME, truly-latest right row — including that row's
    # NULLs.  Per-column fills would instead skip over a NULL in one value
    # column and silently substitute an older right row's value for it
    # (mixing rows), diverging from the correlated-subquery semantics.
    r2 = right.select(
        *by,
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_src"),
        *[F.col(c) for c in right_order if c not in by],
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        W.partitionBy(*by)
        .orderBy("_t", "_src", *right_order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = u.withColumn("_vals", F.last("_vals", ignorenulls=True).over(w))
    return filled.filter(F.col("_src") == 1).select(
        *left.columns,
        *[F.col("_vals").getField(c).alias(c) for c in value_cols],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-overlap equi-join: pairs where ``[l_start, l_end)`` and
    ``[r_start, r_end)`` overlap — the ranges-times-ranges join (q05 is
    point-in-band, q47 is as-of; this is the third interval shape).

    Scale path: a naive theta join is quadratic, so each interval
    explodes to the integer bucket ids it spans (``floor(t /
    bucket_width)``), the join is a bucket-id EQUI-join (hash
    partitionable at any scale), duplicates from multi-bucket spans are
    collapsed, and the true overlap predicate verifies exactly.  Bucket
    width trades explode factor against join selectivity — pick ~ the
    typical interval length.  Bounds must be integers (cast timestamps
    to epoch seconds first); all arithmetic is exact.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")

    def buckets(df: DataFrame, s: str, e: str, cols: list) -> DataFrame:
        # An empty interval [x, x) overlaps nothing, and an inverted one
        # (end < start) would make sequence() emit a DESCENDING bucket
        # list instead of erroring — both are dropped here so malformed
        # rows can never satisfy the overlap predicate by accident.
        df = df.filter(F.col(s) < F.col(e))
        return df.select(
            *cols,
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_width).cast("long"),
                    F.floor((F.col(e) - 1) / bucket_width).cast("long"),
                )
            ).alias("_bkt"),
        )

    lb = buckets(left, l_start, l_end, left.columns)
    rb = buckets(right, r_start, r_end, right.columns)
    return (
        lb.join(rb, "_bkt")
        .drop("_bkt")
        .distinct()
        .filter(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
    )
