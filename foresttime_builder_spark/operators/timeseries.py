"""Distributed panel → annual-grid time-series operators.

These are the novel operators of the engine: the reference implements them as
per-group R vector functions (``inter_extra_polate``, ``step_interp``,
``tidyr::fill``, ``tidyr::expand`` — see reference ``R/inter_extra_polate.R``,
``R/step_interp.R``, ``R/expand_data.R``); here each one is pure Spark window
algebra — no UDFs — so the whole stage stays inside WholeStageCodegen and one
shuffle (the window partition-by) covers every column being interpolated.

Scale notes: all windows partition by the group key(s). Groups are small
(a tree has tens of rows), so there is no per-key skew; one exchange on the
group key serves every window in the stage, and Catalyst collapses adjacent
windows with identical partitioning/ordering into a single Window physical
node.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _group(cols: Sequence[str]) -> list[Column]:
    return [F.col(c) for c in cols]


def fill_gaps(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    cols: Sequence[str],
    direction: str = "downup",
) -> DataFrame:
    """Fill nulls from neighboring rows within each group (``tidyr::fill``).

    direction: 'down' (last non-null before), 'up' (first non-null after),
    'downup' (down, then up for leading nulls), 'updown' (up, then down).
    Reference semantics: ``R/fia_tidy.R:96-98``, ``R/expand_data.R:61-70``,
    ``R/adjust_mortality.R:90``.
    """
    w = Window.partitionBy(*_group(group_cols)).orderBy(order_col)
    w_down = w.rowsBetween(Window.unboundedPreceding, 0)
    w_up = w.rowsBetween(0, Window.unboundedFollowing)
    filled = {}
    for c in cols:
        down = F.last(F.col(c), ignorenulls=True).over(w_down)
        up = F.first(F.col(c), ignorenulls=True).over(w_up)
        if direction == "down":
            filled[c] = down
        elif direction == "up":
            filled[c] = up
        elif direction == "downup":
            filled[c] = F.coalesce(down, up)
        elif direction == "updown":
            filled[c] = F.coalesce(up, down)
        else:
            raise ValueError(f"bad direction {direction!r}")
    # one projection for every column: N analyzer passes -> 1
    return df.withColumns(filled)


def expand_grid(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    out_col: str | None = None,
    flag_col: str = "interpolated",
    step: int = 1,
) -> DataFrame:
    """Densify an integer axis to every value between each group's min and max.

    Equivalent of ``tidyr::expand(YEAR = full_seq(INVYR, 1))`` + the
    provenance-flag right join (``R/expand_data.R:41-57``): emits one row per
    group per grid value; rows absent from the input get nulls in every
    non-group column and ``flag_col = True``; original rows keep their values
    and get ``flag_col = False``.

    Implementation: groupBy min/max → ``explode(sequence(lo, hi, step))`` →
    left join the original rows back on (group, x). The grid side is tiny
    relative to the exploded output and both sides hash-partition on the same
    key, so AQE plans this well at any scale.
    """
    out_col = out_col or x_col
    lo, hi = F.min(x_col).alias("_lo"), F.max(x_col).alias("_hi")
    grid = (
        df.groupBy(*_group(group_cols))
        .agg(lo, hi)
        .select(
            *group_cols,
            F.explode(F.sequence("_lo", "_hi", F.lit(step))).alias(out_col),
        )
    )
    orig = df.withColumn("_orig", F.lit(True))
    if out_col != x_col:
        orig = orig.withColumnRenamed(x_col, out_col)
    joined = grid.join(orig, on=[*group_cols, out_col], how="left")
    return joined.withColumn(flag_col, F.col("_orig").isNull()).drop("_orig")


def linear_interpolate(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    cols: Sequence[str],
    extrapolate: bool = True,
) -> DataFrame:
    """Per-group linear interpolation / extrapolation over a numeric axis.

    Matches reference ``inter_extra_polate`` (``R/inter_extra_polate.R:31-61``):

    - rows with a known value keep it;
    - gaps strictly between two known points are linearly interpolated on
      ``x_col``;
    - with ``extrapolate=True``:
        * groups with exactly one known value carry it *forward* only
          (leading rows stay null);
        * groups with >= 2 known values extend the line through the two
          nearest known points beyond either end (trailing and leading);
    - with ``extrapolate=False`` values outside the known range stay null,
      and single-known-value groups are returned unchanged.

    Note: for leading gaps with >= 2 known points the reference's R
    implementation concatenates extrapolated values at the *end* of the
    vector (a positional artifact of ``c(interpolated, extrapolated)``);
    this engine implements the documented intent — positionally-correct
    backward extrapolation. The reference's own golden tests only pin
    trailing extrapolation and carry-forward, which match exactly.
    """
    gcols = _group(group_cols)
    w = Window.partitionBy(*gcols).orderBy(x_col)
    w_before = w.rowsBetween(Window.unboundedPreceding, 0)
    w_after = w.rowsBetween(0, Window.unboundedFollowing)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_all = Window.partitionBy(*gcols)

    x = F.col(x_col).cast("double")

    if not extrapolate:
        filled = {}
        for c in cols:
            y = F.col(c).cast("double")
            known_x = F.when(y.isNotNull(), x)
            prev_y = F.last(y, ignorenulls=True).over(w_before)
            prev_x = F.last(known_x, ignorenulls=True).over(w_before)
            next_y = F.first(y, ignorenulls=True).over(w_after)
            next_x = F.first(known_x, ignorenulls=True).over(w_after)
            interp = prev_y + (next_y - prev_y) / (next_x - prev_x) * (x - prev_x)
            n_known = F.count(y).over(w_all)
            filled[c] = (
                F.when(y.isNotNull(), y)
                .when(n_known <= 1, y)
                .when(prev_y.isNotNull() & next_y.isNotNull(), interp)
                .otherwise(F.lit(None).cast("double"))
            )
        return df.withColumns(filled)

    # Boundary lines are group constants: the two known points nearest each
    # end. Materialize the nearest point first (pass 1) so the second-nearest
    # (pass 2) can mask against it — a group-constant column is safe to
    # reference inside another window aggregate, unlike a per-row window
    # expression (no nesting allowed). Each pass is ONE projection over all
    # columns — the analyzer cost is 3 layers total, not 10 per column.
    pass1, pass2, final = {}, {}, {}
    for c in cols:
        y = F.col(c).cast("double")
        known_x = F.when(y.isNotNull(), x)
        t = f"_li_{c}"
        pass1[f"{t}_n"] = F.count(y).over(w_all)
        pass1[f"{t}_lx"] = F.last(known_x, ignorenulls=True).over(w_full)
        pass1[f"{t}_ly"] = F.last(y, ignorenulls=True).over(w_full)
        pass1[f"{t}_fx"] = F.first(known_x, ignorenulls=True).over(w_full)
        pass1[f"{t}_fy"] = F.first(y, ignorenulls=True).over(w_full)
    out = df.withColumns(pass1)
    for c in cols:
        y = F.col(c).cast("double")
        t = f"_li_{c}"
        lx, fx = F.col(f"{t}_lx"), F.col(f"{t}_fx")
        pass2[f"{t}_l2x"] = F.last(
            F.when(y.isNotNull() & (x < lx), x), ignorenulls=True
        ).over(w_full)
        pass2[f"{t}_l2y"] = F.last(
            F.when(y.isNotNull() & (x < lx), y), ignorenulls=True
        ).over(w_full)
        pass2[f"{t}_f2x"] = F.first(
            F.when(y.isNotNull() & (x > fx), x), ignorenulls=True
        ).over(w_full)
        pass2[f"{t}_f2y"] = F.first(
            F.when(y.isNotNull() & (x > fx), y), ignorenulls=True
        ).over(w_full)
    out = out.withColumns(pass2)
    drops = []
    for c in cols:
        y = F.col(c).cast("double")
        known_x = F.when(y.isNotNull(), x)
        t = f"_li_{c}"
        prev_y = F.last(y, ignorenulls=True).over(w_before)
        next_y = F.first(y, ignorenulls=True).over(w_after)
        prev_x = F.last(known_x, ignorenulls=True).over(w_before)
        next_x = F.first(known_x, ignorenulls=True).over(w_after)
        interp = prev_y + (next_y - prev_y) / (next_x - prev_x) * (x - prev_x)
        lx, ly = F.col(f"{t}_lx"), F.col(f"{t}_ly")
        fx, fy = F.col(f"{t}_fx"), F.col(f"{t}_fy")
        l2x, l2y = F.col(f"{t}_l2x"), F.col(f"{t}_l2y")
        f2x, f2y = F.col(f"{t}_f2x"), F.col(f"{t}_f2y")
        n_known = F.col(f"{t}_n")
        fwd = ly + (ly - l2y) / (lx - l2x) * (x - lx)
        bwd = fy + (fy - f2y) / (fx - f2x) * (x - fx)
        final[c] = (
            F.when(y.isNotNull(), y)
            .when(n_known == 0, F.lit(None).cast("double"))
            # single known value: carry forward only (leading rows null)
            .when(n_known == 1, prev_y)
            # interior gap
            .when(prev_y.isNotNull() & next_y.isNotNull(), interp)
            # trailing gap: extend line through last two known points
            .when(x > lx, fwd)
            # leading gap: extend line through first two known points
            .otherwise(bwd)
        )
        drops += [
            f"{t}_n", f"{t}_lx", f"{t}_ly", f"{t}_fx", f"{t}_fy",
            f"{t}_l2x", f"{t}_l2y", f"{t}_f2x", f"{t}_f2y",
        ]
    return out.withColumns(final).drop(*drops)


def step_interpolate(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    cols: Sequence[str],
) -> DataFrame:
    """Per-group categorical gap fill: switch at the floor-midpoint.

    Matches reference ``step_interp`` (``R/step_interp.R:16-48``) exactly,
    including its positional (row-index, not x-value) arithmetic:

    - leading nulls stay null;
    - trailing nulls take the last known value;
    - a null between known values at row indices ``p < n`` takes the earlier
      value while ``i < p + ceil((n - p)/2)`` and the later value after.

    Works for any column dtype (the reference applies it to string ``PLT_CN``
    and integer status codes alike).
    """
    gcols = _group(group_cols)
    w = Window.partitionBy(*gcols).orderBy(order_col)
    w_before = w.rowsBetween(Window.unboundedPreceding, 0)
    w_after = w.rowsBetween(0, Window.unboundedFollowing)

    idx = F.row_number().over(w)
    out = df.withColumn("_sg_i", idx)
    i = F.col("_sg_i")
    filled = {}
    for c in cols:
        v = F.col(c)
        known_i = F.when(v.isNotNull(), i)
        prev_v = F.last(v, ignorenulls=True).over(w_before)
        prev_i = F.last(known_i, ignorenulls=True).over(w_before)
        next_v = F.first(v, ignorenulls=True).over(w_after)
        next_i = F.first(known_i, ignorenulls=True).over(w_after)
        switch_at = prev_i + F.ceil((next_i - prev_i) / F.lit(2.0))
        filled[c] = (
            F.when(v.isNotNull(), v)
            .when(prev_v.isNull(), F.lit(None))  # leading: stay null
            .when(next_v.isNull(), prev_v)  # trailing: last value
            .when(i < switch_at, prev_v)
            .otherwise(next_v)
        )
    return out.withColumns(filled).drop("_sg_i")
