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
    # expression (no nesting allowed). Each (x, y) pair rides ONE window
    # expression as a struct: window functions evaluate interpreted
    # per-row-per-function (WindowExec is outside codegen), so halving the
    # function count halves the dominant cost of this operator; field
    # extraction happens in ordinary codegen'd projections afterwards.
    pass1, pass2, pass3, final = {}, {}, {}, {}
    for c in cols:
        y = F.col(c).cast("double")
        kp = F.when(y.isNotNull(), F.struct(x.alias("x"), y.alias("y")))
        t = f"_li_{c}"
        # count over the unbounded ORDERED frame == whole-partition count,
        # but shares the w_full Window node instead of adding a w_all one
        pass1[f"{t}_n"] = F.count(y).over(w_full)
        pass1[f"{t}_l"] = F.last(kp, ignorenulls=True).over(w_full)
        pass1[f"{t}_f"] = F.first(kp, ignorenulls=True).over(w_full)
    out = df.withColumns(pass1)
    for c in cols:
        y = F.col(c).cast("double")
        t = f"_li_{c}"
        lx = F.col(f"{t}_l").getField("x")
        fx = F.col(f"{t}_f").getField("x")
        kp = F.struct(x.alias("x"), y.alias("y"))
        pass2[f"{t}_l2"] = F.last(
            F.when(y.isNotNull() & (x < lx), kp), ignorenulls=True
        ).over(w_full)
        pass2[f"{t}_f2"] = F.first(
            F.when(y.isNotNull() & (x > fx), kp), ignorenulls=True
        ).over(w_full)
    out = out.withColumns(pass2)
    for c in cols:
        y = F.col(c).cast("double")
        t = f"_li_{c}"
        kp = F.when(y.isNotNull(), F.struct(x.alias("x"), y.alias("y")))
        pass3[f"{t}_p"] = F.last(kp, ignorenulls=True).over(w_before)
        pass3[f"{t}_x"] = F.first(kp, ignorenulls=True).over(w_after)
    out = out.withColumns(pass3)
    drops = []
    for c in cols:
        y = F.col(c).cast("double")
        t = f"_li_{c}"
        prev_x = F.col(f"{t}_p").getField("x")
        prev_y = F.col(f"{t}_p").getField("y")
        next_x = F.col(f"{t}_x").getField("x")
        next_y = F.col(f"{t}_x").getField("y")
        interp = prev_y + (next_y - prev_y) / (next_x - prev_x) * (x - prev_x)
        lx = F.col(f"{t}_l").getField("x")
        ly = F.col(f"{t}_l").getField("y")
        fx = F.col(f"{t}_f").getField("x")
        fy = F.col(f"{t}_f").getField("y")
        l2x = F.col(f"{t}_l2").getField("x")
        l2y = F.col(f"{t}_l2").getField("y")
        f2x = F.col(f"{t}_f2").getField("x")
        f2y = F.col(f"{t}_f2").getField("y")
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
            f"{t}_n", f"{t}_l", f"{t}_f", f"{t}_l2", f"{t}_f2",
            f"{t}_p", f"{t}_x",
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
    # one struct-packed window expression per (value, index) pair per
    # direction — window functions evaluate interpreted per-row-per-function,
    # so packing halves the dominant cost (see linear_interpolate)
    packed = {}
    for c in cols:
        v = F.col(c)
        kp = F.when(v.isNotNull(), F.struct(i.alias("i"), v.alias("v")))
        packed[f"_sg_{c}_p"] = F.last(kp, ignorenulls=True).over(w_before)
        packed[f"_sg_{c}_n"] = F.first(kp, ignorenulls=True).over(w_after)
    out = out.withColumns(packed)
    filled = {}
    drops = ["_sg_i"]
    for c in cols:
        v = F.col(c)
        prev_v = F.col(f"_sg_{c}_p").getField("v")
        prev_i = F.col(f"_sg_{c}_p").getField("i")
        next_v = F.col(f"_sg_{c}_n").getField("v")
        next_i = F.col(f"_sg_{c}_n").getField("i")
        switch_at = prev_i + F.ceil((next_i - prev_i) / F.lit(2.0))
        filled[c] = (
            F.when(v.isNotNull(), v)
            .when(prev_v.isNull(), F.lit(None))  # leading: stay null
            .when(next_v.isNull(), prev_v)  # trailing: last value
            .when(i < switch_at, prev_v)
            .otherwise(next_v)
        )
        drops += [f"_sg_{c}_p", f"_sg_{c}_n"]
    return out.withColumns(filled).drop(*drops)
