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


def _qident(name: str) -> str:
    """Backtick-quote a SQL identifier, escaping embedded backticks — the
    interpolators assemble SQL text, so a column literally named ``a`b``
    must round-trip."""
    return "`" + name.replace("`", "``") + "`"


def _partition_clause(group_cols: Sequence[str]) -> str:
    """``"PARTITION BY `a`, `b` "`` — or ``""`` when ``group_cols`` is
    empty: a bare ``PARTITION BY`` with no column list is invalid SQL,
    whereas an absent clause correctly means one global partition (the
    Window.partitionBy() no-arg semantics the SQL-text rewrite replaced)."""
    if not group_cols:
        return ""
    return "PARTITION BY " + ", ".join(_qident(g) for g in group_cols) + " "


def fill_gaps_layers(
    group_cols: Sequence[str],
    order_col: str,
    cols: Sequence[str],
    direction: str = "downup",
) -> list[tuple[dict[str, str], list[str]]]:
    """The :func:`fill_gaps` projection as ``apply_layers`` layers (SQL
    text), so a chain caller (``plans/fia.py``) can fuse it with adjacent
    projections into ONE generated statement — the r16 fold of the FIA
    chain's remaining per-transform analyzer passes into the apply_layers
    path (guide §1.2: each eager Dataset transform re-runs the analyzer
    over the whole deepening plan)."""
    part = _partition_clause(group_cols)
    over_down = (
        f"OVER ({part}ORDER BY {_qident(order_col)} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    over_up = (
        f"OVER ({part}ORDER BY {_qident(order_col)} "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    filled = {}
    for c in cols:
        down = f"last({_qident(c)}, true) {over_down}"
        up = f"first({_qident(c)}, true) {over_up}"
        if direction == "down":
            filled[c] = down
        elif direction == "up":
            filled[c] = up
        elif direction == "downup":
            filled[c] = f"coalesce({down}, {up})"
        elif direction == "updown":
            filled[c] = f"coalesce({up}, {down})"
        else:
            raise ValueError(f"bad direction {direction!r}")
    return [(filled, [])]


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
    from foresttime_builder_spark.functions.helpers import apply_layers

    # one projection for every column (N analyzer passes -> 1), via the
    # same generated-SQL path the chain fusion uses
    return apply_layers(
        df, fill_gaps_layers(group_cols, order_col, cols, direction)
    )


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

    Implementation (``step == 1``, the hot path): ONE pass — a ``lead``
    window over (group, x) finds each row's next year, and every row
    explodes into itself plus the gap years up to that neighbour.  The
    r15 optimization round replaced the original two-sided form (groupBy
    min/max → explode → join the input back on (group, x)), which
    computed the ENTIRE input subtree twice — q26's synthetic panel
    appeared once on the stream side and once inside a broadcast — and
    paid a grid-aggregate exchange plus the join itself (guide §2.4:
    remove shuffles outright / don't compute things twice).  The window
    needs the same (group) hash partitioning every downstream
    interpolation window already requires, so the whole chain now rides
    one exchange.

    Exact join-semantics replication, pinned by the oracle gates:

    - a row whose x is NULL never matched the grid and vanished → filtered;
    - rows in a group with a NULL group key never matched (SQL NULL
      equality): their VALUES vanish — every grid year of that group comes
      back all-NULL with ``flag_col = true``, and duplicate years collapse
      to the one grid row (``plans/state_on_fixture.py`` empty-plot
      contract) → only the last row of each distinct x emits, nulled;
    - duplicate (group, x) rows in a matched group each re-matched their
      grid year → every original row emits itself.
    """
    out_col = out_col or x_col
    if step != 1:
        # step grids keep the two-sided form: original rows off the step
        # lattice must NOT survive (they never matched a grid row), which
        # the single-pass form cannot express row-locally
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

    src = df.filter(F.col(x_col).isNotNull())
    if out_col != x_col:
        src = src.withColumnRenamed(x_col, out_col)
    ycol = "_y"
    while ycol in src.columns:
        ycol = "_" + ycol
    nxtcol = "_nxt"
    while nxtcol in src.columns:
        nxtcol = "_" + nxtcol
    x = F.col(out_col)
    w = Window.partitionBy(*_group(group_cols)).orderBy(out_col)
    # materialized: a window expression cannot sit inside a generator
    src = src.withColumn(nxtcol, F.lead(out_col).over(w))
    nxt = F.col(nxtcol)
    matched = F.lit(True)
    for g in group_cols:
        matched = matched & F.col(g).isNotNull()
    # group keys are partition-constant, so `matched` is too; `is_last`
    # holds for exactly one row per distinct x regardless of tie order
    is_last = nxt.isNull() | (nxt > x)
    years = (
        # self year + every missing year before the next distinct one
        F.when(is_last, F.sequence(x, F.coalesce(nxt - F.lit(1), x)))
        # matched duplicates re-emit their year; unmatched ones vanish
        .when(matched, F.array(x))
        .otherwise(F.slice(F.array(x), 1, 0))
    )
    others = [
        c
        for c in src.columns
        if c not in set(group_cols) | {out_col, nxtcol}
    ]
    exploded = src.select(*src.columns, F.explode(years).alias(ycol))
    orig_row = matched & (F.col(ycol) == x)
    return exploded.select(
        *group_cols,
        F.col(ycol).alias(out_col),
        *[F.when(orig_row, F.col(c)).alias(c) for c in others],
        (~orig_row).alias(flag_col),
    )


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
    from foresttime_builder_spark.functions.helpers import apply_layers

    return apply_layers(
        df, linear_interpolate_layers(group_cols, x_col, cols, extrapolate)
    )


def linear_interpolate_layers(
    group_cols: Sequence[str],
    x_col: str,
    cols: Sequence[str],
    extrapolate: bool = True,
) -> list[tuple[dict[str, str], list[str]]]:
    """:func:`linear_interpolate` as ``apply_layers`` layers, so the FIA
    chain can fuse its whole interpolation stage into ONE generated
    statement (r16; see :func:`fill_gaps_layers`).

    Expression design notes (unchanged from the r12-r15 forms):

    ONE window function per column: collect the sorted known-point array
    as a group constant.  An unbounded frame is evaluated once per group
    (UnboundedWindowFunctionFrame aggregates the partition a single time),
    and every derived quantity — nearest points either side, boundary
    lines, known-count — is ordinary codegen'd array algebra over that
    attribute.  The round-1 shape spent 7 interpreted per-row window
    evaluations per column across 3 sequential Window passes; this is the
    dominant-cost fix for the annualize pipeline.  collect_list drops the
    nulls (unknown rows), and WindowExec's partition sort makes the array
    x-ascending.  Groups are small (a tree has tens of rows), so the
    per-row O(k) array filters are cheap and the arrays never approach
    collect_list's size limits.

    Expressions are assembled as SQL text and analyzed JVM-side in one
    spark.sql call for the whole layer stack: the equivalent Column-API
    construction costs ~40 py4j round trips per column, which dominated
    the q25 wall time (plan construction measured ~2x the execution), and
    the former one-transform-per-stage form paid a full analyzer pass per
    transform on an already-deep plan."""
    over = (
        f"OVER ({_partition_clause(group_cols)}ORDER BY {_qident(x_col)} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )
    x = f"CAST({_qident(x_col)} AS DOUBLE)"

    karrs = {}
    for c in cols:
        y = f"CAST({_qident(c)} AS DOUBLE)"
        kp = f"CASE WHEN {y} IS NOT NULL THEN named_struct('x', {x}, 'y', {y}) END"
        karrs[f"_li_{c}_k"] = f"collect_list({kp}) {over}"

    final, drops = {}, []
    for c in cols:
        y = f"CAST({_qident(c)} AS DOUBLE)"
        k = _qident(f"_li_{c}_k")
        drops.append(f"_li_{c}_k")
        # nearest known point at-or-before / at-or-after this row
        prev = f"try_element_at(filter({k}, e -> e.x <= {x}), -1)"
        nxt = f"try_element_at(filter({k}, e -> e.x >= {x}), 1)"
        interp = (
            f"({prev}).y + (({nxt}).y - ({prev}).y)"
            f" / (({nxt}).x - ({prev}).x) * ({x} - ({prev}).x)"
        )

        if not extrapolate:
            final[c] = (
                f"CASE WHEN {y} IS NOT NULL THEN {y} "
                f"WHEN size({k}) <= 1 THEN {y} "
                f"WHEN {prev} IS NOT NULL AND {nxt} IS NOT NULL THEN {interp} "
                "ELSE CAST(NULL AS DOUBLE) END"
            )
            continue

        # boundary lines through the two known points nearest each end
        l, l2 = f"try_element_at({k}, -1)", f"try_element_at({k}, -2)"
        f1, f2 = f"try_element_at({k}, 1)", f"try_element_at({k}, 2)"
        fwd = (
            f"({l}).y + (({l}).y - ({l2}).y)"
            f" / (({l}).x - ({l2}).x) * ({x} - ({l}).x)"
        )
        bwd = (
            f"({f1}).y + (({f1}).y - ({f2}).y)"
            f" / (({f1}).x - ({f2}).x) * ({x} - ({f1}).x)"
        )
        final[c] = (
            f"CASE WHEN {y} IS NOT NULL THEN {y} "
            f"WHEN size({k}) = 0 THEN CAST(NULL AS DOUBLE) "
            # single known value: carry forward only (leading rows null)
            f"WHEN size({k}) = 1 THEN ({prev}).y "
            # interior gap
            f"WHEN {prev} IS NOT NULL AND {nxt} IS NOT NULL THEN {interp} "
            # trailing gap: extend line through last two known points
            f"WHEN {x} > ({l}).x THEN {fwd} "
            # leading gap: extend line through first two known points
            f"ELSE {bwd} END"
        )
    return [(karrs, []), (final, drops)]


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
    from foresttime_builder_spark.functions.helpers import apply_layers

    return apply_layers(
        df, step_interpolate_layers(group_cols, order_col, cols)
    )


def step_interpolate_layers(
    group_cols: Sequence[str],
    order_col: str,
    cols: Sequence[str],
) -> list[tuple[dict[str, str], list[str]]]:
    """:func:`step_interpolate` as ``apply_layers`` layers (r16 chain
    fusion; see :func:`fill_gaps_layers`).

    ONE window function per column (same design as linear_interpolate):
    the sorted (index, value) known array is a group constant computed
    once per group; nearest-known lookups either side are codegen'd array
    filters instead of interpreted per-row window evaluations.  The
    row_number layer stays separate (cheap, single-function Window node)
    since the packed struct depends on it — the ASAP packer keeps the
    dependency order.  SQL-text expressions for the same py4j-chatter
    reason as linear_interpolate."""
    part = _partition_clause(group_cols)
    over = (
        f"OVER ({part}ORDER BY {_qident(order_col)} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )

    rn = {"_sg_i": f"row_number() OVER ({part}ORDER BY {_qident(order_col)})"}
    karrs = {}
    for c in cols:
        kp = (
            f"CASE WHEN {_qident(c)} IS NOT NULL"
            f" THEN named_struct('i', _sg_i, 'v', {_qident(c)}) END"
        )
        karrs[f"_sg_{c}_k"] = f"collect_list({kp}) {over}"
    filled = {}
    drops = ["_sg_i"]
    for c in cols:
        k = _qident(f"_sg_{c}_k")
        drops.append(f"_sg_{c}_k")
        prev = f"try_element_at(filter({k}, e -> e.i <= _sg_i), -1)"
        nxt = f"try_element_at(filter({k}, e -> e.i >= _sg_i), 1)"
        switch_at = f"({prev}).i + CEIL((({nxt}).i - ({prev}).i) / 2.0D)"
        filled[c] = (
            f"CASE WHEN {_qident(c)} IS NOT NULL THEN {_qident(c)} "
            f"WHEN {prev} IS NULL THEN NULL "  # leading: stay null
            f"WHEN {nxt} IS NULL THEN ({prev}).v "  # trailing: last value
            f"WHEN _sg_i < {switch_at} THEN ({prev}).v "
            f"ELSE ({nxt}).v END"
        )
    return [(rn, []), (karrs, []), (filled, drops)]
