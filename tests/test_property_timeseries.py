"""Property-based tests: the distributed window formulations of the
time-series operators must agree with straightforward sequential Python
models on arbitrary panels (beyond the reference's fixed golden vectors)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from foresttime_builder_spark.operators import (
    expand_grid,
    fill_gaps,
    linear_interpolate,
    step_interpolate,
)

# one group: sorted distinct years with optional-null values
panel_strategy = st.lists(
    st.tuples(
        st.integers(min_value=2000, max_value=2030),
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _grid(years):
    return list(range(min(years), max(years) + 1))


def _model_linear(points: dict[int, float | None], grid: list[int]):
    """Sequential model of inter_extra_polate (R/inter_extra_polate.R)."""
    known = [(x, points[x]) for x in sorted(points) if points.get(x) is not None]
    out = {}
    for x in grid:
        if points.get(x) is not None:
            out[x] = float(points[x])
        elif not known:
            out[x] = None
        elif len(known) == 1:
            out[x] = float(known[0][1]) if x > known[0][0] else None
            if x == known[0][0]:
                out[x] = float(known[0][1])
        else:
            lo = [p for p in known if p[0] <= x]
            hi = [p for p in known if p[0] >= x]
            if lo and hi:
                (x0, y0), (x1, y1) = lo[-1], hi[0]
                out[x] = y0 + (y1 - y0) / (x1 - x0) * (x - x0) if x1 != x0 else float(y0)
            elif not hi:  # trailing: line through last two known
                (x0, y0), (x1, y1) = known[-2], known[-1]
                out[x] = y1 + (y1 - y0) / (x1 - x0) * (x - x1)
            else:  # leading: line through first two known
                (x0, y0), (x1, y1) = known[0], known[1]
                out[x] = y0 + (y1 - y0) / (x1 - x0) * (x - x0)
    return out


def _model_step(points: dict[int, int | None], grid: list[int]):
    """Sequential model of step_interp (R/step_interp.R): positional
    midpoint switch, trailing fill, leading nulls stay null."""
    vals = [points.get(x) for x in grid]
    n = len(vals)
    out = list(vals)
    known_idx = [i for i, v in enumerate(vals) if v is not None]
    for i, v in enumerate(vals):
        if v is not None:
            continue
        prevs = [j for j in known_idx if j < i]
        nexts = [j for j in known_idx if j > i]
        if not prevs:
            out[i] = None
        elif not nexts:
            out[i] = vals[prevs[-1]]
        else:
            p, q = prevs[-1], nexts[0]
            switch = p + math.ceil((q - p) / 2)
            out[i] = vals[p] if i < switch else vals[q]
    return dict(zip(grid, out))


def _run(spark, rows, op, value_type="double"):
    df = spark.createDataFrame(
        [("g", x, v) for x, v in rows],
        f"g string, x int, v {value_type}",
    )
    g = expand_grid(df, ["g"], "x")
    out = op(g)
    return {
        r["x"]: r["v"] for r in out.select("x", "v").collect()
    }


@given(panel=panel_strategy)
@settings(**_SETTINGS)
def test_linear_interpolate_matches_model(spark, panel):
    rows = [(x, float(v) if v is not None else None) for x, v in panel]
    points = dict(rows)
    got = _run(
        spark, rows, lambda g: linear_interpolate(g, ["g"], "x", ["v"])
    )
    want = _model_linear(points, _grid([x for x, _ in rows]))
    assert set(got) == set(want)
    for x in want:
        if want[x] is None:
            assert got[x] is None, f"x={x}: expected null, got {got[x]}"
        else:
            assert got[x] == pytest.approx(want[x], rel=1e-9), f"x={x}"


@given(panel=panel_strategy)
@settings(**_SETTINGS)
def test_step_interpolate_matches_model(spark, panel):
    rows = list(panel)
    points = dict(rows)
    got = _run(
        spark, rows, lambda g: step_interpolate(g, ["g"], "x", ["v"]),
        value_type="int",
    )
    want = _model_step(points, _grid([x for x, _ in rows]))
    assert got == want


@given(panel=panel_strategy)
@settings(**_SETTINGS)
def test_fill_downup_matches_model(spark, panel):
    rows = list(panel)
    got = _run(
        spark, rows, lambda g: fill_gaps(g, ["g"], "x", ["v"], "downup"),
        value_type="int",
    )
    grid = _grid([x for x, _ in rows])
    points = dict(rows)
    vals = [points.get(x) for x in grid]
    known = [v for v in vals if v is not None]
    want = {}
    last = None
    for x, v in zip(grid, vals):
        if v is not None:
            last = v
        want[x] = last if last is not None else (known[0] if known else None)
    assert got == want
