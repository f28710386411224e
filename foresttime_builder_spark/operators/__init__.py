from foresttime_builder_spark.operators.timeseries import (
    expand_grid,
    fill_gaps,
    linear_interpolate,
    step_interpolate,
)

__all__ = [
    "expand_grid",
    "fill_gaps",
    "linear_interpolate",
    "step_interpolate",
]
