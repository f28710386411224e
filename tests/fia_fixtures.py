"""Test-side shim over the package fixture module.

The fixture rows moved to
:mod:`foresttime_builder_spark.sources.fixture_state` so the end-to-end
state-pipeline gate (q51) and the pytest suite share one source of truth.
``build_db`` keeps the historical pandas-DataFrame return shape for the
CSV-writing tests.
"""

from __future__ import annotations

import pandas as pd

from foresttime_builder_spark.sources.fixture_state import (  # noqa: F401
    COND_SCHEMA,
    GEOM_SCHEMA,
    PLOT_SCHEMA,
    TREE_SCHEMA,
    YEARS,
    build_rows,
    spark_db,
)


def build_db() -> dict[str, pd.DataFrame]:
    return {
        table: pd.DataFrame(rows, columns=cols)
        for table, (cols, rows) in build_rows().items()
    }
