"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship annualization query (dense year-grid
expansion + distributed linear interpolation) on sf0.001.
``queries()``/``oracle_sql()`` expose the engine's operator inventory with
DuckDB oracles — see ``foresttime_builder_spark/plans/benchmark_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from foresttime_builder_spark.plans.benchmark_queries import QUERIES  # noqa: E402


def _ensure_nanos_ok(spark: SparkSession) -> None:
    # older testdata generations stored INT64 TIMESTAMP(NANOS); with this
    # set they arrive as longs and sources.readers.load_table converts
    # (a no-op for the current timestamp[us] encoding)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_nanos_ok(spark)
    return QUERIES["q08_linear_interp"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_ok(spark)
            return QUERIES[name].fn(spark, sf_dir)

        return run

    return {name: _wrap(name) for name in QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted → rows-only)."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
