"""Slowly-changing-dimension (SCD Type 2) build from a change stream.

The standard warehouse operator: given per-key change events, emit one
row per *distinct consecutive state* with its validity interval —
``effective_from`` (first event of the run), ``effective_to`` (start of
the next run, NULL while current), ``is_current``.  Consecutive events
that repeat the same attribute tuple collapse into one version
(null-safe comparison, so NULL -> NULL is "no change" and NULL -> value
is a new version).

Precondition: ``(key, ts, tiebreak)`` must be unique — with equal
timestamps and no tiebreak the version order would be nondeterministic,
which for a dimension table means silently wrong history.

Scale shape (100 TB): ONE shuffle — both windows (the change-collapse
lag and the interval lead) share ``partitionBy(key)``, so Catalyst
plans a single exchange + sort and pipelines the second window over the
first's output.  No driver materialization, no joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["scd2_build", "scd2_build_oracle_sql"]


def _check(attr_cols: Sequence[str]) -> None:
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    if len(set(attr_cols)) != len(attr_cols):
        raise ValueError(f"attr_cols must be distinct, got {list(attr_cols)}")


def scd2_build(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a change stream into SCD2 version intervals.

    Returns ``(key_col, *attr_cols, effective_from, effective_to,
    is_current)`` — one row per run of identical attribute tuples per
    key, ordered runs closed by the next run's start.
    """
    _check(attr_cols)
    # a change row without a version timestamp cannot be placed in the
    # validity order (and NULL order keys sort to OPPOSITE ends in Spark
    # vs SQL engines) — excluded identically in the oracle twin
    df = df.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = F.lit(False)
    cur = df
    for a in attr_cols:
        cur = cur.withColumn(f"_prev_{a}", F.lag(a).over(w))
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"_prev_{a}"))
    first = F.row_number().over(w) == 1
    versions = (
        cur.withColumn("_keep", first | changed)
        .filter(F.col("_keep"))
        .select(
            key_col,
            *attr_cols,
            F.col(ts_col).alias("effective_from"),
            # carried so equal-timestamp versions (legal under the
            # precondition) chain deterministically, matching the oracle
            F.col(tiebreak_col).alias("_tb"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("effective_from", "_tb")
    return versions.select(
        key_col,
        *attr_cols,
        "effective_from",
        F.lead("effective_from").over(w2).alias("effective_to"),
    ).withColumn("is_current", F.col("effective_to").isNull())


def scd2_build_oracle_sql(
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str,
    table: str,
) -> str:
    """DuckDB twin of :func:`scd2_build` — identical null-safe change
    predicate and ordering."""
    _check(attr_cols)
    attrs = ", ".join(attr_cols)
    lags = ",\n         ".join(
        f"lag({a}) OVER w AS prev_{a}" for a in attr_cols
    )
    change = " OR ".join(
        f"NOT ({a} IS NOT DISTINCT FROM prev_{a})" for a in attr_cols
    )
    return f"""
WITH lagged AS (
  SELECT {key_col}, {attrs}, {ts_col}, {tiebreak_col},
         row_number() OVER w AS rn,
         {lags}
  FROM {table}
  WHERE {ts_col} IS NOT NULL
  -- NULLS FIRST: Spark sorts ASC null keys first, DuckDB defaults to
  -- last — a NULL tiebreak at an equal-timestamp pair flipped two runs
  WINDOW w AS (PARTITION BY {key_col}
               ORDER BY {ts_col}, {tiebreak_col} NULLS FIRST)
), versions AS (
  SELECT {key_col}, {attrs}, {ts_col} AS effective_from,
         {tiebreak_col} AS tb
  FROM lagged WHERE rn = 1 OR {change}
)
SELECT {key_col}, {attrs}, effective_from,
       lead(effective_from) OVER (
         PARTITION BY {key_col} ORDER BY effective_from, tb NULLS FIRST
       ) AS effective_to,
       lead(effective_from) OVER (
         PARTITION BY {key_col} ORDER BY effective_from, tb NULLS FIRST
       ) IS NULL AS is_current
FROM versions
"""
