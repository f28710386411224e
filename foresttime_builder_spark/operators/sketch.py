"""Distinct-count sketching (KMV / bottom-k) with cross-engine determinism.

A K-Minimum-Values sketch estimates the number of distinct values from the
k smallest normalized hashes: if the k-th smallest of n uniform hashes in
[0, 1) is R, then n ≈ (k-1)/R.  Spark ships HyperLogLog++
(``approx_count_distinct``), but its sketch is engine-specific and cannot be
verified against an independent engine.  This KMV is built from ``md5`` —
available and bit-identical in both Spark and DuckDB — so the *estimate
itself* is deterministic and the correctness harness can hash-gate an
approximate operator exactly (same reason the bisection uses a fixed
iteration count).

Normalization uses the first 13 hex digits = 52 bits, exactly representable
in a double; dividing by 16^13 = 2^52 is a pure binary-exponent scale, so
the arithmetic is IEEE-exact in both engines.

Scale: the distinct + global top-k is one shuffle of (at most) the distinct
hash space, and ``orderBy().limit(k)`` plans as TakeOrderedAndProject
(per-partition top-k, then a k-sized merge on one reducer) — no full sort
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: 16^13 == 2^52 — the exact-double normalization base
_BASE = float(2**52)


def hex13_poly_sql(hash_sql: str) -> str:
    """SQL that parses the first 13 hex chars of ``hash_sql`` into an exact
    integer-valued double.  Uses only ANSI pieces (position / substring /
    integer literals) so the identical text runs on Spark and DuckDB."""
    # weights must be BIGINT: a small weight literal types as INT32 and
    # (digit × weight) overflows under ANSI arithmetic
    terms = " + ".join(
        f"(position(substring({hash_sql}, {i + 1}, 1) IN "
        f"'0123456789abcdef') - 1) * CAST({16 ** (12 - i)} AS BIGINT)"
        for i in range(13)
    )
    return f"({terms})"


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One-row frame: ``(est_distinct, n_exact)`` for ``col``.

    ``est_distinct`` is the KMV estimate ((k-1)/R_k, or the exact count when
    fewer than k distinct hashes exist); ``n_exact`` is the true distinct
    count, kept so the sketch's accuracy is visible in the gated output."""
    poly = hex13_poly_sql(f"md5(CAST({col} AS STRING))")
    # NULLs are excluded like count(DISTINCT col) would: md5(NULL) is a
    # NULL hash, which Spark's ASC sort would otherwise place INSIDE the
    # bottom-k (NULLS FIRST) while DuckDB leaves it out (NULLS LAST)
    hv = df.filter(F.col(col).isNotNull()).select(
        (F.expr(poly) / F.lit(_BASE)).alias("v")
    ).distinct()
    topk = hv.orderBy("v").limit(k)
    agg = topk.agg(
        F.count(F.lit(1)).alias("k_n"), F.max("v").alias("kth")
    ).crossJoin(hv.agg(F.count(F.lit(1)).alias("n_exact")))
    est = F.when(
        F.col("k_n") < k, F.col("k_n").cast("double")
    ).otherwise((k - 1) / F.col("kth"))
    # portable 4-decimal rounding (see cross-engine parity conventions)
    est_r = F.floor(est * 10000 + F.lit(0.5)) / 10000
    return agg.select(est_r.alias("est_distinct"), "n_exact")


def kmv_oracle_sql(table: str, col: str, k: int = 64) -> str:
    """The DuckDB twin, generated from the same polynomial text."""
    poly = hex13_poly_sql(f"md5(CAST({col} AS VARCHAR))")
    return f"""
WITH hv AS (SELECT DISTINCT {poly} / {_BASE!r} AS v FROM {table}
            WHERE {col} IS NOT NULL),
topk AS (SELECT v FROM hv ORDER BY v LIMIT {k}),
agg AS (
  SELECT (SELECT count(*) FROM topk) AS k_n,
         (SELECT max(v) FROM topk) AS kth,
         (SELECT count(*) FROM hv) AS n_exact
)
SELECT floor((CASE WHEN k_n < {k} THEN CAST(k_n AS DOUBLE)
              ELSE {k - 1} / kth END) * 10000 + 0.5) / 10000 AS est_distinct,
       n_exact
FROM agg
"""


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 64,
    with_exact: bool = False,
    oversample: float = 4.0,
) -> DataFrame:
    """Per-GROUP KMV: ``(group_col, est_distinct[, n_exact])`` — the
    mergeable distinct-cardinality profile a mixing pipeline reads per
    source/domain ("how big is each crawl's vocabulary") where
    :func:`kmv_distinct` answers only the global question.  The
    vocabulary_overlap docstring's "switch to sketches at thousands of
    groups" path lands here.

    Same determinism contract as the global form (md5 / 2^52 hashes, so
    the APPROXIMATE estimate itself is engine-exact and hash-gateable);
    NULL values are excluded per the count(DISTINCT) convention, NULL
    groups are real groups.  ``with_exact=True`` adds ``n_exact`` (the
    true per-group distinct count) so accuracy is visible in gated output.

    Scale shape — this is where the sketch earns its keep.  The rank
    window must NOT sort each group's full distinct hash space (that
    would cost as much as the exact answer).  Instead:

    1. one ``(group, hash)``-distinct shuffle (unavoidable input);
    2. a LINEAR per-group count of that distinct space (map-side combine,
       no sort) — one row per group, broadcast-sized for any realistic
       grouping, doubling as ``n_exact`` when requested;
    3. a per-group hash threshold ``t_g = min(1, oversample*k / n_g)``
       applied map-side after the (typically broadcast) count join, so
       only ~``oversample*k`` hashes per group reach the rank window;
    4. an exactness fallback: a group whose survivor count lands below
       ``k`` despite ``n_g >= k`` (Chernoff tail, ~e^-(oversample*k))
       is re-ranked over its FULL hash space via a semi-join — so the
       pre-cut can never change the answer, only the cost.  In the
       common case that branch shuffles zero rows.

    The estimate is bit-identical to the uncut form: groups with
    ``n_g < k`` report ``n_g`` exactly (no hashes needed at all), and the
    bottom-``k`` of a group with ``>= k`` survivors under ``t_g`` is by
    construction the group's true bottom-``k`` (survivors are ALL hashes
    ``<= t_g``)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if oversample < 1.0:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    from pyspark.sql import Window as W

    from foresttime_builder_spark.operators.cache import release_on_gc

    poly = hex13_poly_sql(f"md5(CAST({col} AS STRING))")
    # persisted: hv feeds the count, the threshold join, and the fallback
    # semi-join — three plan branches; without the cache the expensive
    # explode+distinct recomputes per branch (measured at sf10: 75-80 s
    # unpersisted vs ~13 s persisted for the q117 shape, i.e. the
    # "economics" were NEGATIVE until this line).  release_on_gc ties the
    # cache to the returned frame's lifetime (the dedup discipline).
    hv = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(group_col).alias("_g"), (F.expr(poly) / F.lit(_BASE)).alias("v"))
        .distinct()
        .persist()
    )
    cnt = hv.groupBy("_g").agg(F.count(F.lit(1)).alias("_n_g"))

    def _bottom_k(frame: DataFrame) -> DataFrame:
        w = W.partitionBy("_g").orderBy("v")
        return (
            frame.select("_g", "v", F.row_number().over(w).alias("_rk"))
            .filter(F.col("_rk") <= k)
            .groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_k_n"), F.max("v").alias("_kth"))
        )

    # threshold join is null-safe: NULL groups are real groups, and an
    # equi-join key would silently drop them
    t_g = F.least(F.lit(1.0), F.lit(float(oversample * k)) / F.col("_n_g"))
    surv = (
        hv.alias("h")
        .join(cnt.alias("c"), F.col("h._g").eqNullSafe(F.col("c._g")))
        .select(F.col("h._g").alias("_g"), "v", "_n_g")
        .filter(F.col("v") <= t_g)
    )
    # LEFT join from cnt so a group losing every hash to the cut (or to
    # the tail) still appears and routes to the fallback, never vanishes
    base = (
        cnt.alias("c")
        .join(
            _bottom_k(surv).alias("r"),
            F.col("c._g").eqNullSafe(F.col("r._g")),
            "left",
        )
        .select(F.col("c._g").alias("_g"), "_n_g", "_k_n", "_kth")
    )
    safe = base.filter(
        (F.col("_n_g") < k) | (F.coalesce("_k_n", F.lit(0)) >= k)
    )
    unsafe = base.filter(
        (F.col("_n_g") >= k) & (F.coalesce("_k_n", F.lit(0)) < k)
    ).select("_g", "_n_g")
    un_hv = hv.alias("h").join(
        unsafe.alias("u"),
        F.col("h._g").eqNullSafe(F.col("u._g")),
        "left_semi",
    )
    redone = (
        unsafe.alias("u")
        .join(
            _bottom_k(un_hv).alias("r"),
            F.col("u._g").eqNullSafe(F.col("r._g")),
        )
        .select(F.col("u._g").alias("_g"), "_n_g", "_k_n", "_kth")
    )
    agg = safe.unionByName(redone)
    est = F.when(
        F.col("_n_g") < k, F.col("_n_g").cast("double")
    ).otherwise((k - 1) / F.col("_kth"))
    out_cols = [
        F.col("_g").alias(group_col),
        (F.floor(est * 10000 + F.lit(0.5)) / 10000).alias("est_distinct"),
    ]
    if with_exact:
        out_cols.append(F.col("_n_g").alias("n_exact"))
    return release_on_gc(agg.select(*out_cols), hv)


def kmv_by_oracle_sql(
    table: str, group_col: str, col: str, k: int = 64,
    with_exact: bool = False,
) -> str:
    """DuckDB twin of :func:`kmv_distinct_by` — identical hash polynomial,
    rank order, and estimate arithmetic.  The twin ranks each group's FULL
    hash space (the un-cut form); the Spark side's threshold pre-cut is
    provably lossless, so the outputs hash-match — which is exactly what
    the gate verifies.  ``with_exact`` mirrors the Spark flag — including
    its DEFAULT (False): a twin whose default diverged from the Spark
    side's would hand any future both-defaults query a silent schema
    mismatch (an extra ``n_exact`` column) at the gate."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    poly = hex13_poly_sql(f"md5(CAST({col} AS VARCHAR))")
    exact_col = ",\n       n_exact" if with_exact else ""
    return f"""
WITH hv AS (
  SELECT DISTINCT {group_col} AS g, {poly} / {_BASE!r} AS v
  FROM {table} WHERE {col} IS NOT NULL
), ranked AS (
  SELECT g, v,
         row_number() OVER (PARTITION BY g ORDER BY v) AS rk,
         count(*) OVER (PARTITION BY g) AS n_exact
  FROM hv
), agg AS (
  SELECT g, count(*) AS k_n, max(v) AS kth, max(n_exact) AS n_exact
  FROM ranked WHERE rk <= {k} GROUP BY g
)
SELECT g AS {group_col},
       floor((CASE WHEN k_n < {k} THEN CAST(k_n AS DOUBLE)
              ELSE {k - 1} / kth END) * 10000 + 0.5) / 10000 AS est_distinct{exact_col}
FROM agg
"""
