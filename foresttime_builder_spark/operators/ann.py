"""Approximate nearest-neighbor search over embedding columns.

Two paths over an ``array<float>`` embedding column:

- brute-force cosine top-k (the exactness baseline; see q17 in the query
  registry) — O(probes × corpus);
- :func:`lsh_topk`: random-hyperplane LSH — deterministic pseudo-random
  hyperplanes derived from md5 (so the construction is reproducible across
  engines and runs), sign-bit signatures, candidates restricted to the same
  bucket, exact cosine re-ranking inside the bucket.

Scale notes: the signature computation is a narrow map; the bucket join
shuffles on the bucket key (buckets ≈ 2^n_bits, tune n_bits so buckets fit
in a partition); re-ranking touches only same-bucket pairs, turning the
quadratic all-pairs into sum-of-squared-bucket-sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _plane_component(bit: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]."""
    h = _hash60(F.lit(f"{bit}_{dim}"))
    return ((h % 2001) - 1000) / 1000.0


def signature_bits(vec: Column, dims: int, n_bits: int) -> Column:
    """Sign-bit LSH signature as a bit-string column."""
    bits = []
    for b in range(n_bits):
        dot = None
        for j in range(dims):
            term = vec.getItem(j).cast("double") * _plane_component(b, j)
            dot = term if dot is None else dot + term
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    return dot / (norm(a) * norm(b))


def lsh_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 32,
    n_bits: int = 8,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` same-bucket neighbors per vector under random-hyperplane
    LSH with exact cosine re-ranking (ranking on the rounded cosine so the
    order is reproducible across engines)."""
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("vec"),
    ).withColumn("bucket", signature_bits(F.col("vec"), dims, n_bits))

    left = base.select(
        F.col("vid").alias("probe_id"),
        F.col("vec").alias("pvec"),
        "bucket",
    )
    pairs = left.join(base, on="bucket").filter(F.col("probe_id") != F.col("vid"))
    scored = pairs.select(
        "probe_id",
        F.col("vid").alias("neighbor_id"),
        F.round(cosine(F.col("pvec"), F.col("vec")), 6).alias("cosine"),
    )
    w = W.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 32,
    n_bits: int = 8,
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`lsh_topk` (identical hyperplane construction)."""

    def plane(b: int, j: int) -> str:
        h = (
            f"CAST(concat('0x', substr(md5('{b}_{j}'), 1, 15)) AS BIGINT)"
        )
        return f"(({h} % 2001) - 1000) / 1000.0"

    bit_exprs = []
    for b in range(n_bits):
        dot = " + ".join(
            f"CAST(vec[{j + 1}] AS DOUBLE) * {plane(b, j)}" for j in range(dims)
        )
        bit_exprs.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    sig = " || ".join(bit_exprs)
    return f"""
WITH base AS (
  SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS vec FROM {table}
),
sigs AS (
  SELECT vid, vec, {sig} AS bucket FROM base
),
pairs AS (
  SELECT a.vid AS probe_id, b.vid AS neighbor_id,
         round(list_dot_product(a.vec, b.vec)
               / (sqrt(list_dot_product(a.vec, a.vec))
                  * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vid != b.vid
),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT probe_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 32,
    n_bits: int = 6,
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family): LSH-bucketed
    candidate generation + exact cosine verification at ``threshold``.
    Fewer bits than top-k search — recall matters more than bucket size for
    dedup. Returns (id_a, id_b, cosine) with id_a < id_b."""
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("vec"),
    ).withColumn("bucket", signature_bits(F.col("vec"), dims, n_bits))
    left = base.select(
        F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    pairs = left.join(base, on="bucket").filter(F.col("id_a") < F.col("vid"))
    return (
        pairs.select(
            "id_a",
            F.col("vid").alias("id_b"),
            F.round(cosine(F.col("vec_a"), F.col("vec")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 32,
    n_bits: int = 6,
    threshold: float = 0.3,
) -> str:
    def plane(b: int, j: int) -> str:
        h = f"CAST(concat('0x', substr(md5('{b}_{j}'), 1, 15)) AS BIGINT)"
        return f"(({h} % 2001) - 1000) / 1000.0"

    bit_exprs = []
    for b in range(n_bits):
        dot = " + ".join(
            f"CAST(vec[{j + 1}] AS DOUBLE) * {plane(b, j)}" for j in range(dims)
        )
        bit_exprs.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    sig = " || ".join(bit_exprs)
    return f"""
WITH base AS (
  SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS vec FROM {table}
),
sigs AS (SELECT vid, vec, {sig} AS bucket FROM base)
SELECT a.vid AS id_a, b.vid AS id_b,
       round(list_dot_product(a.vec, b.vec)
             / (sqrt(list_dot_product(a.vec, a.vec))
                * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vid < b.vid
WHERE round(list_dot_product(a.vec, b.vec)
            / (sqrt(list_dot_product(a.vec, a.vec))
               * sqrt(list_dot_product(b.vec, b.vec))), 6) >= {threshold}
"""
