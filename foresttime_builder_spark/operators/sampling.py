"""Deterministic source-mixing / quota sampling for corpus construction.

Training mixes are specified as per-source quotas ("X docs (or tokens)
from source S").  The operator draws each source's quota by ranking its
documents on a content-independent deterministic hash of the id — i.e. a
reproducible uniform sample that is stable under corpus re-partitioning
and appends (a doc's rank only changes if higher-hash docs are added, so
samples are ~consistent as the corpus grows, unlike ``LIMIT``/physical
order which is nondeterministic in a distributed scan).

Scale shape: one shuffle — the rank is a window keyed by the mix column;
quotas arrive as a broadcast dim.  Skewed sources (one source with 10^9
docs) are handled by the window's per-key sort spilling, and the
candidate set can be pre-filtered by an approximate hash threshold
(``hash < quota/count * MAX_HASH`` with a safety factor) before ranking
when a source is too large to sort — both sides of that refinement keep
exactly the same final sample because the hash order is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from foresttime_builder_spark.operators.dedup import hash60


def quota_sample(
    df: DataFrame,
    quotas: DataFrame,
    mix_col: str = "source",
    id_col: str = "doc_id",
    quota_col: str = "quota",
) -> DataFrame:
    """Keep the ``quota`` lowest-hash rows of each ``mix_col`` group.

    ``quotas`` is a small (mix_col, quota) dim — broadcast.  Output adds
    ``sample_rank`` (1-based hash rank within the source).
    """
    h = hash60(F.col(id_col).cast("string"))
    rank = F.row_number().over(
        W.partitionBy(mix_col).orderBy(h.asc(), F.col(id_col).asc())
    )
    ranked = df.withColumn("sample_rank", rank)
    return ranked.join(F.broadcast(quotas), mix_col).filter(
        F.col("sample_rank") <= F.col(quota_col)
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (
        ("train", 8000),
        ("val", 1000),
        ("test", 1000),
    ),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket each row by an
    engine-portable content-independent hash of ``(salt, id)`` into 10,000
    cells and carve the cells by the cumulative split weights (given in
    basis points; must sum to 10,000).

    Properties a training pipeline needs and ``randomSplit`` lacks: the
    assignment is a pure function of the id — stable under repartitioning,
    re-runs, appends, and engine (the DuckDB twin reproduces it exactly);
    changing ``salt`` re-rolls every assignment at once.  Narrow, zero
    shuffle."""
    total = sum(w for _, w in splits)
    if total != 10_000:
        raise ValueError(f"split weights must sum to 10000 bp, got {total}")
    bucket = hash60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 10_000
    expr = None
    cum = 0
    for name, w in splits[:-1]:
        cum += w
        cond = bucket < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def split_assign_oracle_sql(
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (
        ("train", 8000),
        ("val", 1000),
        ("test", 1000),
    ),
    salt: str = "split-v1",
) -> str:
    """DuckDB CASE expression computing the identical ``split`` column."""
    bucket = (
        f"CAST(concat('0x', substr(md5('{salt}:' || "
        f"CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT) % 10000"
    )
    parts, cum = [], 0
    for name, w in splits[:-1]:
        cum += w
        parts.append(f"WHEN {bucket} < {cum} THEN '{name}'")
    return f"CASE {' '.join(parts)} ELSE '{splits[-1][0]}' END"


def temperature_quotas(
    df: DataFrame,
    mix_col: str = "source",
    budget: int = 10_000,
) -> DataFrame:
    """Temperature-reweighted mixture quotas (alpha = 0.5): each source's
    share of ``budget`` is proportional to sqrt(its document count) — the
    standard move (UniMax / multilingual-sampling family) that upweights
    small sources relative to proportional sampling without letting a
    giant source dominate.

    Engine-exact by construction: per-source weights are
    ``floor(sqrt(count) * 1e6)`` BIGINTs (sqrt is IEEE-correctly-rounded
    in both engines, the scale-and-floor makes the weight an integer), the
    weight total is an exact integer sum, and the quota is
    ``floor(budget * w / W)`` over doubles that are exactly representable
    (< 2^53) — so Spark and the SQL twin agree bit-for-bit, which a
    float-weighted formulation (pow(), float sums in engine-specific
    order) would not.

    Returns the small (mix_col, n_docs, weight, quota) dim — broadcast it
    into :func:`quota_sample`.
    """
    counts = df.groupBy(mix_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_docs")) * 1_000_000).cast("long")
    )
    total = w.agg(F.sum("weight").alias("W"))
    return (
        w.crossJoin(F.broadcast(total))  # 1-row total: benign BNLJ
        .withColumn(
            "quota",
            F.floor(F.lit(budget) * F.col("weight") / F.col("W")).cast("long"),
        )
        .select(mix_col, "n_docs", "weight", "quota")
    )
