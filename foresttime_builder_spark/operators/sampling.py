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
