"""Brute-force cosine top-k: probe-cap contract + exactness on a tiny corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from foresttime_builder_spark.operators.ann import brute_topk_np


def _corpus(spark, n=40, dims=4):
    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dims)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, vec array<double>")


def test_probe_cap_raises(spark):
    base = _corpus(spark)
    probes = base.select(
        F.col("vec_id").alias("probe_id"), F.col("vec").alias("probe_vec")
    )
    with pytest.raises(ValueError, match="max_probes"):
        brute_topk_np(base, probes, k=3, max_probes=10)


def test_brute_topk_matches_exact(spark):
    base = _corpus(spark)
    probes = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("vec").alias("probe_vec")
    )
    got = {
        (r.probe_id, r.rank): (r.neighbor_id, r.cosine)
        for r in brute_topk_np(base, probes, k=3).collect()
    }
    data = {r.vec_id: r.vec for r in base.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for p in range(3):
        sims = sorted(
            ((round(cos(data[p], v), 6), -i) for i, v in data.items() if i != p),
            reverse=True,
        )
        for rank, (c, neg_i) in enumerate(sims[:3], start=1):
            assert got[(p, rank)] == (-neg_i, c)


def test_ivf_topk_dims_mismatch_raises(spark):
    """A pinned dims that disagrees with the data must raise instead of
    silently truncating the distance/cosine arithmetic (the oracle always
    covers the full vector width)."""
    from foresttime_builder_spark.operators.ann import ivf_topk

    emb = _corpus(spark, n=10, dims=4).withColumnRenamed("vec", "embedding")
    with pytest.raises(ValueError, match="probed width"):
        ivf_topk(emb, dims=8)
