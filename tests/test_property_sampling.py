"""Property-based tests for the sampling family: the prefiltered
quota_sample path and upsample_to_quota must agree with a sequential
Python model on arbitrary corpora and quotas."""

from __future__ import annotations

import hashlib

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from foresttime_builder_spark.operators.sampling import (
    quota_sample,
    upsample_to_quota,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (doc_ids per source, quota per source) over up to 3 sources
corpus_strategy = st.lists(
    st.tuples(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=1,
            max_size=12,
            unique=True,
        ),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=3,
)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _model(corpus):
    """Sequential model: per source, rank ids by (hash, id); emit
    floor(q/n)+[rank<=q%n] copies of each with 1-based epochs."""
    out = []
    for si, (ids, q) in enumerate(corpus):
        ranked = sorted(ids, key=lambda i: (_hash60(str(i)), i))
        n = len(ranked)
        for rank, i in enumerate(ranked, start=1):
            copies = q // n + (1 if rank <= q % n else 0)
            for epoch in range(1, copies + 1):
                out.append((f"s{si}", i, rank, epoch))
    return sorted(out)


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
def test_upsample_matches_sequential_model(spark, corpus):
    rows = [(i, f"s{si}") for si, (ids, _) in enumerate(corpus) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    quotas = spark.createDataFrame(
        [(f"s{si}", q) for si, (_, q) in enumerate(corpus)],
        "source string, quota long",
    )
    got = sorted(
        (r.source, r.doc_id, r.sample_rank, r.epoch)
        for r in upsample_to_quota(df, quotas).collect()
    )
    assert got == _model(corpus)
    # exact-quota invariant
    per_src = {}
    for s, *_ in got:
        per_src[s] = per_src.get(s, 0) + 1
    for si, (_ids, q) in enumerate(corpus):
        assert per_src.get(f"s{si}", 0) == q


@given(corpus=corpus_strategy, safety=st.sampled_from([0.5, 1.5, 3.0]))
@settings(**_SETTINGS)
def test_prefilter_equals_plain_quota_sample(spark, corpus, safety):
    rows = [(i, f"s{si}") for si, (ids, _) in enumerate(corpus) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    quotas = spark.createDataFrame(
        [(f"s{si}", q) for si, (_, q) in enumerate(corpus)],
        "source string, quota long",
    )
    plain = sorted(
        (r.source, r.doc_id, r.sample_rank)
        for r in quota_sample(df, quotas).collect()
    )
    pre = sorted(
        (r.source, r.doc_id, r.sample_rank)
        for r in quota_sample(df, quotas, prefilter_safety=safety).collect()
    )
    assert pre == plain


def test_calibrate_scores_percent_rank_and_ties(spark):
    from foresttime_builder_spark.operators.sampling import calibrate_scores

    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 20),
            (3, "a", 20),   # tie with 2 -> same pct
            (4, "a", 30),
            (5, "b", 99),   # singleton group -> 0
        ],
        ["doc_id", "source", "score"],
    )
    out = {
        r["doc_id"]: r["pct_e6"]
        for r in calibrate_scores(df, "doc_id", "source", "score").collect()
    }
    # group a: n=4 -> (rank-1)/3
    assert out[1] == 0
    assert out[2] == out[3] == 333333  # rank 2 -> 1/3 floored at e6
    assert out[4] == 1_000_000
    assert out[5] == 0


def test_weighted_sample_contract(spark):
    import hashlib
    import math

    from foresttime_builder_spark.operators.sampling import weighted_sample

    rows = [(i, "g", 1 + (i % 7)) for i in range(30)] + [
        (100, "h", 5),
        (101, "h", 0),      # zero weight -> excluded
        (102, "h", None),   # null weight -> excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    out = weighted_sample(df, "doc_id", "grp", "w", k=4).collect()
    got = {(r["doc_id"], r["grp"], r["sample_rank"]) for r in out}

    # python reference of the ES ranking
    def key(i, w):
        h = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:15], 16)
        u = max(min(h / 2.0**60, 1.0 - 2.0**-53), 2.0**-60)
        return math.log(u) / w

    ref = set()
    for g, members in (
        ("g", [(i, 1 + (i % 7)) for i in range(30)]),
        ("h", [(100, 5)]),
    ):
        ranked = sorted(members, key=lambda t: (-key(*t), t[0]))
        for rk, (i, _) in enumerate(ranked[:4], 1):
            ref.add((i, g, rk))
    assert got == ref


def test_weighted_sample_heavier_weights_win_more(spark):
    # statistical sanity at a fixed seed: heavy ids (weight 100) should
    # dominate light ids (weight 1) in the sample
    from foresttime_builder_spark.operators.sampling import weighted_sample

    rows = [(i, "g", 100 if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    out = weighted_sample(df, "doc_id", "grp", "w", k=20).collect()
    heavy = sum(1 for r in out if r["doc_id"] < 50)
    assert heavy >= 15  # deterministic given the fixed hash construction


def test_stratified_split_exact_counts(spark):
    from foresttime_builder_spark.operators.sampling import (
        stratified_split_exact,
    )

    rows = [(i, "s%d" % (i % 3)) for i in range(97)]
    df = spark.createDataFrame(rows, ["doc_id", "stratum"])
    out = stratified_split_exact(
        df, "doc_id", "stratum",
        splits=(("train", 7000), ("val", 2000), ("test", 1000)),
    ).collect()
    from collections import Counter

    per = Counter((r["stratum"], r["split"]) for r in out)
    sizes = Counter(r["stratum"] for r in out)
    for s, n in sizes.items():
        assert per[(s, "train")] == n * 7000 // 10000
        assert per[(s, "val")] == n * 9000 // 10000 - n * 7000 // 10000
        assert per[(s, "test")] == n - n * 9000 // 10000
    # deterministic: re-run gives identical assignments
    again = {
        (r["doc_id"], r["split"])
        for r in stratified_split_exact(
            df, "doc_id", "stratum",
            splits=(("train", 7000), ("val", 2000), ("test", 1000)),
        ).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in out}


def test_stratified_split_weight_validation():
    from foresttime_builder_spark.operators.sampling import (
        stratified_split_exact,
    )

    with pytest.raises(ValueError, match="10000"):
        stratified_split_exact(None, "i", "s", splits=(("a", 5000),))
