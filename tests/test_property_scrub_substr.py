"""Property tests: the distributed formulations of domain_cap and
duplicated_span_coverage must agree with straightforward sequential Python
models on arbitrary inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from foresttime_builder_spark.operators.scrub import domain_cap
from foresttime_builder_spark.operators.substr import duplicated_span_coverage

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (host_index, quality) rows; doc_id assigned by position
docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=30,
)


def _model_domain_cap(rows, cap):
    """Sequential model: per host, sort by (-quality, doc_id), keep cap."""
    by_host: dict[str, list] = {}
    for doc_id, host, quality in rows:
        by_host.setdefault(host, []).append((doc_id, quality))
    kept = {}
    for host, docs in by_host.items():
        docs.sort(key=lambda d: (-d[1], d[0]))
        for rank, (doc_id, _q) in enumerate(docs[:cap], start=1):
            kept[doc_id] = (host, rank)
    return kept


@settings(**_SETTINGS)
@given(docs=docs_strategy, cap=st.integers(min_value=1, max_value=4))
def test_domain_cap_matches_model_both_paths(spark, docs, cap):
    rows = [(i, f"h{h}.example.com", q) for i, (h, q) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, host string, quality long")
    order = [F.col("quality").desc(), F.col("doc_id").asc()]
    expected = _model_domain_cap(rows, cap)
    for kwargs in (
        {},
        {"two_stage": True, "n_salts": 3, "salt_on": F.col("doc_id")},
    ):
        got = {
            r["doc_id"]: (r["host"], r["rank_in_domain"])
            for r in domain_cap(df, "host", order, cap, **kwargs).collect()
        }
        assert got == expected


def _model_dup_coverage(texts: list[str], n: int):
    """Sequential model: windows shared by >=2 docs; union their spans."""
    win_docs: dict[tuple, set] = {}
    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            win_docs.setdefault(tuple(toks[i : i + n]), set()).add(doc_id)
    out = {}
    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        spans = [
            i
            for i in range(len(toks) - n + 1)
            if len(win_docs[tuple(toks[i : i + n])]) >= 2
        ]
        covered = set()
        for i in spans:
            covered.update(range(i, i + n))
        out[doc_id] = (len(spans), len(covered))
    return out


# small vocab so shared windows actually occur
texts_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12
    ).map(" ".join),
    min_size=2,
    max_size=6,
)


@settings(**_SETTINGS)
@given(texts=texts_strategy, n=st.integers(min_value=2, max_value=4))
def test_dup_coverage_matches_model(spark, texts, n):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    expected = _model_dup_coverage(texts, n)
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["dup_token_cov"])
        for r in duplicated_span_coverage(df, "doc_id", "text", n=n).collect()
    }
    assert got == expected
