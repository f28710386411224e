"""BM25 relevance scoring contract: hand-computed reference values,
validation errors, and the no-hit filter."""

from __future__ import annotations

import math

import pytest

from foresttime_builder_spark.operators.relevance import bm25_scores


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    """Plain-Python reference implementation (same formulas, same idf)."""
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        score = 0.0
        hits = 0
        for t in terms:
            tf = v.count(t)
            hits += tf
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
        if hits > 0:
            out[i] = (len(v), hits, math.floor(score * 10000 + 0.5))
    return out


DOCS = [
    (1, "spark hash spark join"),
    (2, "merge sort window window window"),
    (3, "table scan filter value"),  # no query term -> dropped
    (4, "spark"),
    (5, "hash merge hash merge hash merge spark window"),
]
TERMS = ("spark", "hash", "window", "merge")


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_hits, r.bm25_e4)
        for r in bm25_scores(df, "doc_id", "text", TERMS).collect()
    }
    assert got == _bm25_ref(DOCS, TERMS)
    assert 3 not in got  # zero-hit docs are filtered


def test_bm25_tf_saturation_and_length_norm(spark):
    """Doubling tf must increase the score sub-linearly (k1 saturation),
    and padding a doc with off-topic tokens must decrease it (b norm)."""
    docs = [
        (1, "spark alpha beta"),
        (2, "spark spark alpha"),
        (3, "spark alpha beta gamma delta epsilon zeta eta theta iota"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.bm25_e4 for r in bm25_scores(df, "doc_id", "text", ("spark",)).collect()}
    assert got[2] > got[1], "higher tf must score higher"
    assert got[2] < 2 * got[1], "tf gain must saturate below linear"
    assert got[3] < got[1], "longer doc with same tf must score lower"


def test_bm25_null_text_treated_as_empty(spark):
    """A NULL-text row must behave exactly like '' (one empty token):
    previously Spark's size(split(NULL)) = -1 leaked into avgdl, shifting
    every document's score while DuckDB excluded the row — cross-engine
    divergence from a single junk row."""
    docs_null = DOCS + [(6, None)]
    docs_empty = [(i, t if t is not None else "") for i, t in docs_null]
    df = spark.createDataFrame(docs_null, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_hits, r.bm25_e4)
        for r in bm25_scores(df, "doc_id", "text", TERMS).collect()
    }
    assert got == _bm25_ref(docs_empty, TERMS)
    assert 6 not in got  # the NULL doc itself has zero hits


def test_bm25_validates_terms(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, "doc_id", "text", ())
    with pytest.raises(ValueError, match="distinct"):
        bm25_scores(df, "doc_id", "text", ("a", "a"))
    with pytest.raises(ValueError, match="single token"):
        bm25_scores(df, "doc_id", "text", ("two words",))
