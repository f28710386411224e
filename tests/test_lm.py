"""Statistical-LM scoring contract: reference model parity, ranking
sanity, and validation."""

from __future__ import annotations

import math

import pytest

from foresttime_builder_spark.operators.lm import ngram_lm_score

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the mat again"),
    (3, "mat the on sat cat the"),  # same tokens, scrambled order
    (4, "solo"),                    # single token -> no bigrams, dropped
]


def _ref(docs, add_k=0.1):
    toks = {i: t.split(" ") for i, t in docs}
    bigrams = {
        i: list(zip(v, v[1:])) for i, v in toks.items() if len(v) >= 2
    }
    c2: dict = {}
    c1: dict = {}
    for bs in bigrams.values():
        for w1, w2 in bs:
            c2[(w1, w2)] = c2.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
    vocab = len({w for v in toks.values() for w in v})
    out = {}
    for i, bs in bigrams.items():
        if not bs:
            continue
        s = 0
        for w1, w2 in bs:
            p = (c2[(w1, w2)] + add_k) / (c1[w1] + add_k * vocab)
            s += math.floor(math.log(p) * 1_000_000)
        out[i] = (len(bs), s)
    return out


def test_lm_score_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.sum_logprob_e6)
        for r in ngram_lm_score(df, "doc_id", "text").collect()
    }
    assert got == _ref(DOCS)
    assert 4 not in got  # no-bigram docs are dropped


def test_lm_score_ranks_scrambled_text_lower(spark):
    """Doc 3 reuses doc 1's tokens in an order the corpus never repeats:
    its average bigram log-prob must be lower than doc 1's."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.sum_logprob_e6 / r.n_bigrams
        for r in ngram_lm_score(df, "doc_id", "text").collect()
    }
    assert got[3] < got[1]


def test_lm_score_validates_k(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="positive"):
        ngram_lm_score(df, "doc_id", "text", add_k=0.0)
