"""Inverted-index contract: reference-model parity, deterministic
tie-breaks, stopword elision, and validation."""

from __future__ import annotations

import pytest

from foresttime_builder_spark.operators.invindex import inverted_index

DOCS = [
    (1, "a a b c"),
    (2, "a b b"),
    (3, "a c c c"),
    (4, "d"),
]


def _ref(docs, k, max_doc_freq=None):
    tf: dict = {}
    for i, t in docs:
        for w in t.split(" "):
            tf[(w, i)] = tf.get((w, i), 0) + 1
    terms: dict = {}
    for (w, i), c in tf.items():
        terms.setdefault(w, []).append((i, c))
    out = {}
    for w, posts in terms.items():
        if max_doc_freq is not None and len(posts) > max_doc_freq:
            continue
        posts.sort(key=lambda p: (-p[1], p[0]))
        out[w] = (
            len(posts),
            sum(c for _, c in posts),
            ",".join(f"{i}:{c}" for i, c in posts[:k]),
        )
    return out


def _run(spark, k, max_doc_freq=None):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = inverted_index(df, "doc_id", "text", k=k, max_doc_freq=max_doc_freq)
    return {
        r["term"]: (r["doc_freq"], r["coll_freq"], r["postings"])
        for r in rows.collect()
    }


def test_matches_reference_model(spark):
    assert _run(spark, k=2) == _ref(DOCS, k=2)


def test_tf_then_docid_tiebreak(spark):
    # 'a': doc1 tf=2 leads; docs 2,3 tie at tf=1 -> ascending doc id
    out = _run(spark, k=3)
    assert out["a"] == (3, 4, "1:2,2:1,3:1")
    assert out["c"] == (2, 4, "3:3,1:1")


def test_stopword_elision(spark):
    out = _run(spark, k=3, max_doc_freq=2)
    assert "a" not in out  # df=3 > 2
    assert out["d"] == (1, 1, "4:1")
    assert _ref(DOCS, 3, 2) == out


def test_validation():
    with pytest.raises(ValueError, match="k must"):
        inverted_index(None, "i", "t", k=0)
    with pytest.raises(ValueError, match="max_doc_freq"):
        inverted_index(None, "i", "t", max_doc_freq=0)


def test_matches_reference_on_random_corpora(spark):
    import random

    rng = random.Random(13)
    words = ["w%d" % i for i in range(8)]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 12))))
        for i in range(25)
    ]
    for k, mdf in ((1, None), (3, 10), (5, 2)):
        got = _run_docs(spark, docs, k=k, max_doc_freq=mdf)
        assert got == _ref(docs, k, mdf)


def _run_docs(spark, docs, k, max_doc_freq=None):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = inverted_index(df, "doc_id", "text", k=k, max_doc_freq=max_doc_freq)
    return {
        r["term"]: (r["doc_freq"], r["coll_freq"], r["postings"])
        for r in rows.collect()
    }
