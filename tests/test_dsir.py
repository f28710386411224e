"""DSIR importance-weight contract: reference-model parity, ranking
direction, and validation."""

from __future__ import annotations

import hashlib
import math

import pytest

from foresttime_builder_spark.operators.dsir import dsir_logweights

DOCS = [
    # target domain: feline prose
    (1, "the cat sat on the mat", True),
    (2, "the cat ate the cream", True),
    # raw-only: telemetry noise
    (3, "errno 11 retry backoff jitter", False),
    (4, "the cat sat on the mat", False),  # target-like but unlabeled
    (5, "solo", False),
]
N_BUCKETS = 64
ADD_K = 0.5


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref(docs, n_buckets=N_BUCKETS, add_k=ADD_K):
    feats: dict[int, list[int]] = {}
    for i, text, _ in docs:
        ts = text.split(" ")
        bs = [_h60("u|" + w) % n_buckets for w in ts]
        bs += [
            _h60("b|" + a + " " + b) % n_buckets for a, b in zip(ts, ts[1:])
        ]
        feats[i] = bs
    cnt_r: dict[int, int] = {}
    cnt_t: dict[int, int] = {}
    for i, _, tgt in docs:
        for b in feats[i]:
            cnt_r[b] = cnt_r.get(b, 0) + 1
            if tgt:
                cnt_t[b] = cnt_t.get(b, 0) + 1
    R = sum(cnt_r.values())
    T = sum(cnt_t.values())
    kb = add_k * n_buckets
    out = {}
    for i, _, _ in docs:
        w = 0
        for b in feats[i]:
            lp = math.log((cnt_t.get(b, 0) + add_k) / (T + kb))
            lq = math.log((cnt_r[b] + add_k) / (R + kb))
            w += math.floor((lp - lq) * 1_000_000)
        out[i] = (len(feats[i]), w)
    return out


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "is_target"])
    rows = dsir_logweights(
        df, "doc_id", "text", "is_target", n_buckets=N_BUCKETS, add_k=ADD_K
    ).collect()
    return {r["doc_id"]: (r["n_features"], r["logweight_e6"]) for r in rows}


def test_matches_reference_model(scored):
    assert scored == _ref(DOCS)


def test_target_like_doc_outranks_off_domain(scored):
    # doc 4 is a verbatim copy of target doc 1; doc 3 shares no feature
    # with the target model, so its weight must be strictly lower
    assert scored[4][1] > scored[3][1]
    assert scored[1][1] > scored[3][1]


def test_every_row_scored_even_single_token(scored):
    assert set(scored) == {1, 2, 3, 4, 5}
    assert scored[5][0] == 1  # one unigram, no bigram


def test_validation():
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logweights(None, "i", "t", "g", n_buckets=1)
    with pytest.raises(ValueError, match="add_k"):
        dsir_logweights(None, "i", "t", "g", add_k=0.0)
    with pytest.raises(ValueError, match="broadcastable"):
        dsir_logweights(None, "i", "t", "g", n_buckets=5_000_001)


def test_null_text_scored_as_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "real text here", True), (2, None, False)],
        ["doc_id", "text", "is_target"],
    )
    out = {
        r["doc_id"]: r["n_features"]
        for r in dsir_logweights(
            df, "doc_id", "text", "is_target", n_buckets=N_BUCKETS
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[2] == 1  # the empty-string unigram
