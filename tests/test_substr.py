"""Unit tests for exact-substring duplication coverage (substr.py)."""

from __future__ import annotations

from foresttime_builder_spark.operators.substr import duplicated_span_coverage


def _words(*idxs):
    return " ".join(f"w{i}" for i in idxs)


def test_shared_run_is_detected_and_interval_merged(spark):
    # docs 1 and 2 share the verbatim 6-token run w10..w15; with n=4 that
    # run yields 3 overlapping windows whose union covers 6 tokens
    shared = _words(10, 11, 12, 13, 14, 15)
    rows = [
        (1, _words(1, 2) + " " + shared + " " + _words(3, 4)),
        (2, _words(5, 6, 7) + " " + shared),
        (3, _words(20, 21, 22, 23, 24, 25, 26, 27)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_coverage(df, "doc_id", "text", n=4).collect()
    }
    assert out[1]["n_dup_windows"] == 3
    assert out[1]["dup_token_cov"] == 6
    assert out[1]["n_tokens"] == 10
    assert out[1]["dup_cov_frac_e4"] == 6000
    assert out[2]["n_dup_windows"] == 3
    assert out[2]["dup_token_cov"] == 6
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["dup_token_cov"] == 0
    assert out[3]["dup_cov_frac_e4"] == 0


def test_disjoint_shared_runs_not_merged(spark):
    # two disjoint shared runs of 4 tokens each, separated by unique tokens:
    # coverage is 8, not a merged span
    a, b = _words(10, 11, 12, 13), _words(30, 31, 32, 33)
    rows = [
        (1, a + " " + _words(1, 2, 3) + " " + b),
        (2, a + " " + _words(5, 6, 7) + " " + b),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_coverage(df, "doc_id", "text", n=4).collect()
    }
    assert out[1]["dup_token_cov"] == 8
    assert out[1]["n_dup_windows"] == 2


def test_within_doc_repeat_does_not_count(spark):
    # the run repeats inside doc 1 only; min_docs=2 requires 2 distinct docs
    run = _words(10, 11, 12, 13)
    rows = [
        (1, run + " " + _words(1, 2) + " " + run),
        (2, _words(20, 21, 22, 23, 24)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_coverage(df, "doc_id", "text", n=4).collect()
    }
    assert out[1]["n_dup_windows"] == 0


def test_short_docs_survive(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    out = duplicated_span_coverage(df, "doc_id", "text", n=4).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert all(r["n_dup_windows"] == 0 for r in out)
