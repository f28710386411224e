"""Property-based incremental-dedup test: verdicts must match a
brute-force reference (exact hashes + exact Jaccard near check) on
arbitrary small corpora.

The reference model intentionally computes near_hist WITHOUT the LSH
candidate stage (all-pairs exact Jaccard), so the assertion is one-sided
where LSH recall applies: every near_hist the operator emits must be a
TRUE near-dup (no false positives), and exact verdicts must match
exactly.  With 16 hashes / band 4 on tiny vocabularies recall is high,
but the property does not depend on it.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from foresttime_builder_spark.operators.dedup import incremental_dedup

WORDS = ["a", "b", "c", "d", "e"]

doc_strategy = st.lists(
    st.sampled_from(WORDS), min_size=1, max_size=6
).map(lambda ws: " ".join(ws))

corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=6)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _jac(a: str, b: str) -> float:
    sa, sb = set(a.split(" ")), set(b.split(" "))
    return len(sa & sb) / len(sa | sb)


@given(hist=corpus_strategy, batch=corpus_strategy)
@settings(**_SETTINGS)
def test_verdicts_sound(spark, hist, batch):
    h_rows = [(i, t) for i, t in enumerate(hist)]
    b_rows = [(100 + i, t) for i, t in enumerate(batch)]
    h = spark.createDataFrame(h_rows, "doc_id int, text string")
    b = spark.createDataFrame(b_rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in incremental_dedup(h, b, "doc_id", "text", threshold=0.5).collect()
    }
    assert set(out) == {i for i, _ in b_rows}
    texts_h = dict(h_rows)
    texts_b = dict(b_rows)
    first_by_text: dict = {}
    for i, t in b_rows:
        first_by_text.setdefault(t, i)
    for bid, (verdict, mid) in out.items():
        t = texts_b[bid]
        exact_hist = [i for i, ht in h_rows if ht == t]
        if exact_hist:
            assert verdict == "exact_hist" and mid == min(exact_hist)
            continue
        if first_by_text[t] != bid:
            assert verdict == "exact_batch" and mid == first_by_text[t]
            continue
        if verdict == "near_hist":
            # soundness: the reported match must truly clear the bar
            assert _jac(t, texts_h[mid]) >= 0.5
            # and it must be the smallest qualifying history id the
            # operator could have verified
            qualifying = [i for i, ht in h_rows if _jac(t, ht) >= 0.5]
            assert mid in qualifying
        else:
            assert verdict == "kept" and mid is None
