"""Property-based lsh_representatives test: the cluster-assignment
invariants must hold on arbitrary small corpora.

The operator is recall-bounded (LSH banding), so the properties are
one-sided where recall applies, exactly like the incremental-dedup
property suite:

1. exactly one output row per non-NULL-id input document;
2. ``rep_id`` is the MINIMUM doc id of its own cluster (canonical
   representative, the ``connected_components`` contract);
3. no false merges: every non-singleton member must have at least one
   OTHER cluster member with true token Jaccard >= threshold (each doc
   entered the component through an exactly-verified edge, so a member
   with no qualifying partner would prove an unverified merge);
4. ``cluster_size`` is the exact member count of its ``rep_id`` group;
5. identical-text documents ALWAYS share a cluster (they collide in
   every band and verify at jaccard 1.0 — the recall floor that does
   not depend on banding luck).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from foresttime_builder_spark.operators.dedup import lsh_representatives

WORDS = ["a", "b", "c", "d", "e"]

doc_strategy = st.lists(
    st.sampled_from(WORDS), min_size=1, max_size=6
).map(lambda ws: " ".join(ws))

corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=7)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

THRESHOLD = 0.5


def _jac(a: str, b: str) -> float:
    sa, sb = set(a.split(" ")), set(b.split(" "))
    return len(sa & sb) / len(sa | sb)


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
def test_representative_invariants(spark, corpus):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = lsh_representatives(
        df, "doc_id", "text", threshold=THRESHOLD
    ).collect()

    # 1. one row per doc
    assert sorted(r["doc_id"] for r in out) == sorted(i for i, _ in rows)

    clusters: dict[int, list[int]] = {}
    for r in out:
        clusters.setdefault(r["rep_id"], []).append(r["doc_id"])

    text = dict(rows)
    for rep, members in clusters.items():
        # 2. canonical representative = cluster minimum
        assert rep == min(members)
        for r in out:
            if r["rep_id"] == rep:
                # 4. exact member count
                assert r["cluster_size"] == len(members)
        # 3. no false merges: every member of a non-singleton cluster
        # has a >= threshold partner inside the cluster (the 4-dp round
        # the operator applies can only round a true 0.49995+ UP, so
        # compare against the rounded value like the engine does)
        if len(members) > 1:
            for m in members:
                best = max(
                    _jac(text[m], text[o]) for o in members if o != m
                )
                assert round(best, 4) >= THRESHOLD, (
                    f"doc {m} merged into {rep} with best in-cluster "
                    f"jaccard {best}"
                )

    # 5. identical texts always co-cluster
    rep_of = {r["doc_id"]: r["rep_id"] for r in out}
    by_text: dict[str, list[int]] = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    for ids in by_text.values():
        assert len({rep_of[i] for i in ids}) == 1
