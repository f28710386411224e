"""Property tests: the distributed ``line_dedup`` formulation must agree
with a straightforward sequential Python model on arbitrary inputs, and
must satisfy the operator's algebraic invariants (conservation,
permutation invariance, threshold monotonicity, idempotence)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from foresttime_builder_spark.operators.text import line_dedup

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# Documents = short lists of lines drawn from a tiny alphabet so
# cross-document collisions are common; '' exercises empty fragments.
_LINES = st.sampled_from(["alpha", "beta", "gamma", "delta", ""])
docs_strategy = st.lists(
    st.lists(_LINES, min_size=0, max_size=5),
    min_size=1,
    max_size=10,
)


def _model(docs: list[list[str]], max_doc_freq: int):
    """Sequential model of the pinned semantics."""
    df: dict[str, set[int]] = {}
    for i, lines in enumerate(docs):
        for ln in lines:
            df.setdefault(ln, set()).add(i)
    drop = {ln for ln, ids in df.items() if len(ids) > max_doc_freq}
    out = {}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if ln not in drop]
        out[str(i)] = (
            "\n".join(kept),
            len(kept),
            len(lines) - len(kept),
        )
    return out


def _run(spark, docs, max_doc_freq=1):
    rows = [(str(i), "\n".join(lines)) for i, lines in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id string, text string")
    got = line_dedup(sdf, "doc_id", "text", max_doc_freq=max_doc_freq)
    return {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in got.collect()
    }


@settings(**_SETTINGS)
@given(docs=docs_strategy, thr=st.integers(min_value=1, max_value=3))
def test_matches_sequential_model(spark, docs, thr):
    # NB: "\n".join model round-trips because F.split("", "\n") == [""]
    # and a one-empty-line doc models as [""] — handled by the strategy
    # generating line LISTS, not raw text (an empty list joins to "",
    # which re-splits to [""]; normalize by treating [] as [""]).
    docs = [lines if lines else [""] for lines in docs]
    got = _run(spark, docs, thr)
    want = _model(docs, thr)
    assert got == want


@settings(**_SETTINGS)
@given(docs=docs_strategy)
def test_conservation_and_permutation_invariance(spark, docs):
    docs = [lines if lines else [""] for lines in docs]
    got = _run(spark, docs)
    for i, lines in enumerate(docs):
        _, kept, dropped = got[str(i)]
        assert kept + dropped == len(lines)
    # feeding the rows in reverse order changes nothing
    rev = _run(spark, list(reversed(docs)))
    remap = {str(i): str(len(docs) - 1 - i) for i in range(len(docs))}
    assert {remap[k]: v for k, v in rev.items()} == got


@settings(**_SETTINGS)
@given(docs=docs_strategy)
def test_threshold_monotone_and_idempotent(spark, docs):
    docs = [lines if lines else [""] for lines in docs]
    by_thr = [_run(spark, docs, t) for t in (1, 2, 3)]
    for lo, hi in zip(by_thr, by_thr[1:]):
        for k in lo:
            assert hi[k][1] >= lo[k][1]  # raising threshold keeps more
    # idempotence: re-running on the cleaned corpus drops nothing
    # (kept lines had df <= threshold and every doc row survives).
    # Scope: docs with >= 1 kept line — '' means "no lines" on output
    # but "one empty line" on input, so all-dropped docs don't round-trip
    # through the text representation (the doc row itself is unambiguous;
    # only the empty-text encoding is).
    survivors = [
        int(k) for k, got in by_thr[0].items() if got[1] > 0
    ]
    cleaned = [by_thr[0][str(i)][0].split("\n") for i in sorted(survivors)]
    if not cleaned:
        return
    again = _run(spark, cleaned, 1)
    for new_id, orig in enumerate(sorted(survivors)):
        assert again[str(new_id)][2] == 0
        assert again[str(new_id)][0] == by_thr[0][str(orig)][0]
