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


# ---- r15 production knobs: normalize= and dup_frac_e6 ----------------

_NOISY_LINES = st.sampled_from(
    ["alpha", "Alpha", "ALPHA ", " al\tpha", "beta", "be  ta", "", " ", "\t"]
)
noisy_docs_strategy = st.lists(
    st.lists(_NOISY_LINES, min_size=0, max_size=5),
    min_size=1,
    max_size=8,
)


def _norm_key(s: str) -> str:
    """Python twin of operators.text._line_key(normalize=True)."""
    import re

    return re.sub(r"[ \t\r]+", " ", s).strip().lower()


def _model_norm(docs: list[list[str]], max_doc_freq: int):
    df: dict[str, set[int]] = {}
    for i, lines in enumerate(docs):
        for ln in lines:
            df.setdefault(_norm_key(ln), set()).add(i)
    drop = {k for k, ids in df.items() if len(ids) > max_doc_freq}
    out = {}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if _norm_key(ln) not in drop]
        out[str(i)] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


def _run_norm(spark, docs, max_doc_freq=1):
    rows = [(str(i), "\n".join(lines)) for i, lines in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id string, text string")
    got = line_dedup(
        sdf, "doc_id", "text", max_doc_freq=max_doc_freq, normalize=True
    )
    return {
        r["doc_id"]: (
            r["clean_text"], r["n_kept"], r["n_dropped"], r["dup_frac_e6"]
        )
        for r in got.collect()
    }


@settings(**_SETTINGS)
@given(docs=noisy_docs_strategy, thr=st.integers(min_value=1, max_value=2))
def test_normalized_matches_sequential_model(spark, docs, thr):
    # normalized matching must collapse case/whitespace variants across
    # docs while clean_text preserves each surviving line VERBATIM —
    # asserted end-to-end against the Python model
    docs = [lines if lines else [""] for lines in docs]
    got = _run_norm(spark, docs, thr)
    want = _model_norm(docs, thr)
    assert {k: v[:3] for k, v in got.items()} == want


@settings(**_SETTINGS)
@given(docs=noisy_docs_strategy)
def test_dup_frac_conservation(spark, docs):
    # dup_frac_e6 == round(n_dropped/total * 1e6), always within [0, 1e6],
    # and consistent with the count columns it is derived from
    docs = [lines if lines else [""] for lines in docs]
    for _, kept, dropped, frac in _run_norm(spark, docs).values():
        total = kept + dropped
        assert total > 0  # every doc has >= 1 line (empty text -> [''])
        assert frac == int(dropped * 1_000_000 / total + 0.5)
        assert 0 <= frac <= 1_000_000


@settings(max_examples=30, deadline=None)
@given(
    s=st.text(
        alphabet=st.sampled_from(list("aB \t\r.z")), min_size=0, max_size=12
    )
)
def test_normalize_key_idempotent(s):
    # the key function is a fixpoint after one application — the
    # contract that makes re-running line_dedup over its own normalized
    # matching a no-op (collapsed text has no runs; trim/lower stable)
    assert _norm_key(_norm_key(s)) == _norm_key(s)


def test_null_text_yields_null_frac(spark):
    sdf = spark.createDataFrame(
        [("a", None), ("b", "x\nx"), ("c", "x\ny")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_kept"], r["n_dropped"], r["dup_frac_e6"])
        for r in line_dedup(sdf, "doc_id", "text").collect()
    }
    assert got["a"] == (0, 0, None)  # 0/0 pinned to NULL, never NaN
    # 'x' appears in docs b and c -> dropped everywhere; b's second 'x'
    # is within-doc so df still counts b once
    assert got["b"] == (0, 2, 1_000_000)
    assert got["c"] == (1, 1, 500_000)
