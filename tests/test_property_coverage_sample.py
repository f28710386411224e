"""Property-based kmeans coverage/diversity sampling tests (q121/q122).

The r13 invariant tests covered the fixed gate corpus (dense pick_rank,
per-cluster cap, rep-min <= div-max); this suite covers the randomized
contracts the gate cannot see:

1. **Permutation invariance** — the output is a pure function of the
   (id, vector) SET, not of input row order or physical partitioning
   (the quantizer is md5-id-seeded and Lloyd means are 6-dp-rounded;
   components here are small integers so double sums are exact under any
   aggregation order, making the property exact rather than approximate);
2. **Prefix consistency under mass ties** — on a corpus made of exact
   duplicate vectors, the per_cluster=m output is EXACTLY the first m
   rows of each cluster's full (dist_e6, vid)-ordered ranking: ties are
   id-broken deterministically, never dropped or duplicated;
3. **Coverage floor vs uniform sampling** — every non-empty cluster of
   the full ranking contributes min(cluster_size, per_cluster) rows: the
   guarantee a uniform random subset cannot make;
4. **Empty-corpus contract** (r13 advice fix) — a corpus with no valid
   vector returns an EMPTY frame with the contract schema instead of
   raising PySpark's opaque empty-inference error.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from foresttime_builder_spark.operators.ann import kmeans_coverage_sample

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

DIMS = 3

# integer-valued components in a small range: double-exact under any
# summation order (Lloyd means are ratios of exact sums), so permutation
# invariance can be asserted EXACTLY
vec_strategy = st.lists(
    st.integers(min_value=-4, max_value=4).map(float),
    min_size=DIMS,
    max_size=DIMS,
)

corpus_strategy = st.lists(vec_strategy, min_size=2, max_size=24)


def _rows(out):
    return sorted(tuple(r) for r in out.collect())


@given(corpus=corpus_strategy, order=st.sampled_from(["representative", "diverse"]))
@settings(**_SETTINGS)
def test_permutation_invariance(spark, corpus, order):
    rows = [(i, v) for i, v in enumerate(corpus)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    base = _rows(kmeans_coverage_sample(df, per_cluster=2, order=order))
    # reversed row order AND a different physical partitioning
    shuffled = spark.createDataFrame(rows[::-1], df.schema).repartition(5)
    assert _rows(kmeans_coverage_sample(shuffled, per_cluster=2, order=order)) == base


@given(
    n_dups=st.integers(min_value=2, max_value=8),
    seeds=st.lists(vec_strategy, min_size=1, max_size=3),
    order=st.sampled_from(["representative", "diverse"]),
)
@settings(**_SETTINGS)
def test_mass_tie_prefix_consistency(spark, n_dups, seeds, order):
    # every vector duplicated n_dups times: all within-cluster distances
    # tie, so the ranking rides entirely on the vid tie-break
    rows = [
        (i * n_dups + j, v)
        for i, v in enumerate(seeds)
        for j in range(n_dups)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    m = 2
    picked = kmeans_coverage_sample(df, per_cluster=m, order=order).collect()
    full = kmeans_coverage_sample(
        df, per_cluster=len(rows) + 1, order=order
    ).collect()
    by_cid: dict[int, list] = {}
    for r in full:
        by_cid.setdefault(r["cid"], []).append(r)
    want = []
    for members in by_cid.values():
        # replay the operator's own ranking via pick_rank (for
        # order='diverse' the window sorts dist DESC, so re-deriving the
        # direction here would just duplicate the implementation)
        members.sort(key=lambda r: r["pick_rank"])
        want.extend(members[:m])
    assert sorted((r["vec_id"], r["cid"], r["dist_e6"], r["pick_rank"]) for r in picked) == sorted(
        (r["vec_id"], r["cid"], r["dist_e6"], r["pick_rank"]) for r in want
    )
    # tie determinism: within a cluster of identical vectors the kept ids
    # are the SMALLEST ids of that cluster
    for cid, members in by_cid.items():
        dists = {r["dist_e6"] for r in members}
        if len(dists) != 1:
            continue  # cross-seed collision in one cluster: distances differ
        kept = sorted(r["vec_id"] for r in picked if r["cid"] == cid)
        assert kept == sorted(r["vec_id"] for r in members)[: len(kept)]


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
def test_coverage_floor(spark, corpus):
    rows = [(i, v) for i, v in enumerate(corpus)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    m = 2
    picked = kmeans_coverage_sample(df, per_cluster=m).collect()
    full = kmeans_coverage_sample(df, per_cluster=len(rows) + 1).collect()
    size: dict[int, int] = {}
    for r in full:
        size[r["cid"]] = size.get(r["cid"], 0) + 1
    got: dict[int, int] = {}
    for r in picked:
        got[r["cid"]] = got.get(r["cid"], 0) + 1
    # every non-empty cluster contributes exactly min(size, m) rows —
    # the floor a uniform sample cannot guarantee
    assert got == {cid: min(n, m) for cid, n in size.items()}


def test_empty_corpus_contract(spark):
    # all rows invalid under the cosine validity contract (zero-norm and
    # NULL-component vectors) -> empty output, contract schema, no raise
    rows = [(1, [0.0, 0.0, 0.0]), (2, [None, 1.0, 1.0]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = kmeans_coverage_sample(df)
    assert out.columns == ["vec_id", "cid", "dist_e6", "pick_rank"]
    assert out.count() == 0
    # and the filter really was the validity contract: one valid row in an
    # otherwise-degenerate corpus still yields output
    rows2 = rows + [(4, [1.0, 2.0, 3.0])]
    df2 = spark.createDataFrame(rows2, "vec_id int, embedding array<double>")
    assert [r["vec_id"] for r in kmeans_coverage_sample(df2).collect()] == [4]
