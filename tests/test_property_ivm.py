"""Property-based IVM test: the delta-merge path must equal a full
recompute for ARBITRARY pairs of snapshots — inserts, deletes, value
updates, group moves, and unchanged rows in any mix."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from foresttime_builder_spark.operators.ivm import incremental_group_sum

# a snapshot: key -> (group, value); keys 0..9, 3 groups, small ints
snapshot_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=9),
    values=st.tuples(
        st.sampled_from(["g1", "g2", "g3"]),
        st.integers(min_value=-100, max_value=100),
    ),
    max_size=10,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _rows(snap):
    return [(k, g, v) for k, (g, v) in sorted(snap.items())]


def _full(snap):
    agg: dict = {}
    for _, (g, v) in snap.items():
        t, n = agg.get(g, (0, 0))
        agg[g] = (t + v, n + 1)
    return agg


@given(old=snapshot_strategy, new=snapshot_strategy)
@settings(**_SETTINGS)
def test_delta_merge_equals_full_recompute(spark, old, new):
    schema = "k int, g string, v int"
    odf = spark.createDataFrame(_rows(old), schema)
    ndf = spark.createDataFrame(_rows(new), schema)
    got = {
        r["g"]: (r["total"], r["n_rows"])
        for r in incremental_group_sum(odf, ndf, ["k"], "g", "v").collect()
    }
    assert got == _full(new)
