"""Connected components (min-label propagation)."""

from __future__ import annotations

from foresttime_builder_spark.operators.graph import connected_components


def test_components_basic(spark):
    # two components: {1,2,3,4} (path) and {10,11}; 4 reaches 1 via 3 hops
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src INT, dst INT"
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_converges_on_cycle(spark):
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5)], "src INT, dst INT"
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {5: 5, 6: 5, 7: 5}
