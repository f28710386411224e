"""Snapshot diff (CDC) classification contract."""

from __future__ import annotations

from foresttime_builder_spark.operators.diff import snapshot_diff


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 21), (4, "D", 40), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {
        r.k: r.change
        for r in snapshot_diff(old, new, keys=["k"], compare_cols=["s", "v"]).collect()
    }
    # 1 unchanged -> not emitted; 2 value update; 3 deleted; 4 string
    # update; 5 inserted
    assert got == {2: "update", 3: "delete", 4: "update", 5: "insert"}


def test_snapshot_diff_composite_keys_and_nulls(spark):
    old = spark.createDataFrame(
        [(1, "x", None), (1, "y", 5)], "k long, kk string, v long"
    )
    new = spark.createDataFrame(
        [(1, "x", None), (1, "y", None)], "k long, kk string, v long"
    )
    got = {
        (r.k, r.kk): r.change
        for r in snapshot_diff(
            old, new, keys=["k", "kk"], compare_cols=["v"]
        ).collect()
    }
    # (1,x) unchanged (null==null under the hash rendering); (1,y) 5->null
    assert got == {(1, "y"): "update"}


def test_snapshot_diff_hash_unambiguous(spark):
    """The per-column fixed-width token hash distinguishes the three
    ambiguity classes the old concat_ws('|') hash collapsed: NULL vs empty
    string, cross-column NULL swaps ((NULL,'x') vs ('x',NULL)), and
    delimiter injection (('a|b','c') vs ('a','b|c'))."""
    schema = "k long, a string, b string"
    old = spark.createDataFrame(
        [(1, None, "x"), (2, "a|b", "c"), (3, None, None)], schema
    )
    new = spark.createDataFrame(
        [(1, "x", None), (2, "a", "b|c"), (3, "", "")], schema
    )
    got = {
        r.k: r.change
        for r in snapshot_diff(
            old, new, keys=["k"], compare_cols=["a", "b"]
        ).collect()
    }
    assert got == {1: "update", 2: "update", 3: "update"}


def test_snapshot_diff_oracle_parity_with_nulls(spark):
    """Spark and the DuckDB twin classify identically on a fixture that
    exercises NULLs, empty strings, and delimiter characters."""
    import duckdb

    from foresttime_builder_spark.operators.diff import snapshot_diff_oracle_sql

    old_rows = [
        (1, "a|b", "c"),
        (2, None, "x"),
        (3, "", ""),
        (4, "same", "same"),
        (5, "gone", None),
    ]
    new_rows = [
        (1, "a", "b|c"),
        (2, "x", None),
        (3, None, None),
        (4, "same", "same"),
        (6, "fresh", ""),
    ]
    schema = "k long, a string, b string"
    got = {
        r.k: r.change
        for r in snapshot_diff(
            spark.createDataFrame(old_rows, schema),
            spark.createDataFrame(new_rows, schema),
            keys=["k"],
            compare_cols=["a", "b"],
        ).collect()
    }

    def values_sql(rows):
        def lit(v):
            if v is None:
                return "NULL"
            if isinstance(v, int):
                return str(v)
            return "'" + v.replace("'", "''") + "'"

        vals = ", ".join(
            "(" + ", ".join(lit(v) for v in r) + ")" for r in rows
        )
        return f"SELECT * FROM (VALUES {vals}) AS t(k, a, b)"

    sql = snapshot_diff_oracle_sql(
        values_sql(old_rows), values_sql(new_rows),
        keys=["k"], compare_cols=["a", "b"],
    )
    want = {k: c for k, c in duckdb.sql(sql).fetchall()}
    assert got == want == {
        1: "update", 2: "update", 3: "update", 5: "delete", 6: "insert"
    }


def test_snapshot_diff_property_reconstruction(spark):
    """Property (the CDC contract): applying the emitted change set to the
    old snapshot's KEY SET reproduces the new snapshot's key set, and the
    per-key classification matches a brute-force dict comparison — on
    pseudo-random snapshots with inserts, deletes, updates, and unchanged
    rows."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    pair = st.tuples(
        st.integers(min_value=0, max_value=30),  # key
        st.integers(min_value=0, max_value=3),  # payload variant
    )
    snaps = st.tuples(
        st.lists(pair, max_size=25, unique_by=lambda p: p[0]),
        st.lists(pair, max_size=25, unique_by=lambda p: p[0]),
    )

    @given(snaps)
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def run(sn):
        old_rows, new_rows = sn
        schema = "k long, v long"
        old = spark.createDataFrame(old_rows or [(999_999, 0)], schema)
        new = spark.createDataFrame(new_rows or [(999_998, 0)], schema)
        got = {
            r.k: r.change
            for r in snapshot_diff(
                old, new, keys=["k"], compare_cols=["v"]
            ).collect()
        }
        o = dict(old_rows or [(999_999, 0)])
        n = dict(new_rows or [(999_998, 0)])
        want = {}
        for k in o.keys() | n.keys():
            if k not in n:
                want[k] = "delete"
            elif k not in o:
                want[k] = "insert"
            elif o[k] != n[k]:
                want[k] = "update"
        assert got == want
        # reconstruction: old keys + inserts - deletes == new keys
        rebuilt = (set(o) | {k for k, c in got.items() if c == "insert"}) - {
            k for k, c in got.items() if c == "delete"
        }
        assert rebuilt == set(n)

    run()
