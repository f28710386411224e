"""SCD2 build contract: run collapse, null-safe change detection,
interval chaining, and validation."""

from __future__ import annotations

import pytest

from foresttime_builder_spark.operators.scd import scd2_build

ROWS = [
    # key, ts, seq, status, tier
    ("u1", 1, 1, "free", None),
    ("u1", 2, 2, "free", None),      # repeat -> collapses
    ("u1", 3, 3, "paid", None),      # status change
    ("u1", 4, 4, "paid", "gold"),    # NULL -> value is a change
    ("u1", 5, 5, "paid", "gold"),    # repeat -> collapses
    ("u2", 1, 6, None, None),        # all-NULL first version
    ("u2", 2, 7, None, None),        # repeat of NULLs -> collapses
    ("u2", 3, 8, "free", None),
]


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame(
        ROWS, ["user_id", "ts", "seq", "status", "tier"]
    )
    rows = scd2_build(
        df, "user_id", "ts", ["status", "tier"], "seq"
    ).collect()
    return sorted(
        (
            (r["user_id"], r["status"], r["tier"], r["effective_from"],
             r["effective_to"], r["is_current"])
            for r in rows
        ),
        key=lambda t: (t[0], t[3]),
    )


def test_versions(built):
    assert built == [
        ("u1", "free", None, 1, 3, False),
        ("u1", "paid", None, 3, 4, False),
        ("u1", "paid", "gold", 4, None, True),
        ("u2", None, None, 1, 3, False),
        ("u2", "free", None, 3, None, True),
    ]


def test_single_current_version_per_key(built):
    per_key = {}
    for k, *_, cur in built:
        per_key[k] = per_key.get(k, 0) + (1 if cur else 0)
    assert all(v == 1 for v in per_key.values())


def test_intervals_chain_without_gaps(built):
    by_key: dict = {}
    for k, _s, _t, f, to, _c in built:
        by_key.setdefault(k, []).append((f, to))
    for spans in by_key.values():
        for (f1, to1), (f2, _to2) in zip(spans, spans[1:]):
            assert to1 == f2


def test_validation():
    with pytest.raises(ValueError, match="non-empty"):
        scd2_build(None, "k", "ts", [], "tb")
    with pytest.raises(ValueError, match="distinct"):
        scd2_build(None, "k", "ts", ["a", "a"], "tb")


def test_equal_timestamp_versions_chain_by_tiebreak(spark):
    # review regression: two kept versions sharing a timestamp must get
    # deterministic intervals ordered by the tiebreak
    df = spark.createDataFrame(
        [("u1", 5, 1, "A"), ("u1", 5, 2, "B"), ("u1", 9, 3, "C")],
        ["user_id", "ts", "seq", "status"],
    )
    rows = sorted(
        (
            (r["status"], r["effective_from"], r["effective_to"], r["is_current"])
            for r in scd2_build(df, "user_id", "ts", ["status"], "seq").collect()
        ),
    )
    assert rows == [
        ("A", 5, 5, False),   # zero-length interval, closed by B at the same ts
        ("B", 5, 9, False),
        ("C", 9, None, True),
    ]


def test_scd2_matches_brute_reference_on_random_streams(spark):
    """Property-style check against a sequential Python model."""
    import random

    rng = random.Random(7)
    rows = []
    seq = 0
    for key in ("a", "b", "c"):
        for ts in range(1, 11):
            if rng.random() < 0.3:
                continue
            seq += 1
            rows.append((key, ts, seq, rng.choice(["x", "y", None])))
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "attr"])
    keyf = lambda t: (t[0], t[2], t[1] or "", t[3] or -1)
    got = sorted(
        (
            (r["k"], r["attr"], r["effective_from"], r["effective_to"])
            for r in scd2_build(df, "k", "ts", ["attr"], "seq").collect()
        ),
        key=keyf,
    )

    # sequential model
    ref = []
    by_key: dict = {}
    for k, ts, seq_, attr in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_key.setdefault(k, []).append((ts, attr))
    for k, stream in by_key.items():
        versions = []
        prev = object()
        for ts, attr in stream:
            if attr != prev:
                versions.append([ts, attr, None])
                prev = attr
        for v, nxt in zip(versions, versions[1:]):
            v[2] = nxt[0]
        ref.extend((k, attr, f, to) for f, attr, to in versions)
    assert got == sorted(ref, key=keyf)
