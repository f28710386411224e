"""The plan audit must flag real BNLJ regressions, not just expected noise.

Round-5 verdict: the audit reported its own whitelisted tiny-broadcast
BNLJs (q46 1-row agg and friends) as warnings, so a genuine nested-loop
regression could hide in an always-noisy report.  The whitelist is now a
per-query cap — these tests pin that a deliberately-introduced BNLJ (a)
is counted by the plan scraper and (b) flags for unlisted queries and for
counts above a listed query's cap, while the documented deliberate cases
stay quiet.
"""

from __future__ import annotations

from tools.explain_audit import EXPECTED_BNLJ, audit, flags_for


def test_audit_counts_deliberate_bnlj(spark):
    a = spark.range(50).withColumnRenamed("id", "x")
    b = spark.range(40).withColumnRenamed("id", "y")
    # non-equi theta join with a broadcastable side -> BroadcastNestedLoopJoin
    df = a.join(b, a.x < b.y)
    c = audit("synthetic", df)
    assert c["bnlj"] >= 1


def test_unlisted_query_with_bnlj_flags():
    assert any(
        f.startswith("BNLJ") for f in flags_for("q01_pricing_summary", {"bnlj": 1})
    )


def test_listed_query_within_cap_is_quiet():
    cap, _ = EXPECTED_BNLJ["q46_kmv_sketch"]
    assert flags_for("q46_kmv_sketch", {"bnlj": cap}) == []


def test_listed_query_above_cap_flags():
    cap, _ = EXPECTED_BNLJ["q46_kmv_sketch"]
    assert any(
        f.startswith("BNLJ") for f in flags_for("q46_kmv_sketch", {"bnlj": cap + 1})
    )


def test_cartesian_always_flags():
    assert "CARTESIAN" in flags_for("q42_ann_ivf", {"cartesian": 1})
    # round 7 removed q42's centroid crossJoins: any BNLJ there now flags
    assert any(
        f.startswith("BNLJ") for f in flags_for("q42_ann_ivf", {"bnlj": 1})
    )


def test_end_to_end_flag_on_injected_bnlj(spark):
    """A synthetic regression — an unexpected theta join in a query plan —
    must produce a non-empty flag list through the same audit+flags path
    main() uses."""
    a = spark.range(30).withColumnRenamed("id", "x")
    b = spark.range(20).withColumnRenamed("id", "y")
    df = a.join(b, a.x < b.y)
    c = audit("q03_customer_order_counts", df)
    assert flags_for("q03_customer_order_counts", c)
