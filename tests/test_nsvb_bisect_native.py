"""Differential test: JVM-native bisection (aggregate higher-order fold)
vs the vectorized pandas-UDF bisection.

The native path (``functions/nsvb.find_ht_native_sql``) gives the NSVB
plan a zero-Python option (measured ~25% slower than the Arrow-batched
numpy default at sf10 — see ``find_ht_sql``'s docstring for the numbers
and BASELINE.md for the decision); this test proves both root finders
agree on every regime of the golden tree set — both implement the
identical 48-step interval halving of the same published diameter profile
(reference ``findHT``, ``R/predictCRM2.R:737-751``), so any divergence
beyond last-ulp libm noise (bounded by ``THT / 2^48 ~ 3e-13``) is a bug.

The mode switch is read at plan-build time (``SPARK_GRAFT_NSVB_BISECT``),
so the test builds the plan twice under monkeypatched env.
"""

from __future__ import annotations

import os

import pytest

from foresttime_builder_spark.plans import carbon
from tests.test_nsvb_golden import SCHEMA, TREES


def _estimate(spark, mode: str):
    old = os.environ.get("SPARK_GRAFT_NSVB_BISECT")
    os.environ["SPARK_GRAFT_NSVB_BISECT"] = mode
    try:
        df = spark.createDataFrame([tuple(t) for t in TREES], schema=SCHEMA)
        est = carbon.estimate_carbon(carbon.prep_carbon(df), keep_all=True)
        return {r["tree_ID"]: r.asDict() for r in est.collect()}
    finally:
        if old is None:
            del os.environ["SPARK_GRAFT_NSVB_BISECT"]
        else:
            os.environ["SPARK_GRAFT_NSVB_BISECT"] = old


# every column downstream of the bisection (merch/sawlog heights, section
# volumes, weights, and the final contract values)
COLS = [
    "HT4", "HTSAW", "VMERIB_GROSS", "VMEROB_GROSS", "VSAWIB_GROSS",
    "VMERIB_SOUND", "WMERIB", "BIOMASS", "CARBON",
]


def test_native_bisection_matches_pandas_bisection(spark):
    native = _estimate(spark, "native")
    pandas_ = _estimate(spark, "pandas")
    assert native.keys() == pandas_.keys()
    for tag in native:
        for col in COLS:
            a, b = native[tag][col], pandas_[tag][col]
            if a is None or b is None:
                assert a == b, f"{tag}.{col}: {a} vs {b}"
            else:
                assert a == pytest.approx(b, rel=1e-9, abs=1e-9), f"{tag}.{col}"


def test_native_plan_has_no_python(spark):
    """The point of the native path: under SPARK_GRAFT_NSVB_BISECT=native
    the NSVB physical plan must contain no ArrowEvalPython /
    BatchEvalPython node (the default pandas mode keeps exactly one — the
    measured-faster Arrow-batched bisection)."""
    old = os.environ.get("SPARK_GRAFT_NSVB_BISECT")
    os.environ["SPARK_GRAFT_NSVB_BISECT"] = "native"
    try:
        df = spark.createDataFrame([tuple(t) for t in TREES], schema=SCHEMA)
        est = carbon.estimate_carbon(carbon.prep_carbon(df))
        plan = est._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, "Python UDF in the native-mode plan"
    finally:
        if old is None:
            del os.environ["SPARK_GRAFT_NSVB_BISECT"]
        else:
            os.environ["SPARK_GRAFT_NSVB_BISECT"] = old
