"""Physical-plan audit over the query registry.

For every registered query, prints the plan-quality signals that matter at
100 TB and flags regressions:

- `scan`: columns actually read (ReadSchema) and filters pushed to the scan
  (PushedFilters) — a scan reading all columns for a narrow projection is a
  column-pruning failure;
- `joins`: BroadcastHashJoin vs SortMergeJoin vs BroadcastNestedLoopJoin —
  dimension joins must broadcast; BNLJ is only acceptable for the
  deliberately-theta band/range joins;
- `exchanges`: shuffle count — window chains over the same key must share
  one exchange;
- `codegen`: WholeStageCodegen span count vs total operators.

Usage: python tools/explain_audit.py [--only q01,q25] [--sf DIR] [-v]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = {
    # streaming queries materialize via a sink, not a batch plan
    "q29_stream_rollup",
    "q30_stream_sessions",
    "q31_stream_stateful",
}

#: Deliberate nested-loop joins, audited rather than ignored:
#: query -> (max allowed BNLJ count, reason).  Counts ABOVE the cap still
#: flag, so a real BNLJ regression in these queries cannot hide behind the
#: expected noise, and any BNLJ in an unlisted query always flags.
EXPECTED_BNLJ = {
    "q05_range_band_join": (1, "theta band join, tiny broadcast rule dim"),
    "q16_jaccard_pairs": (1, "bitmask-strategy distinct-set comparison"),
    "q17_cosine_topk": (1, "brute-force ANN baseline, probe side capped"),
    "q46_kmv_sketch": (1, "1-row-aggregate crossJoin attaching the sketch bound"),
    "q74_temperature_mix": (1, "1-row weight-total crossJoin in temperature_quotas"),
    "q82_bm25_scores": (1, "1-row corpus-stats (N/avgdl/df) crossJoin in bm25_scores"),
    "q86_lm_score": (1, "1-row vocabulary-size crossJoin in ngram_lm_score"),
    "q88_dsir_weights": (1, "1-row model-totals (R/T) crossJoin in dsir_logweights"),
    "q94_tfidf_signatures": (1, "1-row group-count crossJoin in tfidf_signature_terms"),
    "q98_numeric_histogram": (1, "1-row min/max stats crossJoin in numeric_histogram"),
    "q108_stream_outer_join": (1, "1-row watermark-cutoff crossJoin on the materialized sink"),
    "q114_distribution_drift": (1, "1-row totals (n1/n2/B) crossJoin in the PSI terms"),
}


def audit(name: str, df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    formatted = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    counts = {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        # WholeStageCodegen spans only appear in the FINAL adaptive plan
        # (post-execution) under AQE; codegen is enabled session-wide
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
    counts["pushed_filters"] = sum(1 for p in pushed if p.strip())
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", formatted)
    counts["scan_cols"] = [len(s.split(",")) if s else 0 for s in schemas]
    return counts


def flags_for(name: str, c: dict) -> list[str]:
    """Plan-quality flags for one query's audit counts (unit-testable)."""
    flags = []
    if c.get("cartesian"):
        flags.append("CARTESIAN")
    allowed, _reason = EXPECTED_BNLJ.get(name, (0, ""))
    if c.get("bnlj", 0) > allowed:
        flags.append(f"BNLJ={c['bnlj']}>{allowed}")
    if c.get("smj") and name.startswith(("q25", "q26", "q28")):
        # pipeline dim joins must all broadcast (q27's tree⋈area totals
        # SMJ is a co-keyed fact join that AQE broadcasts at runtime)
        flags.append(f"SMJ={c['smj']}")
    return flags


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    from foresttime_builder_spark.plans.benchmark_queries import QUERIES
    from foresttime_builder_spark.session import get_spark

    spark = get_spark(app_name="explain_audit", master="local[4]")
    names = sorted(QUERIES)
    if args.only:
        keep = args.only.split(",")
        names = [n for n in names if any(n.startswith(p) for p in keep)]

    warnings = 0
    for name in names:
        if name in SKIP:
            continue
        df = QUERIES[name].fn(spark, args.sf)
        c = audit(name, df)
        flags = flags_for(name, c)
        warnings += bool(flags)
        print(
            f"{name}: exch={c['exchanges']} bhj={c['bhj']} smj={c['smj']} "
            f"bnlj={c['bnlj']} "
            f"py={c['python_stages']} pushed={c['pushed_filters']} "
            f"scan_cols={c['scan_cols']}"
            + (f"  ⚠ {' '.join(flags)}" if flags else "")
        )
    print(f"\n{warnings} queries flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
