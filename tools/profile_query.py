"""Phase-decomposed profiling of registry queries (optimization round 15).

For each query: time plan BUILD (Python-side DataFrame construction),
ANALYSIS (schema resolution), and N EXECUTIONS (noop sink), and optionally
dump ``explain('formatted')`` to a file.  This answers the question the
flat bench number can't: is a slow query spending its time constructing
the plan (driver/py4j), resolving it (Catalyst analyzer), or running it
(executors)?  Guide §1 (measure first) / §7.3 (driver-side work).

Usage:
  python tools/profile_query.py --sf-dir /root/testdata/sf0.1 \
      --only q26_nsvb_carbon,q52_population_stratified [--runs 3] \
      [--explain-dir plans/r15 --suffix _before]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from foresttime_builder_spark.session import dir_bytes, get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    qs = entrymod.queries()
    names = args.only.split(",") if args.only else list(qs)
    spark = get_spark(app_name="profile", data_bytes=dir_bytes(args.sf_dir))
    # same warm-up as bench.py so numbers are comparable
    from foresttime_builder_spark.sources import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "documents", "embeddings",
              "region", "nation"):
        load_table(spark, args.sf_dir, t).limit(1).count()

    report = {}
    for name in names:
        gc.collect()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, args.sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        _ = df.schema  # forces analysis
        t_analyze = time.time() - t0
        # cold execution (pays codegen + optimizer)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_cold = time.time() - t0
        runs = []
        rebuilds = []
        for _ in range(args.runs):
            t0 = time.time()
            d2 = fn(spark, args.sf_dir)
            rebuilds.append(time.time() - t0)
            t0 = time.time()
            d2.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        rec = {
            "build_s": round(t_build, 3),
            "rebuild_s": round(statistics.median(rebuilds), 3),
            "analyze_s": round(t_analyze, 3),
            "cold_exec_s": round(t_cold, 3),
            "warm_exec_s": round(statistics.median(runs), 3),
            "warm_spread": [round(min(runs), 3), round(max(runs), 3)],
        }
        report[name] = rec
        print(json.dumps({name: rec}), flush=True)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            path = os.path.join(
                args.explain_dir, f"{name}{args.suffix}.txt"
            )
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
