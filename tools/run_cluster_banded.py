"""sf10 measurement of the GUARDED clustering/finalize path (q50/q77 via
banded candidates).

At sf10 the exact token-Jaccard pair stream is shuffle-bound (~1.25e9
candidates, exceeds local disk — BASELINE.md round-7 addendum), so the
registry q77 cannot run there on the exact path.  This driver runs the
same operators through the regime guard with a production-shaped budget:
the sampled estimator projects the stream, sees it over budget, and
degrades to banded MinHash-LSH candidates with exact verification; the
connected-components + keep-best finalize then consume the surviving
pairs unchanged.  Reports wall time + cardinalities as one JSON line.

Usage: python tools/run_cluster_banded.py [--sf-dir DIR] [--budget N]
                                          [--out SCALE_sf10_cluster.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foresttime_builder_spark.session import dir_bytes, get_spark


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(repo, ".localdata", "sf10"))
    ap.add_argument(
        "--budget",
        type=int,
        default=200_000_000,
        help="candidate budget; sf10's projected exact stream (~1.25e9) "
        "exceeds this, so the guard degrades to the banded path",
    )
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from foresttime_builder_spark.operators.graph import (
        MAX_ITER_DEFAULT,
        cluster_near_dups,
        dedup_finalize,
    )
    from foresttime_builder_spark.sources import load_table

    spark = get_spark(
        app_name="cluster_banded", data_bytes=dir_bytes(args.sf_dir)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    docs = load_table(spark, args.sf_dir, "documents")
    max_iter = args.max_iter or MAX_ITER_DEFAULT

    report: dict[str, dict] = {}
    t0 = time.time()
    clusters = cluster_near_dups(
        docs, "doc_id", "text", threshold=0.8, strategy="prefix",
        candidate_budget=args.budget, on_budget="degrade", max_iter=max_iter,
    ).persist()
    n_rows = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    report["cluster_near_dups_banded"] = {
        "sec": round(time.time() - t0, 2),
        "clustered_docs": n_rows,
        "clusters": n_clusters,
    }
    print(f"clusters: {report['cluster_near_dups_banded']}", file=sys.stderr)

    # finalize from the persisted clusters: measures the q77-on-top-of-q50
    # increment (join + keep-best window) without recomputing the pair
    # graph — a pipeline materializes clusters once, exactly like this
    t1 = time.time()
    kept = dedup_finalize(docs, "doc_id", "text", clusters=clusters)
    kept.write.format("noop").mode("overwrite").save()
    report["dedup_finalize_increment"] = {"sec": round(time.time() - t1, 2)}
    kept_rows = kept.count()
    report["dedup_finalize_increment"]["kept_docs"] = kept_rows
    clusters.unpersist()
    print(f"finalize: {report['dedup_finalize_increment']}", file=sys.stderr)

    line = json.dumps(
        {
            "sf_dir": args.sf_dir,
            "budget": args.budget,
            "total_sec": round(time.time() - t0, 2),
            "ops": report,
        }
    )
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
