"""Emit the query-registry status from the registry itself.

README.md / BASELINE.md carry running registry counts; during round 6 they
drifted (58/68/73/74/75) because each was hand-edited.  This tool derives
the numbers from `QUERIES` — the single source of truth — so docs can be
refreshed with one command instead of hand-counting.

Usage: python tools/registry_status.py [--markdown]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foresttime_builder_spark.plans.benchmark_queries import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--markdown", action="store_true", help="emit a md table")
    args = ap.parse_args()

    names = sorted(QUERIES)
    with_oracle = [n for n in names if QUERIES[n].oracle]
    rows_only = [n for n in names if not QUERIES[n].oracle]

    lo, hi = names[0].split("_")[0], names[-1].split("_")[0]
    print(f"registry: {len(names)} queries ({lo}..{hi})")
    print(f"  with DuckDB oracle (value-hash gate): {len(with_oracle)}")
    print(f"  rows-only (no SQL-expressible twin):  {len(rows_only)}"
          + (f" -> {', '.join(rows_only)}" if rows_only else ""))

    if args.markdown:
        print()
        print("| metric | value |")
        print("|---|---|")
        print(f"| registry queries | {len(names)} ({lo}..{hi}) |")
        print(f"| value-hash-gated (DuckDB twin) | {len(with_oracle)} |")
        print(f"| rows-only checked | {len(rows_only)} |")


if __name__ == "__main__":
    main()
