"""Spark-only registry sweep at a large scale factor.

The correctness gate runs at sf0.01 where the DuckDB oracle is cheap; this
tool answers the question that gate can't: does every registered query still
EXECUTE — and how do its runtime and cardinality scale — when the input is
10-100x bigger?  It runs each ``queries()`` entry against ``--sf-dir``
(default the ``tools/make_sf.py`` output), writes the result to the noop
sink (full column computation, no driver materialization), and reports
wall-time + output rows per query as one JSON line.

A query that raises (e.g. a driver-side cap sized for small SFs, a collect
that only fit in memory at sf0.1) is reported with ``"err"`` rather than
aborting the sweep — those are exactly the regressions this sweep exists to
catch.

``--runs N`` (default 1) times N executions per query and reports the
MEDIAN with min/max spread — the builder's floor-sensitivity study showed
single-session sf10 numbers carry ±50% error bars, so any number meant for
BASELINE.md should be taken with ``--runs 3`` on an idle box.

Usage: python tools/run_at_scale.py [--sf-dir DIR] [--only q16,q25]
                                    [--skip q51] [--runs 3]
                                    [--out SCALE_sf1.json]
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
from foresttime_builder_spark.session import get_spark

#: per-query wall cap for fresh-JVM subprocess re-runs (--isolate /
#: --retry-fresh).  The slowest legitimate sf10 query on record is q77 at
#: ~400 s plus ~60 s of JVM startup; 30 min leaves 3x headroom while
#: still unblocking a sweep whose retry JVM wedges (the exact regime
#: --retry-fresh exists for).
_RETRY_PER_QUERY_CAP_S = 1800


def _cpu_ticks() -> tuple[int, int] | None:
    """(total, steal) jiffies from the /proc/stat aggregate cpu line, or
    None off-Linux.  Diffed around each query so every sweep entry carries
    its own measured steal%% — the r15 rounds lost two sf10 timing sessions
    to host-level CPU steal that was only adjudicated by AFTER-the-fact
    probes (untouched-control queries swinging 2-4x); recording the steal
    window alongside each number makes mover adjudication mechanical."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
    except OSError:
        return None
    vals = [int(x) for x in parts[1:]]
    if not vals:
        return None
    return sum(vals), (vals[7] if len(vals) > 7 else 0)


def _steal_pct(before, after) -> float | None:
    """Steal ticks as %% of all-CPU capacity over the window, 1 decimal."""
    if before is None or after is None or after[0] <= before[0]:
        return None
    return round(100.0 * (after[1] - before[1]) / (after[0] - before[0]), 1)


def _isolate_main(args) -> None:
    """--isolate driver: one subprocess (fresh JVM) per query, merged report."""
    import subprocess

    names = sorted(entrymod.queries())
    if args.only:
        want = {w.strip() for w in args.only.split(",")}
        names = [n for n in names if any(n.startswith(w) for w in want)]
    skip = {w.strip() for w in args.skip.split(",") if w.strip()}
    names = [n for n in names if not any(n.startswith(s) for s in skip)]

    report: dict[str, dict] = {}
    for name in names:
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--sf-dir", args.sf_dir, "--only", name,
            "--runs", str(args.runs),
        ]
        proc = None
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True,
                timeout=max(1, args.runs) * _RETRY_PER_QUERY_CAP_S,
            )
            sub = json.loads(proc.stdout.strip().splitlines()[-1])
            report[name] = sub["queries"][name]
        except subprocess.TimeoutExpired:
            report[name] = {
                "sec": None,
                "rows": None,
                "err": f"subprocess timeout after "
                       f"{max(1, args.runs) * _RETRY_PER_QUERY_CAP_S}s",
            }
        except Exception as exc:
            # proc stays None when subprocess.run itself raised (fork
            # ENOMEM etc.) — report that, don't crash the sweep on an
            # unbound reference inside the handler
            detail = (
                f"rc={proc.returncode}: {proc.stderr.strip()[-300:]}"
                if proc is not None
                else f"spawn failed: {type(exc).__name__}: {str(exc)[:200]}"
            )
            report[name] = {"sec": None, "rows": None,
                            "err": f"subprocess {detail}"}
        status = (
            report[name]["err"]
            or ("GUARDED: " + report[name]["guarded"][:80]
                if report[name].get("guarded")
                else f"{report[name]['rows']} rows")
        )
        print(f"{name}: {report[name]['sec']}s  {status}", file=sys.stderr)

    errs = [n for n in report if report[n]["err"]]
    guarded = [n for n in report if report[n].get("guarded")]
    line = json.dumps(
        {
            "sf_dir": args.sf_dir,
            "isolate": True,
            "queries": report,
            "n": len(report),
            "errors": errs,
            "guarded": guarded,
        }
    )
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    sys.exit(1 if errs else 0)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(repo, ".localdata", "sf1"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip", default="")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--isolate",
        action="store_true",
        help=(
            "run each query in its own fresh JVM (a subprocess re-exec of "
            "this tool with --only). Steady-state mode: interpreted-HOF "
            "throughput is session-context-dependent (BASELINE.md round-9 "
            "— q59 sf10 is 8 s fresh vs 29 s after q58 in one session), so "
            "shared-session sweeps overstate HOF-heavy operators. Default "
            "stays shared-session: it is the cheaper end-to-end executes-"
            "at-scale check and the adversarial regime worth watching."
        ),
    )
    ap.add_argument(
        "--retry-fresh",
        action="store_true",
        help=(
            "after a shared-session sweep, re-run any ERRED query in its "
            "own fresh JVM and merge the result (annotated with the "
            "superseded shared-session error). Guards are never retried."
        ),
    )
    args = ap.parse_args()

    if args.isolate:
        _isolate_main(args)
        return

    queries = entrymod.queries()
    names = sorted(queries)
    if args.only:
        want = {w.strip() for w in args.only.split(",")}
        names = [n for n in names if any(n.startswith(w) for w in want)]
    skip = {w.strip() for w in args.skip.split(",") if w.strip()}
    names = [n for n in names if not any(n.startswith(s) for s in skip)]

    from foresttime_builder_spark.session import dir_bytes

    spark = get_spark(app_name="run_at_scale", data_bytes=dir_bytes(args.sf_dir))
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    sweep_ticks0 = _cpu_ticks()

    report: dict[str, dict] = {}
    for name in names:
        gc.collect()
        t0 = time.time()
        ticks0 = _cpu_ticks()
        try:
            samples = []
            for _ in range(max(1, args.runs)):
                t1 = time.time()
                df = queries[name](spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t1, 2))
            steal = _steal_pct(ticks0, _cpu_ticks())
            # count() re-executes but gives the cardinality the report needs;
            # cache-free on purpose so the noop timing above stays honest.
            rows = df.count()
            report[name] = {
                "sec": round(statistics.median(samples), 2),
                "rows": rows,
                "err": None,
            }
            if steal is not None:
                report[name]["steal_pct"] = steal
            if args.runs > 1:
                report[name]["spread"] = [min(samples), max(samples)]
        except ValueError as exc:
            # a candidate-budget guard RAISING at scale is the operator's
            # DESIGNED behavior (the feasibility answer, not a crash) —
            # recorded as 'guarded', distinct from infrastructure errors
            msg = str(exc)
            # every designed feasibility guard names the lever the caller
            # can pull: candidate_budget (pair/LSH/containment families) or
            # max_sample_rows (single-task sampled histogram) — match both
            # so a guard firing at scale is never misreported as an
            # infrastructure error
            _guard_markers = ("candidate_budget", "max_sample_rows")
            kind = "guarded" if any(m in msg for m in _guard_markers) else "err"
            report[name] = {
                "sec": round(time.time() - t0, 2),
                "rows": None,
                "err": None if kind == "guarded" else f"ValueError: {msg[:300]}",
            }
            if kind == "guarded":
                report[name]["guarded"] = msg[:300]
        except Exception as exc:  # noqa: BLE001 — sweep must not abort
            report[name] = {
                "sec": round(time.time() - t0, 2),
                "rows": None,
                "err": f"{type(exc).__name__}: {str(exc)[:300]}",
            }
        status = (
            report[name]["err"]
            or ("GUARDED: " + report[name]["guarded"][:80]
                if report[name].get("guarded")
                else f"{report[name]['rows']} rows")
        )
        print(f"{name}: {report[name]['sec']}s  {status}", file=sys.stderr)

    errs = [n for n in report if report[n]["err"]]
    if args.retry_fresh and errs:
        # Shared-session sweeps occasionally OOM a heavy-hash query deep
        # into the JVM (r14: q16 at stage ~1354 — asynchronous broadcast
        # reclamation lag, not an operator leak; the full-registry storage
        # probe ends at 0 blocks). Adjudicate automatically: re-run each
        # erred query in its own fresh JVM and record BOTH outcomes — the
        # fresh number plus the shared-session error it supersedes.
        import subprocess

        for name in list(errs):
            print(f"retry-fresh: {name}", file=sys.stderr)
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--sf-dir", args.sf_dir, "--only", name,
                "--runs", str(args.runs),
            ]
            try:
                # the regime this retry targets (deep-sweep OOM / stuck
                # JVM) can hang the subprocess too — cap it so one wedged
                # retry can't block the whole sweep; a timeout keeps the
                # original shared-session error
                proc = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=max(1, args.runs) * _RETRY_PER_QUERY_CAP_S,
                )
            except subprocess.TimeoutExpired:
                print(f"retry-fresh: {name} timed out", file=sys.stderr)
                continue
            try:
                sub = json.loads(proc.stdout.strip().splitlines()[-1])
                fresh = sub["queries"][name]
            except Exception:
                continue  # fresh run also failed — keep the original err
            if not fresh.get("err"):
                fresh["shared_session_err"] = report[name]["err"]
                fresh["retried_fresh"] = True
                report[name] = fresh
                print(
                    f"{name}: {fresh['sec']}s  {fresh['rows']} rows "
                    f"(fresh JVM; shared-session run erred)",
                    file=sys.stderr,
                )
        errs = [n for n in report if report[n]["err"]]
    guarded = [n for n in report if report[n].get("guarded")]
    sweep_steal = _steal_pct(sweep_ticks0, _cpu_ticks())
    line = json.dumps(
        {
            "sf_dir": args.sf_dir,
            "queries": report,
            "n": len(report),
            "errors": errs,
            "guarded": guarded,
            **({"steal_pct": sweep_steal} if sweep_steal is not None else {}),
        }
    )
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    sys.exit(1 if errs else 0)


if __name__ == "__main__":
    main()
