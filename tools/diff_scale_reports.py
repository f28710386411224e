"""Diff two run_at_scale sweep reports and flag movers needing adjudication.

The r13/r14 rounds found sweep movers by eye, and the exact class of miss
that invites happened twice: r13 overlooked q108's sf10 3.9x (it was sweep
contention) and r14 overlooked three sf1 movers (q21 x3.0, q20 x1.83,
q18 x1.67 — also noise, but unadjudicated at round close, drawing a
verdict finding).  This tool makes the check mechanical and SF-agnostic:
point it at last round's sweep artifact and this round's, and every query
slower by more than ``--flag-ratio`` (default 1.5) is listed with the
ready-made fresh-JVM isolate command that the adjudication convention
(BASELINE round-13 item 6, extended to ALL SFs by the r14 verdict)
requires.

Status transitions (ok -> err, guarded -> ok, rows changed) are flagged
unconditionally — a ratio filter must never hide a query that stopped
completing or changed its output cardinality.

Exit code 1 when anything needs adjudication, so the round-close checklist
can gate on it.

Usage: python tools/diff_scale_reports.py OLD.json NEW.json
           [--flag-ratio 1.5] [--min-sec 1.0]
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--flag-ratio", type=float, default=1.5,
        help="flag queries whose sec grew by more than this factor",
    )
    ap.add_argument(
        "--min-sec", type=float, default=1.0,
        help=(
            "ignore ratio movers whose NEW time is below this (sub-second "
            "entries are scheduler-floor noise at any SF; status/row "
            "changes are still always flagged)"
        ),
    )
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    oldq, newq = old.get("queries", {}), new.get("queries", {})

    movers: list[tuple[str, str]] = []  # (name, reason)
    for name in sorted(set(oldq) | set(newq)):
        o, n = oldq.get(name), newq.get(name)
        if o is None:
            continue  # new query this round: no baseline to diff
        if n is None:
            movers.append((name, "MISSING from new sweep"))
            continue
        o_err, n_err = o.get("err"), n.get("err")
        o_grd, n_grd = bool(o.get("guarded")), bool(n.get("guarded"))
        if bool(o_err) != bool(n_err):
            movers.append(
                (name, f"status changed: err {o_err!r} -> {n_err!r}")
            )
            continue
        if o_grd != n_grd:
            movers.append((name, f"guard changed: {o_grd} -> {n_grd}"))
            continue
        if n_err or n_grd:
            continue  # same non-ok status both rounds: nothing to ratio
        if o.get("rows") != n.get("rows"):
            movers.append(
                (name, f"rows changed: {o.get('rows')} -> {n.get('rows')}")
            )
            continue
        o_sec, n_sec = o.get("sec"), n.get("sec")
        if not o_sec or not n_sec or n_sec < args.min_sec:
            continue
        ratio = n_sec / o_sec
        if ratio > args.flag_ratio:
            movers.append(
                (name, f"{o_sec}s -> {n_sec}s (x{ratio:.2f} slower)")
            )

    sf_dir = new.get("sf_dir", "<sf-dir>")
    for name, reason in movers:
        print(f"MOVER {name}: {reason}")
    if movers:
        # full names: run_at_scale --only does PREFIX matching, so a
        # truncated 'q12' would also re-run q120..q124 (r15 review catch)
        only = ",".join(sorted({n for n, _ in movers}))
        print(
            f"\n{len(movers)} need adjudication — fresh-JVM isolate:\n"
            f"  python tools/run_at_scale.py --sf-dir {sf_dir} "
            f"--isolate --only {only} --runs 3 --out MOVERS.json"
        )
    else:
        print("no movers (ratio <= "
              f"{args.flag_ratio}, statuses and rows unchanged)")
    sys.exit(1 if movers else 0)


if __name__ == "__main__":
    main()
