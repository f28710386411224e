"""Merge per-query entries from one run_at_scale report into another.

The --isolate protocol runs every query in its own fresh JVM, so a report
is by construction a set of independent per-query measurements — merging
a targeted re-run (e.g. after fixing one query's scale posture) into the
full-sweep artifact is the same protocol, just executed in two invocations.
Provenance: the merged artifact records, per overridden query, which source
file the entry came from.

Usage: python tools/merge_scale_reports.py BASE.json FIXUP.json --out OUT.json
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("fixup")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    with open(args.base) as fh:
        base = json.load(fh)
    with open(args.fixup) as fh:
        fix = json.load(fh)

    overridden = []
    for name, entry in fix["queries"].items():
        entry = dict(entry)
        entry["merged_from"] = args.fixup
        base["queries"][name] = entry
        overridden.append(name)

    base["errors"] = [
        n for n, v in base["queries"].items() if v.get("err")
    ]
    base["guarded"] = [
        n for n, v in base["queries"].items() if v.get("guarded")
    ]
    base["n"] = len(base["queries"])
    base["merged"] = sorted(set(base.get("merged", [])) | set(overridden))
    with open(args.out, "w") as fh:
        fh.write(json.dumps(base) + "\n")
    print(
        f"merged {len(overridden)} entries; errors={base['errors']} "
        f"guarded={base['guarded']}"
    )


if __name__ == "__main__":
    main()
