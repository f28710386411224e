"""Deterministic NULL / tie / overflow fuzz variant of a testdata SF dir.

The synthetic gate tables contain no NULLs, no duplicate timestamps, and no
near-overflow magnitudes — a blind spot the round-9 reviews exploited by
hand 16 times (IVM null rows, SCD2 tiebreaks, int64 overflow at ~3e9
events, NULL-text avgdl shifts, ...).  This tool makes that coverage
structural: it rewrites every table of a source SF dir with type-aware,
hash-deterministic mutations, so `tools/check_correctness.py --sf <out>`
runs the ENTIRE registry against adversarial data with both engines seeing
identical bytes.

Mutation classes (selection hash = duckdb hash(all original row values,
column name) so re-runs are bit-identical and equal rows mutate equally):

- every column: ~5% NULL (including join/group keys — both engines must
  agree on NULL-key join/group semantics);
- VARCHAR: +2% empty string, +1% multi-space whitespace soup;
- DOUBLE: +2% tie value (1.5), +1% large magnitude 1e6 (e2/e4-scaled
  sums/products cross the float-sum-order threshold; see the inline
  note for why not 1e8);
- BIGINT/INTEGER non-key: +2% tie (42 / 7), +1% large (1e12 / 2e9);
- TIMESTAMP: +15% truncated to the hour (duplicate-timestamp ties for
  windows/SCD2/as-of tie-breaks);
- FLOAT[]: ~3% NULL vector.

Key-ish columns (``*key``, ``*_id``): BIGINT/INTEGER keys get NULL ONLY —
no tie arm (deterministic id-keyed ops document a unique-non-NULL-id
precondition; duplicate primary ids test outside every contract) and no
large arm (overflowing a join key only makes a new distinct value — noise,
not signal).  DOUBLE keys keep the tie arm; VARCHAR/TIMESTAMP keys keep
their full type arms.

``--skew`` adds a HEAVY-HITTER dimension the value-mutation corpora lack
(their key cardinalities stay uniform): on each table's foreign-key /
group columns (never primary ids, never text payloads) ~30% of rows are
remapped to one deterministic heavy value — the column's minimum — so one
customer owns ~30% of orders, one supplier ~30% of lineitems, one source
~30% of documents.  That drives the salted-agg/join paths and AQE skew
splitting through the identical-bytes hash gate, on top of the standard
NULL/tie/overflow ladder (the skew arm uses its own selection hash, so
the remaining 70% of rows keep the full mutation coverage).

Usage: python tools/make_fuzz_sf.py [--src /root/testdata/sf0.01]
                                    [--out .localdata/sf0.01_fuzz]
                                    [--skew]
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _is_keyish(col: str) -> bool:
    return col.endswith("key") or col.endswith("_id")


#: --skew targets: foreign-key and group/dimension columns only — primary
#: ids stay unique (deterministic id-keyed ops document a unique-id
#: precondition) and text payloads stay content-realistic
SKEW_COLS: dict[str, tuple[str, ...]] = {
    "nation": ("n_regionkey",),
    "customer": ("c_nationkey", "c_mktsegment"),
    "supplier": ("s_nationkey",),
    "part": ("p_brand", "p_type"),
    "orders": ("o_custkey", "o_orderstatus", "o_orderpriority"),
    "lineitem": ("l_partkey", "l_suppkey", "l_returnflag"),
    "events": ("user_id", "event_type"),
    "documents": ("source", "lang"),
    "embeddings": ("label",),
}


def mutated_expr(
    col: str, typ: str, allcols: list[str], salt: str = "",
    skew_src: str | None = None,
) -> str:
    """CASE expression applying this column's mutation ladder.

    ``skew_src`` (the source parquet path) wraps the ladder in an OUTER
    heavy-hitter arm: ~30% of rows (independent selection hash) remap to
    the column's minimum original value, so the ladder's NULL/tie classes
    still cover the non-heavy 70%."""
    h = f"hash({', '.join(allcols)}, '{col}{salt}')"
    b = f"({h} % 1000)"
    t = typ.upper()
    arms = [f"WHEN {b} < 50 THEN NULL"]
    if t == "VARCHAR":
        arms += [
            f"WHEN {b} < 70 THEN ''",
            f"WHEN {b} < 80 THEN ' a  b   c '",
        ]
    elif t == "DOUBLE":
        arms += [f"WHEN {b} < 70 THEN 1.5"]
        if not _is_keyish(col):
            # 1e6, not 1e8: large enough to stress e2/e4-scaled arithmetic
            # past the float-sum-order threshold, small enough that the
            # FIA panel's interpolation/EXTRAPOLATION of missing years
            # stays inside the NSVB power laws' int64-quantizable range
            # (1e8 price swings extrapolated to fake 9e18 carbon values —
            # junk beyond any physical domain; the int64-overflow class
            # itself stays covered by the BIGINT 1e12 arm below)
            arms += [f"WHEN {b} < 80 THEN 1e6"]
    elif t == "BIGINT":
        # no tie arm for key-ish columns: id-keyed deterministic ops
        # (sampling/splits/upserts) have a DOCUMENTED unique-non-NULL-id
        # precondition; duplicate primary ids test outside every
        # contract, while NULL ids (above) must still be handled
        # identically by both engines
        if not _is_keyish(col):
            arms += [
                f"WHEN {b} < 70 THEN 42",
                f"WHEN {b} < 80 THEN 1000000000000",
            ]
    elif t == "INTEGER":
        if not _is_keyish(col):
            arms += [
                f"WHEN {b} < 70 THEN 7",
                f"WHEN {b} < 80 THEN 2000000000",
            ]
    elif t == "TIMESTAMP":
        arms += [f"WHEN {b} < 200 THEN date_trunc('hour', {col})"]
    elif t.endswith("[]"):
        pass  # arrays: NULL only
    body = f"CASE {' '.join(arms)} ELSE {col} END"
    if skew_src is not None:
        hs = f"hash({', '.join(allcols)}, '{col}{salt}SKEW')"
        body = (
            f"CASE WHEN ({hs} % 1000) < 300 "
            f"THEN (SELECT min({col}) FROM '{skew_src}') "
            f"ELSE {body} END"
        )
    return f"CAST({body} AS {typ}) AS {col}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata",
            "sf0.01_fuzz",
        ),
    )
    ap.add_argument(
        "--salt",
        default="",
        help="re-rolls WHICH rows mutate (different mutation pattern, "
        "same classes) — run the gate on a second salt to catch "
        "divergences that the default pattern misses by threshold luck",
    )
    ap.add_argument(
        "--skew",
        action="store_true",
        help="add the heavy-hitter arm: ~30%% of rows on each table's "
        "FK/group columns remap to that column's minimum value",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        cols = con.execute(
            f"DESCRIBE SELECT * FROM '{src}'"
        ).fetchall()
        names = [c[0] for c in cols]
        skew_cols = SKEW_COLS.get(t, ()) if args.skew else ()
        sel = ",\n  ".join(
            mutated_expr(
                name, typ, names, args.salt,
                skew_src=src if name in skew_cols else None,
            )
            for name, typ, *_ in cols
        )
        dst = os.path.join(args.out, f"{t}.parquet")
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}') TO '{dst}' (FORMAT parquet)"
        )
        n, nulls = con.execute(
            f"SELECT count(*), sum(CASE WHEN {names[0]} IS NULL THEN 1 ELSE 0 END)"
            f" FROM '{dst}'"
        ).fetchone()
        print(f"{t}: {n} rows, {nulls} NULL {names[0]}")


if __name__ == "__main__":
    main()
