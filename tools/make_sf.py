"""Deterministically scale the driver's sf0.1 parquet tables to larger SFs.

The driver only generates sf{0.001,0.01,0.1}; the at-scale evidence the
design-for-scale story needs (does q25's construction floor amortize? does
the q16 prefix filter hold when the corpus grows?) requires a bigger input.
This tool replicates every FACT table ``copies`` times with disjoint key
ranges so referential integrity is preserved copy-by-copy, while the tiny
dimension tables (``region``, ``nation``) stay fixed — which is exactly how
real datasets grow: facts scale, dims don't.

Determinism + semantic-preservation rules:

- every key column is offset by ``copy_index * OFFSET`` where ``OFFSET`` is
  divisible by every modulus 1..10, so ``key % k`` slices used by queries
  (e.g. q54's ``doc_id % 3`` oracle-protection slice) select the same
  fraction in every copy;
- ``documents.text`` gets a two-level, length-preserving vocabulary shift
  per copy (see :func:`_caesar2`) so copies of the same doc share no
  shingles: without this, verbatim copies of every document would make
  near-dup PAIR counts grow ~O(copies^2) and the measured scaling
  exponent would say nothing about the engine;
- ``embeddings.embedding`` is multiplied by a deterministic per-copy ±1
  sign pattern: norms and within-copy inner products are preserved exactly
  (signs square away), while cross-copy inner products become random-sign
  sums — decorrelated regardless of the vectors' internal structure.  (A
  cyclic roll was tried first and failed: the synthetic vectors carry
  enough autocorrelation that rolled copies stayed near-duplicates,
  inflating cross-copy near-dup pairs ~15x superlinearly.);
- timestamps are left untouched, so windowed/streaming aggregates see
  ``copies``× the rows per window — more rows per group, not more groups,
  which is the harder direction for partial aggregation.

Usage: python tools/make_sf.py [--copies 10] [--src /root/testdata/sf0.1]
                               [--out .localdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Divisible by lcm(1..10) = 2520 and far above any sf0.1 key (max ~600k),
# so `key % k` membership is copy-invariant for every small k and key
# ranges of different copies never collide.
OFFSET = 2_520_000_000

# Fact tables and the key columns that must be offset per copy.  Foreign
# keys into region/nation (c_nationkey, s_nationkey, n_regionkey) are NOT
# offset: the dims are fixed, so every copy references the same 25 nations.
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ["region", "nation"]

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def _shift_char(ch: str, s: int) -> str:
    if ch in _LOWER:
        return _LOWER[(_LOWER.index(ch) + s) % 26]
    if ch in _UPPER:
        return _UPPER[(_UPPER.index(ch) + s) % 26]
    return ch


def _caesar2(text: str, copy: int) -> str:
    """Two-level, length-preserving vocabulary shift: every letter shifts
    by ``copy % 26`` and odd positions shift additionally by
    ``copy // 26 % 26``.  Equal to a plain caesar for copy < 26 (so sf1
    outputs are unchanged), and distinct for 676 copies — a plain caesar
    wraps at 26, which would make copies 26 apart verbatim duplicates and
    blow near-dup pair counts up quadratically at 100 copies."""
    s1 = copy % 26
    s2 = (s1 + (copy // 26)) % 26
    return "".join(
        _shift_char(ch, s2 if p % 2 else s1) for p, ch in enumerate(text)
    )


def _scale_table(name: str, src: str, out: str, copies: int) -> int:
    tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
    if name in DIM_TABLES:
        pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
        return tbl.num_rows

    parts = []
    for i in range(copies):
        cols = {}
        for field in tbl.schema:
            col = tbl.column(field.name)
            if field.name in KEY_COLS[name] and i > 0:
                col = pa.chunked_array(
                    [pa.compute.add(c, i * OFFSET) for c in col.chunks]
                )
            elif name == "documents" and field.name == "text" and i > 0:
                col = pa.array(
                    [None if t is None else _caesar2(t, i) for t in col.to_pylist()],
                    type=field.type,
                )
            elif name == "embeddings" and field.name == "embedding" and i > 0:
                vals = col.to_pylist()
                dim = next(len(v) for v in vals if v is not None)
                signs = np.where(
                    np.random.default_rng(i).random(dim) < 0.5, -1.0, 1.0
                ).astype(np.float32)
                flipped = [
                    None
                    if v is None
                    else (np.asarray(v, dtype=np.float32) * signs).tolist()
                    for v in vals
                ]
                col = pa.array(flipped, type=field.type)
            cols[field.name] = col
        parts.append(pa.table(cols, schema=tbl.schema))
    big = pa.concat_tables(parts)
    # Row-group size ~sf0.1's whole table keeps scan parallelism reasonable.
    pq.write_table(big, os.path.join(out, f"{name}.parquet"), row_group_size=200_000)
    return big.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(__file__)), ".localdata", "sf1"),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in DIM_TABLES + sorted(KEY_COLS):
        n = _scale_table(name, args.src, args.out, args.copies)
        print(f"{name}: {n} rows")
    print(f"wrote {args.out} ({args.copies}x {args.src})")


if __name__ == "__main__":
    main()
