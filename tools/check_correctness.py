"""Local twin of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same parquet tables, then compares row count, schema
(column names), and order-insensitive values. Also flags float outputs whose
pre-rounding value sits dangerously close to a rounding boundary (those could
hash-mismatch between engines even when semantically equal).

Usage: python tools/check_correctness.py [--sf DIR] [--only q08,q09]
"""

from __future__ import annotations

import argparse
import contextlib
import math
import os
import sys
import tempfile
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints vs floats and bools for cross-engine compare
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return errs
    if len(sdf) != len(odf):
        errs.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
        return errs
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            neq = ~((av.isna() & bv.isna()) | (av == bv))
            if neq.any():
                close = ((av - bv).abs() < 1e-9) | (av.isna() & bv.isna())
                n_exact = int(neq.sum())
                n_far = int((~close).sum())
                errs.append(
                    f"col {c}: {n_exact} value diffs ({n_far} beyond 1e-9); "
                    f"e.g. {av[neq].head(3).tolist()} vs {bv[neq].head(3).tolist()}"
                )
        else:
            neq = ~((av.isna() & bv.isna()) | (av == bv))
            if neq.any():
                i = neq.idxmax()
                errs.append(
                    f"col {c}: {int(neq.sum())} diffs; first at row {i}: "
                    f"{av[i]!r} vs {bv[i]!r}"
                )
    return errs


def boundary_risk(df: pd.DataFrame, decimals: int = 6) -> int:
    """Count float values suspiciously close to a rounding boundary."""
    n = 0
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            v = df[c].dropna()
            frac = (v * 10**decimals) % 1
            n += int(((frac > 1e-7) & ((frac < 0.01) | (frac > 0.99))).sum())
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as e
    from foresttime_builder_spark.session import dir_bytes, get_spark

    spark = get_spark(app_name="check_correctness", data_bytes=dir_bytes(args.sf))
    qs, oracles = e.queries(), e.oracle_sql()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if any(k.startswith(p) for p in keep)}

    def fresh_con(mem: str | None = None):
        """One connection per query: a query that hits DuckDB's memory
        ceiling otherwise poisons the connection and every later oracle
        fails with bad-allocation too. A temp_directory lets the big
        NSVB-twin CTE chains spill instead of dying at larger SFs."""
        c = duckdb.connect()
        spill = os.path.join(tempfile.gettempdir(), "ftb_duckdb_spill")
        os.makedirs(spill, exist_ok=True)
        c.execute(f"SET temp_directory='{spill}'")
        # default (80% of RAM) collides with the Spark JVM's RSS at larger
        # SFs and dies on malloc; an explicit cap below system headroom
        # (but big enough for the sf0.1 NSVB twins' transients) avoids that
        c.execute(
            f"SET memory_limit='{mem or os.environ.get('FTB_DUCKDB_MEM', '64GB')}'"
        )
        for t in TABLES:
            p = os.path.join(args.sf, f"{t}.parquet")
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c

    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({t_spark:.1f}s)")
            n_pass += 1
            continue
        try:
            # close on BOTH paths: an oracle OOM (the very scenario the
            # per-query connection exists for) must not leak the
            # connection's memory reservation and spill directory
            with contextlib.closing(fresh_con()) as con:
                odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            if "emory" in str(ex):
                # in a long 78-oracle run the process RSS (JVM + pandas
                # materializations) eats the allocator's headroom; retry
                # once after a GC with a cap that still fits the giant
                # carbon-CTE twins' unspillable working set (q27/q52 were
                # flaky-OOM at sf0.1 exactly this way, passing solo)
                import gc as _gc

                _gc.collect()
                try:
                    with contextlib.closing(fresh_con("48GB")) as con:
                        odf = con.execute(oracles[name]).fetchdf()
                except Exception as ex2:
                    print(f"FAIL {name}: oracle error (after retry): {ex2}")
                    n_fail += 1
                    continue
            else:
                print(f"FAIL {name}: oracle error: {ex}")
                n_fail += 1
                continue
        errs = compare(name, sdf, odf)
        risk = boundary_risk(sdf)
        tag = f" [boundary-risk={risk}]" if risk else ""
        if errs:
            print(f"FAIL {name}: rows={len(sdf)}{tag}")
            for err in errs[:4]:
                print(f"     {err}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} ({t_spark:.1f}s){tag}")
            n_pass += 1
        # release the per-query frames before the next oracle: 78 pandas
        # materializations otherwise ratchet the process RSS and starve
        # the biggest DuckDB twins mid-sweep
        del sdf, odf
        import gc as _gc

        _gc.collect()
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
