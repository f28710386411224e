"""FIA DataMart sources: download, extract, and CSV scan.

Mirrors the reference's source surface (``R/fia_download.R``,
``R/fia_load.R``) Spark-first:

- :func:`fia_download` / :func:`unzip_csvs` are driver-side (a handful of
  HTTP fetches is not a Spark job), idempotent (skip-if-present), and only
  extract the 9 needed tables;
- :func:`fia_load` is a schema-contracted multi-state CSV scan: Spark infers
  the per-table schema from a sample, then every control-number column
  (``CN`` / ``*_CN``) is pinned to ``StringType`` before the real scan —
  FIADB CNs are 15+ digit integers that silently lose precision as doubles
  (reference casts them to character for the same reason,
  ``R/fia_tidy.R:25,31,45,61``; rationale ``NEWS.md:26``).

Scale notes: multi-state loads are one reader over a path glob, so partition
planning, predicate pushdown (e.g. the INVYR >= 2000 filter) and parallelism
come from the data source, not a driver loop.  For production scale, convert
the CSVs to parquet once with :func:`csv_to_parquet` and scan that.
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

#: the 9 FIADB tables the pipeline consumes (reference ``R/fia_download.R:2-12``)
FIA_TABLES = (
    "PLOT",
    "COND",
    "TREE",
    "PLOTGEOM",
    "POP_ESTN_UNIT",
    "POP_EVAL",
    "POP_EVAL_TYP",
    "POP_PLOT_STRATUM_ASSGN",
    "POP_STRATUM",
)

DATAMART_URL = "https://apps.fs.usda.gov/fia/datamart/CSV/{state}_CSV.zip"


def _fetch_zip(url: str, dest: str, timeout: int) -> None:
    """Download ``url`` to ``dest`` with validated resume: a leftover
    ``.part`` file from an interrupted run continues via an HTTP Range
    request (the DataMart serves static zips and honors ranges), falling
    back to a full re-fetch if the server ignores the range.  Three
    integrity guards close the silent-corruption windows a bare resume
    leaves open: (a) resumes send ``If-Range`` stamped with the ``.part``
    file's mtime, so a remote zip superseded since the partial was written
    makes the server reply 200 (full body) and the fetch restarts from
    byte 0 instead of splicing two versions; (b) when the server does
    reply 206, the Content-Range total must equal the resumed offset plus
    the remaining body length, catching inconsistent ranged replies; (c)
    the completed file must pass ``zipfile.is_zipfile``
    (central-directory check) before being moved into place, otherwise
    the ``.part`` is deleted and an error raised — the skip-if-present
    logic upstream then never mistakes a truncated archive for done."""
    import urllib.request
    from email.utils import formatdate

    tmp = dest + ".part"
    start = os.path.getsize(tmp) if os.path.exists(tmp) else 0
    req = urllib.request.Request(url)
    if start:
        req.add_header("Range", f"bytes={start}-")
        req.add_header(
            "If-Range", formatdate(os.path.getmtime(tmp), usegmt=True)
        )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        partial = resp.status == 206
        if start and partial:
            # Content-Range: bytes <start>-<end>/<total>; a total different
            # from start + remaining body is an inconsistent ranged reply —
            # restart clean rather than write a corrupt splice
            crange = resp.headers.get("Content-Range", "")
            total = crange.rsplit("/", 1)[-1]
            length = resp.headers.get("Content-Length")
            if total.isdigit() and length and total != str(start + int(length)):
                partial = False
        mode = "ab" if (start and partial) else "wb"
        with open(tmp, mode) as out:
            while chunk := resp.read(1 << 20):
                out.write(chunk)
    if not zipfile.is_zipfile(tmp):
        os.remove(tmp)
        raise IOError(
            f"downloaded archive failed zip validation: {url} "
            "(connection dropped mid-chunk or stale resume) — partial removed, re-run to retry"
        )
    os.replace(tmp, dest)


def fia_download(
    states: Sequence[str],
    download_dir: str,
    extract: bool = True,
    keep_zip: bool = False,
    timeout: int = 600,
    max_workers: int = 6,
) -> list[str]:
    """Fetch ``{STATE}_CSV.zip`` archives from the FIA DataMart
    (reference ``R/fia_download.R:27-96``). Concurrent + resumable to match
    the reference's ``curl::multi_download(multiplex = TRUE)``
    (``R/fia_download.R:77-84``): states download in parallel threads
    (I/O-bound), interrupted ``.part`` files resume via Range requests, and
    already-complete zips are skipped. Returns the list of zip paths.
    Network access is attempted lazily so offline environments can still
    import this module."""
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(download_dir, exist_ok=True)
    zips = [os.path.join(download_dir, f"{state}_CSV.zip") for state in states]
    todo = [
        (DATAMART_URL.format(state=s), d)
        for s, d in zip(states, zips)
        if not os.path.exists(d)
    ]
    if todo:
        with ThreadPoolExecutor(max_workers=min(max_workers, len(todo))) as ex:
            futures = [ex.submit(_fetch_zip, u, d, timeout) for u, d in todo]
            for f in futures:
                f.result()  # surface the first failure
    if extract:
        unzip_csvs(zips, download_dir, keep_zip=keep_zip)
    return zips


def unzip_csvs(
    zips: Sequence[str], out_dir: str, keep_zip: bool = True
) -> list[str]:
    """Extract only the needed ``{STATE}_{TABLE}.csv`` members
    (reference ``R/fia_download.R:98-114``)."""
    extracted = []
    for zpath in zips:
        state = os.path.basename(zpath).split("_")[0]
        wanted = {f"{state}_{t}.csv" for t in FIA_TABLES}
        with zipfile.ZipFile(zpath) as zf:
            for member in zf.namelist():
                base = os.path.basename(member)
                if base in wanted:
                    target = os.path.join(out_dir, base)
                    if not os.path.exists(target):
                        with zf.open(member) as src, open(target, "wb") as dst:
                            dst.write(src.read())
                    extracted.append(target)
        if not keep_zip:
            os.remove(zpath)
    return extracted


def _pin_cn_columns(schema: T.StructType) -> T.StructType:
    """Control numbers must never be numeric (precision loss)."""
    fields = []
    for f in schema.fields:
        if f.name == "CN" or f.name.endswith("_CN"):
            fields.append(T.StructField(f.name, T.StringType(), True))
        else:
            fields.append(f)
    return T.StructType(fields)


#: the reader options the schema inference runs under — part of the memo
#: key below, so a future change to these (or a per-call override) can
#: never serve a schema inferred under different settings
_CSV_READ_OPTS: tuple[tuple[str, str], ...] = (
    ("header", "true"),
    ("nullValue", "NA"),
)

#: inferred-CSV-schema memo, keyed on the reader options plus every
#: file's (path, mtime_ns, size) — see the inference note inside
#: :func:`fia_load`
_SCHEMA_CACHE: dict[tuple, "object"] = {}


def fia_load(
    spark: SparkSession,
    states: Sequence[str],
    csv_dir: str,
    tables: Sequence[str] = FIA_TABLES,
) -> dict[str, DataFrame]:
    """Multi-state CSV scan → ``{table: DataFrame}`` (reference
    ``R/fia_load.R:8-11``). One reader per table over all state files (union
    by path list), schema inferred once then CN columns pinned to string."""
    db: dict[str, DataFrame] = {}
    for table in tables:
        paths = [
            os.path.join(csv_dir, f"{state}_{table}.csv") for state in states
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            continue
        # schema inference is a FULL extra scan job per table (9 jobs per
        # load); the files are immutable between runs of the same
        # pipeline, so memoize on (path, mtime, size) — same idea as
        # parquet footer caching.  A touched/replaced file misses the key
        # and re-infers, so this can never serve a stale schema.
        stats = [(p, os.stat(p)) for p in paths]  # one stat per file
        key = (_CSV_READ_OPTS,) + tuple(
            (p, s.st_mtime_ns, s.st_size) for p, s in stats
        )
        inferred = _SCHEMA_CACHE.get(key)
        if inferred is None:
            inferred = (
                spark.read.options(**dict(_CSV_READ_OPTS))
                .option("inferSchema", True)
                .csv(paths)
                .schema
            )
            _SCHEMA_CACHE[key] = inferred
        db[table] = (
            spark.read.options(**dict(_CSV_READ_OPTS))
            .schema(_pin_cn_columns(inferred))
            .csv(paths)
        )
    return db


def csv_to_parquet(
    db: dict[str, DataFrame], out_dir: str, partition_by: str | None = "STATECD"
) -> None:
    """One-time CSV → parquet staging for repeated large-scale runs."""
    for table, df in db.items():
        writer = df.write.mode("overwrite")
        if partition_by and partition_by in df.columns:
            writer = writer.partitionBy(partition_by)
        writer.parquet(os.path.join(out_dir, table))


def load_staged(
    spark: SparkSession, stage_dir: str, tables: Sequence[str] = FIA_TABLES
) -> dict[str, DataFrame]:
    """Read a :func:`csv_to_parquet` staging area (partition-pruned scans)."""
    return {
        t: spark.read.parquet(os.path.join(stage_dir, t))
        for t in tables
        if os.path.exists(os.path.join(stage_dir, t))
    }
