"""FIA CSV source layer + per-state pipeline driver integration tests."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from foresttime_builder_spark.plans import state_pipeline
from foresttime_builder_spark.sources import fia as fia_src
from tests.fia_fixtures import build_db, spark_db


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    """Fixture db written as {STATE}_{TABLE}.csv files (state 44 = RI)."""
    d = tmp_path_factory.mktemp("fia_csv")
    for table, pdf in build_db().items():
        pdf.to_csv(d / f"RI_{table}.csv", index=False, na_rep="NA")
    return str(d)


def test_fia_load_pins_cn_to_string(spark, csv_dir):
    db = fia_src.fia_load(spark, ["RI"], csv_dir, tables=("PLOT", "TREE"))
    assert dict(db["PLOT"].dtypes)["CN"] == "string"
    assert dict(db["TREE"].dtypes)["CN"] == "string"
    assert dict(db["TREE"].dtypes)["PLT_CN"] == "string"
    # numeric columns still inferred as numbers
    assert dict(db["TREE"].dtypes)["DIA"] == "double"


def test_fia_load_matches_in_memory_db(spark, csv_dir):
    """CSV-loaded pipeline output ≡ in-memory fixture pipeline output."""
    from foresttime_builder_spark.plans import fia

    db_csv = fia_src.fia_load(
        spark, ["RI"], csv_dir, tables=("PLOT", "COND", "TREE", "PLOTGEOM")
    )
    a = fia.fia_tidy(db_csv)
    b = fia.fia_tidy(spark_db(spark))
    cols = sorted(set(a.columns) & set(b.columns))
    assert a.count() == b.count()
    assert (
        a.select(cols).exceptAll(b.select(cols)).count() == 0
    ), "CSV-loaded tidy differs from in-memory tidy"


def test_multi_state_union(spark, csv_dir, tmp_path):
    """Two states load as one scan with both states' rows."""
    import shutil

    for t in ("PLOT", "COND", "TREE", "PLOTGEOM"):
        shutil.copy(
            os.path.join(csv_dir, f"RI_{t}.csv"),
            os.path.join(csv_dir, f"DE_{t}.csv"),
        )
    db = fia_src.fia_load(
        spark, ["RI", "DE"], csv_dir, tables=("PLOT", "TREE")
    )
    one = fia_src.fia_load(spark, ["RI"], csv_dir, tables=("PLOT", "TREE"))
    assert db["TREE"].count() == 2 * one["TREE"].count()


def test_unzip_extracts_only_needed_tables(tmp_path, csv_dir):
    zpath = tmp_path / "RI_CSV.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(os.path.join(csv_dir, "RI_TREE.csv"), "RI_TREE.csv")
        zf.writestr("RI_SEEDLING.csv", "CN\n1\n")  # not a needed table
    out = tmp_path / "out"
    out.mkdir()
    extracted = fia_src.unzip_csvs([str(zpath)], str(out))
    assert [os.path.basename(p) for p in extracted] == ["RI_TREE.csv"]
    assert not os.path.exists(out / "RI_SEEDLING.csv")


def test_run_states_writes_both_variants(spark, tmp_path):
    paths = state_pipeline.run_states(
        spark, spark_db(spark), str(tmp_path), estimate=True
    )
    midpt = spark.read.parquet(paths["annualized_midpt"])
    mortyr = spark.read.parquet(paths["annualized_mortyr"])
    assert {"plot_ID", "tree_ID", "YEAR", "DRYBIO_AG", "CARBON_AG"} <= set(
        midpt.columns
    )
    assert midpt.count() == mortyr.count() > 0
    # partitioned by STATECD, all state 44
    assert midpt.select("STATECD").distinct().collect()[0][0] == 44
    # the two variants genuinely differ where MORTYR is recorded (tree 2_7)
    key = ["tree_ID", "YEAR"]
    m = midpt.select(*key, F.col("STATUSCD").alias("s_mid")).join(
        mortyr.select(*key, F.col("STATUSCD").alias("s_mor")), key
    )
    assert m.filter(F.col("s_mid") != F.col("s_mor")).count() > 0


def test_csv_roundtrip_staging(spark, csv_dir, tmp_path):
    db = fia_src.fia_load(spark, ["RI"], csv_dir, tables=("PLOT", "TREE"))
    fia_src.csv_to_parquet(db, str(tmp_path / "stage"))
    staged = fia_src.load_staged(
        spark, str(tmp_path / "stage"), tables=("PLOT", "TREE")
    )
    assert staged["TREE"].count() == db["TREE"].count()
    assert dict(staged["TREE"].dtypes)["CN"] == "string"


class _FakeResponse:
    """Minimal urlopen response serving a byte string, honoring Range, with
    the Content-Range/Content-Length headers the resume validation reads."""

    def __init__(self, payload: bytes, start: int = 0, partial: bool = True):
        self._data = payload[start:] if partial else payload
        self.status = 206 if (start and partial) else 200
        self._pos = 0
        self.headers = {"Content-Length": str(len(self._data))}
        if self.status == 206:
            self.headers["Content-Range"] = (
                f"bytes {start}-{len(payload) - 1}/{len(payload)}"
            )

    def read(self, n: int) -> bytes:
        chunk = self._data[self._pos : self._pos + n]
        self._pos += len(chunk)
        return chunk

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _zip_payload(tag: str) -> bytes:
    """A real (validatable) zip archive as bytes — _fetch_zip now runs
    zipfile.is_zipfile on the completed download."""
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(f"{tag}.txt", f"payload-{tag}" * 100)
    return buf.getvalue()


def test_fia_download_concurrent_and_resume(tmp_path, monkeypatch):
    """Offline twin of the DataMart fetch: parallel states, Range resume of
    an interrupted .part, skip of complete zips (R/fia_download.R:77-96)."""
    import urllib.request

    payloads = {st: _zip_payload(st) for st in ("AA", "BB", "CC")}
    calls = []

    def fake_urlopen(req, timeout=0):
        url = req.full_url if hasattr(req, "full_url") else req
        st = url.split("/")[-1].split("_")[0]
        rng = req.headers.get("Range") if hasattr(req, "headers") else None
        start = int(rng.split("=")[1].rstrip("-")) if rng else 0
        calls.append((st, start))
        return _FakeResponse(payloads[st], start)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)

    d = str(tmp_path)
    # AA: pre-completed (must be skipped); BB: interrupted .part (must resume)
    with open(os.path.join(d, "AA_CSV.zip"), "wb") as f:
        f.write(payloads["AA"])
    with open(os.path.join(d, "BB_CSV.zip.part"), "wb") as f:
        f.write(payloads["BB"][:137])

    zips = fia_src.fia_download(["AA", "BB", "CC"], d, extract=False)
    assert [os.path.basename(z) for z in zips] == [
        "AA_CSV.zip", "BB_CSV.zip", "CC_CSV.zip"
    ]
    for st in ("AA", "BB", "CC"):
        with open(os.path.join(d, f"{st}_CSV.zip"), "rb") as f:
            assert f.read() == payloads[st]
    fetched = dict(calls)
    assert "AA" not in fetched  # skip-if-present
    assert fetched["BB"] == 137  # Range resume from the .part offset
    assert fetched["CC"] == 0


def test_fia_download_stale_part_restarts_clean(tmp_path, monkeypatch):
    """A .part left over from a superseded remote zip must be discarded,
    not spliced: the resume sends If-Range (the .part's mtime), an
    If-Range-aware server whose content changed replies 200 with the full
    new body, and the fetch must then write from byte 0."""
    import urllib.request

    new_payload = _zip_payload("NEWV")
    stale_prefix = b"OLD-VERSION-BYTES" * 10
    seen = {}

    def fake_urlopen(req, timeout=0):
        rng = req.headers.get("Range") if hasattr(req, "headers") else None
        seen["if_range"] = req.headers.get("If-range") or req.headers.get(
            "If-Range"
        )
        # remote changed after the .part's mtime: If-Range fails the
        # validator check, server ignores Range and replies 200 + full body
        if rng and seen["if_range"]:
            return _FakeResponse(new_payload, 0, partial=False)
        start = int(rng.split("=")[1].rstrip("-")) if rng else 0
        return _FakeResponse(new_payload, start)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    d = str(tmp_path)
    with open(os.path.join(d, "DD_CSV.zip.part"), "wb") as f:
        f.write(stale_prefix)

    fia_src.fia_download(["DD"], d, extract=False)
    assert seen["if_range"], "resume request must carry If-Range"
    with open(os.path.join(d, "DD_CSV.zip"), "rb") as f:
        got = f.read()
    # spliced output would start with the stale prefix; clean restart wins
    assert got == new_payload
    assert zipfile.is_zipfile(os.path.join(d, "DD_CSV.zip"))


def test_fia_download_rejects_corrupt_archive(tmp_path, monkeypatch):
    """A download whose bytes do not form a valid zip (connection dropped
    mid-chunk, server error page) must raise and remove the .part so the
    skip-if-present check can never treat it as complete."""
    import urllib.request

    junk = b"<html>not a zip</html>" * 50

    def fake_urlopen(req, timeout=0):
        return _FakeResponse(junk, 0)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    d = str(tmp_path)
    with pytest.raises(IOError, match="zip validation"):
        fia_src.fia_download(["EE"], d, extract=False)
    assert not os.path.exists(os.path.join(d, "EE_CSV.zip"))
    assert not os.path.exists(os.path.join(d, "EE_CSV.zip.part"))
