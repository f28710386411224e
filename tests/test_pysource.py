"""Custom Python DataSource contract: determinism, partition fan-out,
row-range coverage, and option validation."""

from __future__ import annotations

import hashlib

import pytest

from foresttime_builder_spark.sources.pysource import (
    _SyntheticDocsReader,
    register_synthetic_source,
)


def _read(spark, n_rows, n_parts=4):
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("n_rows", n_rows)
        .option("n_partitions", n_parts)
        .load()
    )


def test_rows_deterministic_and_complete(spark):
    rows = {r["doc_id"]: (r["lang"], r["score"]) for r in _read(spark, 50).collect()}
    assert set(rows) == set(range(50))
    for i in (0, 7, 49):
        h = int(hashlib.md5(f"syn:{i}".encode()).hexdigest()[:15], 16)
        assert rows[i] == (["en", "de", "es", "fr", "zh"][h % 5], h % 1000)


def test_partition_fanout_preserves_coverage(spark):
    a = sorted(r["doc_id"] for r in _read(spark, 100, n_parts=1).collect())
    b = sorted(r["doc_id"] for r in _read(spark, 100, n_parts=7).collect())
    assert a == b == list(range(100))


def test_reader_partitions_cover_range_without_overlap():
    r = _SyntheticDocsReader({"n_rows": "10", "n_partitions": "3"})
    spans = [(p.start, p.end) for p in r.partitions()]
    covered = [i for s, e in spans for i in range(s, e)]
    assert sorted(covered) == list(range(10))
    assert len(covered) == len(set(covered))


def test_option_validation():
    with pytest.raises(ValueError, match="bad options"):
        _SyntheticDocsReader({"n_rows": "-1"})
    with pytest.raises(ValueError, match="bad options"):
        _SyntheticDocsReader({"n_partitions": "0"})
