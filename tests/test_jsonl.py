"""Unit tests for the JSONL source/sink contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from foresttime_builder_spark.sources.jsonl import read_jsonl, write_jsonl

SCHEMA = "doc_id bigint, text string"


def test_roundtrip_exact(spark, tmp_path):
    rows = [(1, 'quotes " and \\ backslash'), (2, "uniécode ✓"), (3, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "docs")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_failfast_on_corrupt(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "part-0.json").write_text('{"doc_id": 1, "text": "ok"}\nnot json\n')
    with pytest.raises(Exception, match="FAILFAST|Malformed|corrupt"):
        read_jsonl(spark, str(d), SCHEMA).collect()


def test_permissive_quarantines_corrupt(spark, tmp_path):
    d = tmp_path / "bad2"
    d.mkdir()
    (d / "part-0.json").write_text('{"doc_id": 1, "text": "ok"}\nnot json\n')
    out = read_jsonl(spark, str(d), SCHEMA, permissive=True)
    good = out.filter(F.col("_corrupt").isNull()).collect()
    bad = out.filter(F.col("_corrupt").isNotNull()).collect()
    assert len(good) == 1 and good[0]["doc_id"] == 1
    assert len(bad) == 1 and bad[0]["_corrupt"] == "not json"


def test_write_is_sharded(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    ).repartition(4)
    path = str(tmp_path / "sharded")
    write_jsonl(df, path)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 4
