"""The partitioned-sink readback must prune partitions, not filter rows."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def test_partition_pruning_reaches_the_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", f"t{i}") for i in range(20)],
        "doc_id long, lang string, text string",
    )
    path = str(tmp_path / "part")
    df.write.partitionBy("lang").parquet(path)
    r = spark.read.parquet(path).filter(F.col("lang") == "en")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        r.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "lang" in plan

    assert r.count() == 10
    # the en partition directory is read; de rows never materialize
    assert {row["lang"] for row in r.select("lang").distinct().collect()} == {"en"}
