"""Pinned-semantics tests for ``operators/text.line_dedup`` (q123).

Cross-document line dedup (the RefinedWeb/Falcon curation step): drop every
occurrence of any line whose distinct-document frequency exceeds the
threshold, reassemble each document from surviving lines in original order.
Edge contract pinned here:

- within-document repeats are NOT cross-corpus boilerplate → kept (all
  copies), and a within-doc repeat still counts the doc once toward df;
- dropping removes EVERY occurrence (no canonical survivor);
- NULL text → NULL clean_text, zero counts, row survives;
- a doc whose every line is boilerplate keeps EMPTY ('' not NULL)
  clean_text;
- empty split fragments are real lines.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from foresttime_builder_spark.operators.text import (
    line_dedup,
    line_dedup_oracle_sql,
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = line_dedup(df, "doc_id", "text", **kw).toPandas()
    return out.set_index("doc_id").sort_index()


def test_basic_boilerplate_dropped(spark):
    out = _run(
        spark,
        [
            ("a", "HEADER\nkeep a1\nkeep a2"),
            ("b", "HEADER\nkeep b1"),
            ("c", "only c"),
        ],
    )
    assert out.loc["a", "clean_text"] == "keep a1\nkeep a2"
    assert out.loc["b", "clean_text"] == "keep b1"
    assert out.loc["c", "clean_text"] == "only c"
    assert int(out.loc["a", "n_dropped"]) == 1
    assert int(out.loc["b", "n_kept"]) == 1


def test_within_doc_repeat(spark):
    out = _run(
        spark,
        [("a", "dup\nmid\ndup"), ("b", "other")],
    )
    assert out.loc["a", "clean_text"] == "dup\nmid\ndup"
    assert int(out.loc["a", "n_kept"]) == 3
    # but a within-doc repeat that ALSO appears in another doc is dropped
    # everywhere, every copy:
    out2 = _run(spark, [("a", "dup\nmid\ndup"), ("b", "dup")])
    assert out2.loc["a", "clean_text"] == "mid"
    assert int(out2.loc["a", "n_dropped"]) == 2
    assert out2.loc["b", "clean_text"] == ""
    assert int(out2.loc["b", "n_dropped"]) == 1


def test_null_and_all_dropped(spark):
    out = _run(
        spark,
        [("a", None), ("b", "X"), ("c", "X")],
    )
    assert pd.isna(out.loc["a", "clean_text"])
    assert int(out.loc["a", "n_kept"]) == 0 and int(out.loc["a", "n_dropped"]) == 0
    # b and c are entirely boilerplate → empty string, not NULL
    assert out.loc["b", "clean_text"] == ""
    assert out.loc["c", "clean_text"] == ""


def test_empty_fragments_are_lines(spark):
    # both docs end in the delimiter → shared trailing empty line → dropped
    out = _run(spark, [("a", "ka\n"), ("b", "kb\n")])
    assert out.loc["a", "clean_text"] == "ka"
    assert int(out.loc["a", "n_dropped"]) == 1


def test_max_doc_freq_threshold(spark):
    rows = [("a", "L\nxa"), ("b", "L\nxb"), ("c", "L\nxc")]
    # df("L") = 3 > 2 → dropped at threshold 2, kept at threshold 3
    out2 = _run(spark, rows, max_doc_freq=2)
    assert out2.loc["a", "clean_text"] == "xa"
    out3 = _run(spark, rows, max_doc_freq=3)
    assert out3.loc["a", "clean_text"] == "L\nxa"


def test_duckdb_twin_parity(spark):
    rows = [
        ("a", "HEADER\nkeep a1\ndup\ndup"),
        ("b", "HEADER\nkeep b1\n"),
        ("c", None),
        ("d", "dup"),
        ("e", ""),
        ("f", "tail\n"),
    ]
    got = _run(spark, rows).reset_index()
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    want = (
        con.execute(line_dedup_oracle_sql("doc_id", "text", "documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for col in got.columns:
        g, w = got[col], want[col]
        assert ((g == w) | (g.isna() & w.isna())).all(), (col, g, w)
