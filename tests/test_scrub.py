"""Unit tests for corpus-hygiene operators (scrub.py, runtime_filter.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from foresttime_builder_spark.operators.runtime_filter import semi_reduced_join
from foresttime_builder_spark.operators.scrub import (
    canonicalize_url,
    domain_cap,
    pii_scrub,
)


def test_pii_scrub_counts_and_masks(spark):
    rows = [
        (1, "write to a.b_c%d+e@mail3.example.com or x@y.io today"),
        (2, "server at 10.22.0.44 and 192.168.1.1, build 1.2.3"),
        (3, "call 555-0012 or 555-9999 re invoice 12-3456789"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(df, "doc_id", "text").collect()}

    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 0, 0)
    # 1.2.3 is not a dotted quad; 12-3456789 is not a phone shape
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 2, 0)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 2)
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)

    import hashlib

    masked = "write to <EMAIL> or <EMAIL> today"
    assert out[1]["clean_len"] == len(masked)
    assert out[1]["clean_md5"] == hashlib.md5(masked.encode()).hexdigest()
    assert out[4]["clean_len"] == len(rows[3][1])


def test_canonicalize_url(spark):
    rows = [
        (1, "https://www.site1.example.com/p/42?utm_source=x&ref=y"),
        (2, "http://site2.example.com/a/b#frag"),
        (3, "https://site3.example.com/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r.asDict() for r in canonicalize_url(df, "url").collect()}
    assert out[1]["canon_url"] == "site1.example.com/p/42"
    assert out[1]["host"] == "site1.example.com"
    assert out[2]["canon_url"] == "site2.example.com/a/b"
    assert out[3]["canon_url"] == "site3.example.com/"
    assert out[3]["host"] == "site3.example.com"


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # one head host with 200 rows, many tail hosts with 3 each
    head = [(i, "head.example.com", 1000 - i) for i in range(200)]
    tail = [
        (1000 + h * 10 + j, f"tail{h}.example.com", 10 + j)
        for h in range(20)
        for j in range(3)
    ]
    return spark.createDataFrame(
        head + tail, "doc_id long, host string, quality long"
    )


def test_domain_cap_caps_and_ranks(skewed_docs):
    out = domain_cap(
        skewed_docs,
        "host",
        [F.col("quality").desc(), F.col("doc_id").asc()],
        cap=5,
    ).collect()
    by_host: dict[str, list] = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["head.example.com"]) == 5
    # highest quality (=1000-doc_id, so smallest doc_id) wins rank 1
    best = min(by_host["head.example.com"], key=lambda r: r["rank_in_domain"])
    assert best["doc_id"] == 0 and best["rank_in_domain"] == 1
    for h, rows in by_host.items():
        assert len(rows) <= 5
        assert sorted(r["rank_in_domain"] for r in rows) == list(
            range(1, len(rows) + 1)
        )


def test_domain_cap_two_stage_identical(skewed_docs):
    order = [F.col("quality").desc(), F.col("doc_id").asc()]
    single = domain_cap(skewed_docs, "host", order, cap=5)
    double = domain_cap(
        skewed_docs,
        "host",
        order,
        cap=5,
        two_stage=True,
        n_salts=7,
        salt_on=F.col("doc_id"),
    )
    key = lambda r: (r["host"], r["rank_in_domain"])
    assert sorted(map(tuple, single.collect())) == sorted(
        map(tuple, double.collect())
    )


def test_domain_cap_two_stage_requires_salt(skewed_docs):
    with pytest.raises(ValueError, match="salt_on"):
        domain_cap(
            skewed_docs, "host", [F.col("doc_id")], cap=2, two_stage=True
        )


def test_semi_reduced_join_matches_plain_join(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 400).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 50).select(
        (F.col("id") * 7).alias("dk"), (F.col("id") + 100).alias("dv")
    )
    plain = fact.join(dim, F.col("k") == F.col("dk"), "inner")
    # tiny bucket space forces real false positives through the pre-filter
    reduced = semi_reduced_join(fact, dim, "k", "dk", n_buckets=16)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, reduced.collect())
    )


def test_semi_reduced_join_rejects_outer(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="left"):
        semi_reduced_join(df, df, "k", "k", how="left")
