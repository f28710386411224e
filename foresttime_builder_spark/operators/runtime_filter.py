"""Semi-join reduction ("runtime filter") for shuffle joins.

The pattern Spark's own runtime bloom-filter optimization applies when a
selective dimension feeds a shuffle join (``spark.sql.optimizer.runtime.
bloomFilter.enabled``), made explicit as a reusable operator so a pipeline
can apply it where the optimizer's cost model declines to: before
shuffling a 100 TB fact table to join a filtered dimension, broadcast the
dimension's *hash-bucket set* (a 1-hash Bloom filter: tiny, duplicate-free
regardless of dimension width) and drop fact rows whose key bucket is
absent.  False positives pass the pre-filter and are removed by the exact
join; false negatives are impossible — so the result is byte-identical to
the plain join while the fact-side exchange shrinks by the dimension's
selectivity.

The oracle twin for any query built on this operator is therefore the
PLAIN SQL join — the gate proves the reduction is semantics-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(col: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


def semi_reduced_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_buckets: int = 1 << 20,
    how: str = "inner",
) -> DataFrame:
    """``fact JOIN dim ON fact_key = dim_key`` with a broadcast
    bucket-set pre-filter on the fact side.

    ``n_buckets`` trades false-positive rate against broadcast size: the
    bucket set is at most ``n_buckets`` longs (8 MB at the default) and at
    most ``|dim|`` entries, whichever is smaller.  ``how`` must be a join
    type that only *keeps* fact rows matching the dimension (``inner`` /
    ``left_semi``) — for outer joins a pre-filter would change results.
    """
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(f"semi_reduced_join cannot pre-filter a {how!r} join")
    # dataframe-qualified refs: fact and dim may share the key column name
    # (AMBIGUOUS_REFERENCE with bare F.col), and a uuid-suffixed bucket
    # column cannot collide with a caller's own columns.
    bucket_col = "_rf_bucket_7f3a9c"
    buckets = (
        dim.select(_bucket(dim[dim_key], n_buckets).alias(bucket_col))
        .distinct()
    )
    reduced = fact.join(
        F.broadcast(buckets),
        _bucket(fact[fact_key], n_buckets) == buckets[bucket_col],
        "left_semi",
    )
    return reduced.join(dim, reduced[fact_key] == dim[dim_key], how)
