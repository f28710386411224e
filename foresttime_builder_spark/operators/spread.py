"""Round-robin redistribution for CPU-dense narrow scans.

Spark sizes scan parallelism by INPUT BYTES; operators whose per-row work
is orders of magnitude above their per-row bytes (pair verification,
n-gram explosion, window inventories) can therefore arrive as 1-2 splits
on a 32-core session and run single-threaded (measured: q40's sf1 verify
32 s on 1 of 32 cores; q59/q63/q64's gram explosion at sf0.1).  ``spread``
repartitions such a side up to the session parallelism — the added
linear shuffle is negligible next to the dense work, and at production
scale the scan already has >= parallelism splits, making this a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism if its
    current plan yields fewer partitions; identity otherwise."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
