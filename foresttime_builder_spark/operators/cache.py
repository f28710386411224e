"""Cache-lifetime helper shared by operators that persist() intermediates."""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def release_on_gc(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` frames when ``result`` is garbage-collected.

    Operators persist() intermediate relations that feed several plan
    branches; the cache must outlive the *returned* lazy plan, so it cannot
    be released inside the builder.  Tying release to the result's lifetime
    means a long-lived session looping many invocations (the correctness
    gate, a service) frees each query's storage blocks as soon as its result
    is dropped, instead of accumulating until executor storage is exhausted.
    If the result is dropped before execution the plan merely recomputes — a
    perf hiccup, never a correctness issue.
    """
    jdfs = [c._jdf for c in cached]

    def _release(jdfs=jdfs):
        for j in jdfs:
            try:
                j.unpersist(False)
            except Exception:
                pass  # session already stopped / JVM gone

    weakref.finalize(result, _release)
    return result
