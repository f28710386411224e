"""Structured Streaming operators over the event stream.

The reference is batch-only (SURVEY §2.9), so this module is part of the
engine's beyond-parity surface: the same event analytics users run in batch,
expressed as incremental streaming plans.

- :func:`read_event_stream`: file-source ``readStream`` over the events
  parquet (schema pinned; nano timestamps converted exactly as the batch
  reader does);
- :func:`windowed_rollup`: tumbling-window aggregate with a watermark for
  late data — the canonical streaming shuffle aggregation;
- :func:`sessionized`: session windows (gap-based) per user;
- :func:`running_user_totals`: custom stateful operator via
  ``applyInPandasWithState`` — running per-user totals with explicit state,
  the pattern for stateful logic Spark's built-ins can't express;
- :func:`run_to_memory`: drive any of the above to a memory sink with
  ``availableNow`` (process-everything-then-stop) and return the result as a
  DataFrame — this is how the batch-differential tests and the correctness
  harness consume streaming results.

Scale notes: watermarks bound state (windows older than the watermark are
evicted); the stateful operator keys state by user_id so it scales with
|users|, not |events|; file sources at production scale become Kafka sources
with identical downstream plans.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: logical schema of the events parquet minus ``ts``, whose physical type has
#: varied across testdata generations (INT64 TIMESTAMP(NANOS) vs timestamp[us])
_EVENTS_SCHEMA_BASE = "event_id bigint, user_id bigint, event_type string, value double"


def read_event_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over the events parquet.

    readStream needs a pinned schema, but the physical type of ``ts`` depends
    on how the parquet was written: older testdata stored INT64 nanos
    (surfacing as LongType under ``nanosAsLong``), current testdata stores a
    proper ``timestamp[us]``. Probe the footer with a batch read (cheap,
    metadata-only) and mirror :func:`..sources.readers.load_table`'s guard:
    apply the nanos→timestamp conversion only when the column is physically
    a long.

    ``glob`` selects the files within ``sf_dir`` (default: the single
    testdata events file).  ``max_files_per_trigger`` bounds each
    micro-batch to N source files — with a time-chunked multi-file layout
    this is how the differential tests force a genuinely incremental
    multi-batch execution instead of one catch-all batch.
    """
    batch_ts = (
        spark.read.option("pathGlobFilter", glob)
        .parquet(sf_dir)
        .schema["ts"]
        .dataType
    )
    ts_is_long = isinstance(batch_ts, T.LongType)
    schema = _EVENTS_SCHEMA_BASE + (", ts bigint" if ts_is_long else ", ts timestamp")
    # file-source streams take a directory; glob selects the member files
    reader = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.load(sf_dir)
    if ts_is_long:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def windowed_rollup(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-event-type rollup with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


_STATE_SCHEMA = "total double, n bigint"
_TOTALS_OUT = "user_id bigint, total double, n bigint"


def _totals_fn(key, pdfs, state: GroupState):
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].fillna(0.0).sum())
        n += int(len(pdf))
    state.update((total, n))
    yield pd.DataFrame({"user_id": [key[0]], "total": [round(total, 4)], "n": [n]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user value totals + event counts
    via ``applyInPandasWithState`` (state = one (total, n) pair per user)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event dedup by event_id within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark``, NOT plain ``dropDuplicates``:
    with the event-time column absent from the dedup keys, plain
    ``dropDuplicates`` keeps one state row per event_id FOREVER — at
    100 TB/day the state store grows with the full keyspace and the job
    eventually drowns in state checkpointing.  The WithinWatermark
    variant evicts a key's state once the watermark passes its event
    time, so steady-state size is (keys arriving per watermark horizon),
    independent of stream lifetime — the bound
    ``tests/test_streaming.py::test_dedup_stream_state_is_bounded``
    asserts across a replay many horizons long.  Contract difference: a
    duplicate arriving MORE than ``watermark`` after its first delivery
    is re-emitted — at-least-once sources redeliver within seconds to
    minutes, so size the watermark to the source's redelivery horizon,
    not to zero.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def purchase_attribution(
    events: DataFrame, horizon: str = "2 days", watermark: str = "4 days"
) -> DataFrame:
    """Stream-stream interval join: each purchase joins the clicks from the
    same user in the preceding ``horizon`` (state on both sides bounded by
    watermarks + the time-range predicate)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("purchase_id", "user_id", "click_id", "click_ts", "purchase_ts")


def purchase_attribution_outer(
    events: DataFrame, horizon: str = "2 days", watermark: str = "4 days"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: like
    :func:`purchase_attribution`, but purchases with NO qualifying click
    are also emitted (click columns NULL) — the semantics that needs the
    watermark to PASS before an unmatched row can be declared final.
    With an availableNow run the trailing no-data micro-batch advances
    the watermark past ``max(ts) - watermark``, so unmatched purchases up
    to that cutoff are flushed; rows inside the final watermark window
    stay in state (consumers must apply the cutoff — the q108 gate does,
    identically on the batch oracle side)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "left_outer",
    ).select("purchase_id", "user_id", "click_id", "click_ts", "purchase_ts")


def _upsert_current_dir(path: str) -> str | None:
    """Resolve the committed version directory of an upsert table, or None
    if no commit has happened yet."""
    pointer = os.path.join(path, "CURRENT")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        return os.path.join(path, fh.read().strip())


def read_upsert_table(spark: SparkSession, path: str) -> DataFrame:
    """Read the current committed snapshot of a table maintained by
    :func:`run_foreach_batch_upsert`."""
    current = _upsert_current_dir(path)
    if current is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    return spark.read.parquet(current)


def run_foreach_batch_upsert(
    events: DataFrame,
    path: str,
    keys: tuple[str, ...] = ("user_id",),
    version_col: str = "ts",
    tie_break: tuple[str, ...] = ("event_id",),
    checkpoint_dir: str | None = None,
) -> None:
    """Incrementally materialize the latest row per key into a parquet
    table: every micro-batch MERGEs into the table via
    ``operators.upsert.merge_latest`` — the streaming analog of the
    reference's overwrite-and-rerun refresh (``scripts/state-parquet.R``),
    with the whole-table overwrite narrowed to a key-level upsert.

    Plain parquet has no transactions, so the table lives behind a
    ``CURRENT`` pointer file: each merge writes a fresh versioned directory
    and the commit is ONE atomic rename of the pointer's temp file — there
    is no window in which the table is missing (the two-rename swap this
    replaces had one).  The PREVIOUS version directory is retained for one
    commit (only N-2 and older are deleted), so a reader that resolved the
    old pointer just before a commit can still finish its scan; a reader
    must not lag by more than one full commit.  This is the poor-man's
    snapshot commit a
    transactional format (Delta/Iceberg) provides natively; the merge plan
    itself (one shuffle per batch on the business key) is identical there.
    Runs with ``availableNow`` and blocks until the source is drained.
    Pass ``checkpoint_dir`` (persistent) for cross-restart idempotency —
    the default tempdir only dedups replayed batches within one invocation.
    Read the table back with :func:`read_upsert_table`.
    """
    import shutil

    from foresttime_builder_spark.operators.upsert import merge_latest

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = _upsert_current_dir(path)
        if current is not None:
            base = spark.read.parquet(current)
        else:
            base = batch_df.limit(0)
        merged = merge_latest(base, batch_df, keys, version_col, tie_break)
        os.makedirs(path, exist_ok=True)
        staging = os.path.join(path, f"v{batch_id}-{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(staging)  # reads old version
        pointer_tmp = os.path.join(path, f".CURRENT.tmp-{batch_id}")
        with open(pointer_tmp, "w") as fh:
            fh.write(os.path.basename(staging))
        os.rename(pointer_tmp, os.path.join(path, "CURRENT"))  # atomic commit
        # GC: keep the new version AND the one it replaced (a reader that
        # resolved the old pointer pre-commit can still be mid-scan); only
        # N-2 and older go.
        keep = {staging, current} - {None}
        for entry in os.listdir(path):
            full = os.path.join(path, entry)
            if (
                os.path.isdir(full)
                and entry.startswith("v")
                and full not in keep
            ):
                shutil.rmtree(full)

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_upsert_")
    q = (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(
    streaming_df: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
) -> DataFrame:
    """Execute a streaming plan to completion (``availableNow``) into a
    memory sink and return the materialized result."""
    spark = streaming_df.sparkSession
    name = name or f"stream_{uuid.uuid4().hex[:10]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_to_parquet(
    streaming_df: DataFrame,
    name: str | None = None,
    out_dir: str | None = None,
) -> DataFrame:
    """Execute a streaming plan to completion (``availableNow``) into a
    PARQUET sink and return the read-back frame.

    The memory-sink twin (:func:`run_to_memory`) materializes every
    output row in the DRIVER — a collect in disguise that scales with
    output volume: q96's 10M deduped rows GC-spiraled an 8 GB single-JVM
    session for 77 minutes before killing the SparkContext at sf10
    (measured in rounds 10 and 11).  The parquet sink keeps every output
    row executor-side; the returned frame is a lazy scan, so downstream
    consumers (gate collect at sf0.01, noop sink at sf10) pay only what
    they ask for.  Append-mode only — which is the only mode a
    row-scale-output stream should use anyway (complete mode re-emits
    the whole result per batch)."""
    spark = streaming_df.sparkSession
    name = name or f"stream_{uuid.uuid4().hex[:10]}"
    # default-created dirs are registered for process-exit cleanup: at q96's
    # output scale (10M rows at sf10) leaked sinks accumulate in /tmp — the
    # same filesystem derive_candidate_budget sizes budgets from, so leaks
    # would silently shrink later runs' budgets.  A caller-passed out_dir is
    # the caller's to manage (the returned frame lazily re-reads it, so it
    # must outlive this call); the checkpoint dir is always ours to reap.
    if out_dir is None:
        out = tempfile.mkdtemp(prefix=f"sink_{name}_")
        atexit.register(shutil.rmtree, out, ignore_errors=True)
    else:
        out = out_dir
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    q = (
        streaming_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # explicit schema: an all-late/empty stream leaves no footer to infer
    return spark.read.schema(streaming_df.schema).parquet(out)
