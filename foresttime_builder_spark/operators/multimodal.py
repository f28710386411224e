"""Multimodal (image/audio/video) column handling for training-data pipelines.

Convention: media travels as an opaque ``binary`` payload column plus typed
metadata columns; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages so the bytes never round-trip
through JVM row objects.

The actual codecs (PIL / torchaudio / ffmpeg) are NOT available in this
environment, so the decode step is pluggable:

- ``impl="real"`` raises :class:`NotImplementedError` with the integration
  point documented — the Spark-side plumbing (schema, batching, partition
  sizing) is exactly what a real decoder plugs into;
- ``impl="fake"`` derives deterministic pseudo-features from the payload's
  md5 digest, which keeps the distributed plumbing testable end-to-end and
  oracle-checkable (DuckDB computes the same digest math in SQL).

Scale notes: ``mapInPandas`` streams Arrow batches, so peak memory is
``batch size × payload size``, not partition size; callers control batch
size with ``spark.sql.execution.arrow.maxRecordsPerBatch`` and should
repartition by a size-balancing key when payloads are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

N_FEATURES = 8

FEATURES_SCHEMA = (
    "doc_id bigint, byte_len int, thumb_hash string, features array<double>"
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload column from text (the testdata has no
    real media; production data arrives with the payload already binary)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for an image decode + feature extraction:
    8 pseudo-features from the md5 digest of the payload, plus the md5 of
    the first 256 bytes as a 'thumbnail' content hash."""
    feats, thumbs, lens = [], [], []
    for payload in batch["payload"]:
        b = bytes(payload)
        digest = hashlib.md5(b).hexdigest()
        feats.append(
            [int(digest[2 * j : 2 * j + 2], 16) / 255.0 for j in range(N_FEATURES)]
        )
        thumbs.append(hashlib.md5(b[:256]).hexdigest())
        lens.append(len(b))
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "byte_len": lens,
            "thumb_hash": thumbs,
            "features": feats,
        }
    )


def decode_features(df: DataFrame, impl: str = "fake") -> DataFrame:
    """Arrow-batched decode/feature-extract over the ``payload`` column."""
    if impl == "real":
        raise NotImplementedError(
            "real decoders (PIL/torchaudio/ffmpeg) are not installed in this "
            "environment; plug the decoder into _fake_decode's position — the "
            "mapInPandas batching, schema, and partitioning are identical"
        )
    if impl != "fake":
        raise ValueError(f"unknown impl {impl!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _fake_decode(batch)

    return df.select("doc_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame, chunk: int = 1024, every: int = 4
) -> DataFrame:
    """'Video frame sampling' over the payload: split into fixed ``chunk``
    byte frames, keep every ``every``-th, return per-frame content hashes —
    pure Column algebra (no UDF), demonstrating media chunk manipulation
    JVM-side."""
    payload = F.col("payload")
    n_frames = F.ceil(F.octet_length(payload) / F.lit(chunk)).cast("int")
    frame_ids = F.filter(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: i % every == 0,
    )
    hashes = F.transform(
        frame_ids,
        lambda i: F.md5(
            F.substring(payload, (i * chunk + 1).cast("int"), chunk)
        ),
    )
    return df.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.size(frame_ids).alias("n_sampled"),
        hashes.alias("frame_hashes"),
    )
