"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload travels as a
``binary`` column next to typed metadata; decode / feature-extraction
runs as Arrow-batched ``mapInPandas`` over partitions — the batch shape,
schemas and partitioning here are the real thing.

The actual media decoding is STUBBED: this container has no image/audio
libraries, so :func:`decode_features` uses a clearly-marked
deterministic fake decoder (md5/length-derived features). Swapping in a
real decoder (PIL/librosa/ffmpeg) changes only the marked function body
— not the Spark plumbing, which is what these operators exercise.

Arrow batch sizing (measured, ``tools/arrow_batch_sweep.py`` at 100k
payload rows): the per-batch fixed cost is ~2 ms — 500-row batches run
2× slower than the 10000-row default, and 50000 gains only ~7% more.
Keep the default ``spark.sql.execution.arrow.maxRecordsPerBatch`` for
metadata-sized payloads; for real media (MB-scale payloads) the BYTES
bound worker memory, so set maxRecordsPerBatch ≈ target_batch_bytes /
avg_payload_bytes (e.g. 64 MB / 2 MB ≈ 32 rows) — row count is the
only knob Spark exposes here.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor (decode stage contract).
FEATURE_SCHEMA = (
    "doc_id long, media_type string, byte_len long, width int, height int,"
    " checksum string"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a multimodal relation from a text table: payload =
    utf-8 bytes (standing in for image/audio bytes), plus typed
    metadata columns. At scale the payload column would come from a
    binary-file source (``spark.read.format('binaryFile')``) or
    pre-packed parquet/sequence files."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """DETERMINISTIC FAKE DECODER (stub — no media libs in this
    environment). Derives plausible features from the bytes alone:
    byte length, fake width/height, content checksum. A real
    implementation would decode pixels/samples here."""
    n = len(payload)
    return n, n % 64 + 1, (n // 64) % 64 + 1, hashlib.md5(payload).hexdigest()


def decode_features(df: DataFrame) -> DataFrame:
    """Feature-extract every payload via Arrow-batched ``mapInPandas``
    (the UDF-boundary pattern all real decoders use): per-partition
    iterator of pandas batches in, feature batches out — no
    row-at-a-time serialization, no driver involvement."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": feats.map(lambda t: t[0]),
                    "width": feats.map(lambda t: t[1]),
                    "height": feats.map(lambda t: t[2]),
                    "checksum": feats.map(lambda t: t[3]),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling stub: split the payload into
    ``n_frames`` equal byte slices ("frames") and checksum each —
    demonstrating the explode-per-frame shape a real frame sampler
    produces. Built-in expressions only (no UDF): substring on binary."""
    return df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                # integer `div` (not cast-of-double-division): Spark's
                # double→int cast truncates while other engines round
                f"transform(sequence(0, {n_frames - 1}), i -> "
                f"md5(substring(payload, (i * octet_length(payload)) div {n_frames} + 1,"
                f" octet_length(payload) div {n_frames})))"
            )
        ).alias("frame_idx", "frame_checksum"),
    )
