"""Multimodal column plumbing (LLM-pipeline extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side machinery — schemas, Arrow batch shapes,
``mapInPandas`` stage wiring, partition sizing — is real and tested;
the actual codec work is stubbed (pillow/ffmpeg are not in this
container) behind ``decode_image_batch``: pass ``fake=True`` for a
deterministic metadata synthesizer, ``fake=False`` raises
``NotImplementedError`` at the exact point a real decoder plugs in.

At 100 TB the pattern matters more than the codec: binaries ride a
parquet BINARY column, each ``mapInPandas`` batch is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (so executor memory
is safe regardless of blob sizes), and metadata extraction projects
only the columns it needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of a decoded media-metadata row.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)

BINARY_DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a synthetic binary payload column (UTF-8 bytes of the
    text) — the stand-in for reading real media blobs; everything
    downstream treats it as opaque bytes."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in decoder: derives plausible dimensions
    from the payload bytes. Replace with PIL/ffprobe in production."""
    n = len(payload)
    b0 = payload[0] if n else 0
    b1 = payload[1] if n > 1 else 0
    width = 64 + (b0 * 256 + b1) % 1024
    height = 64 + (b1 * 256 + b0) % 768
    channels = 1 + b0 % 3
    return width, height, channels, "fake/v1"


def decode_image_batch(
    batches: Iterator[pd.DataFrame], fake: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: (doc_id, payload) -> MEDIA_META_SCHEMA rows.

    Arrow delivers ``batches`` of bounded size; each batch is decoded
    vectorized-per-batch (loop is over rows *within* an Arrow batch,
    never a driver-side collect)."""
    for pdf in batches:
        if not fake:
            raise NotImplementedError(
                "real image decode requires pillow/ffmpeg; run with fake=True"
            )
        metas = [_fake_decode(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": pd.Series([m[0] for m in metas], dtype="int32"),
                "height": pd.Series([m[1] for m in metas], dtype="int32"),
                "channels": pd.Series([m[2] for m in metas], dtype="int32"),
                "format": [m[3] for m in metas],
            }
        )


def extract_media_metadata(df: DataFrame, fake: bool = True) -> DataFrame:
    """Run the decode stage over (doc_id, payload)."""
    from dss_nlp_ingestion_spark.catalog import ensure_parallelism

    binary = ensure_parallelism(df.select("doc_id", "payload"))
    return binary.mapInPandas(
        lambda it: decode_image_batch(it, fake=fake), schema=MEDIA_META_SCHEMA
    )


def frame_sample_offsets(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: evenly-spaced byte offsets into each
    payload (stand-in for video frame extraction) — pure column math,
    exploded to one row per sampled frame."""
    n_bytes = F.length(F.col("payload")).cast("long")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    out = df.select("doc_id", n_bytes.alias("n_bytes"), idx)
    return out.withColumn(
        "byte_offset",
        F.floor(F.col("frame_idx") * F.col("n_bytes") / float(n_frames)).cast("long"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_stub_batch(
    batches: Iterator[pd.DataFrame],
    width: int,
    height: int,
    fake: bool = True,
) -> Iterator[pd.DataFrame]:
    """mapInPandas resize stage: (doc_id, payload) -> fixed-size
    payloads.  The fake path cycles the source bytes to exactly
    width*height bytes (deterministic, size-exact — the real
    PIL.Image.resize plugs in at the NotImplementedError).  The
    Spark-side contract is what's real: binary in, binary out, bounded
    Arrow batches, output size decoupled from input size."""
    target = width * height
    for pdf in batches:
        if not fake:
            raise NotImplementedError(
                "real image resize requires pillow; run with fake=True"
            )
        out = []
        for p in pdf["payload"]:
            b = bytes(p) or b"\x00"
            reps = (target // len(b)) + 1
            out.append((b * reps)[:target])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": out,
                "width": pd.Series([width] * len(out), dtype="int32"),
                "height": pd.Series([height] * len(out), dtype="int32"),
            }
        )


def resize_media(
    df: DataFrame, width: int = 64, height: int = 48, fake: bool = True
) -> DataFrame:
    """Run the resize stage over (doc_id, payload)."""
    from dss_nlp_ingestion_spark.catalog import ensure_parallelism

    binary = ensure_parallelism(df.select("doc_id", "payload"))
    return binary.mapInPandas(
        lambda it: resize_stub_batch(it, width, height, fake=fake),
        schema=RESIZED_SCHEMA,
    )


N_HIST_BINS = 8

MEDIA_FEATURE_SCHEMA = StructType(
    [StructField("doc_id", LongType())]
    + [StructField(f"f{i}", LongType()) for i in range(N_HIST_BINS)]
)


def byte_histogram_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature-extraction stage: 8-bin byte-value histogram per
    payload (bin = byte >> 5) — the deterministic stand-in for a real
    image/audio feature extractor, vectorized with numpy inside each
    Arrow batch."""
    import numpy as np

    for pdf in batches:
        feats = np.zeros((len(pdf), N_HIST_BINS), dtype="int64")
        for row_i, p in enumerate(pdf["payload"]):
            arr = np.frombuffer(bytes(p), dtype=np.uint8)
            if arr.size:
                feats[row_i] = np.bincount(arr >> 5, minlength=N_HIST_BINS)
        out = {"doc_id": pdf["doc_id"].astype("int64")}
        for i in range(N_HIST_BINS):
            out[f"f{i}"] = feats[:, i]
        yield pd.DataFrame(out)


def media_byte_features(df: DataFrame) -> DataFrame:
    """Run the feature-extraction stage over (doc_id, payload)."""
    from dss_nlp_ingestion_spark.catalog import ensure_parallelism

    binary = ensure_parallelism(df.select("doc_id", "payload"))
    return binary.mapInPandas(byte_histogram_batch, schema=MEDIA_FEATURE_SCHEMA)
