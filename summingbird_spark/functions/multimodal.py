"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (per the north star): media rides in ``binary`` columns with a
sibling metadata struct; decode / feature-extract / resize / frame-sample
are Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-at-a-time. The actual codecs (PIL/librosa/ffmpeg) are NOT in
this container, so the decode kernels are STUBS behind ``decoder=``:
``"fake"`` is a deterministic featureless decoder (checksum + length +
byte histogram head) that keeps the plumbing — schemas, batch shapes,
partitioning — real and testable; ``"pil"``/``"librosa"`` raise
NotImplementedError with the exact dependency needed.

Scale notes: binary payloads dominate row size — keep them out of shuffle
(extract features first, then drop the bytes), size
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits in
executor memory, and never collect() a blob column.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "payload binary, meta struct<mime string, width int, height int, duration_ms long>"

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, head string"
)


def pack_media(df: DataFrame, bytes_col: str, mime: str) -> DataFrame:
    """Wrap a binary column into the canonical (payload, meta) pair."""
    return df.withColumn("payload", F.col(bytes_col)).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_features(payload: bytes) -> dict:
    return {
        "n_bytes": len(payload),
        "checksum": hashlib.md5(payload).hexdigest(),
        "head": payload[:8].hex(),
    }


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """mapInPandas feature extraction; output drops the payload so bytes
    never shuffle."""
    if decoder == "fake":
        decode = _fake_features
    elif decoder in ("pil", "image"):
        raise NotImplementedError(
            "image decode needs Pillow; install PIL and implement decode -> "
            "(width, height, channels, resized thumbnail features)"
        )
    elif decoder in ("librosa", "audio"):
        raise NotImplementedError(
            "audio decode needs librosa/soundfile; implement decode -> "
            "(sample_rate, duration_ms, mfcc head)"
        )
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
    frame_len: int = 8,
) -> DataFrame:
    """Deterministic 'frame sampling' stand-in: slice the payload every N
    bytes (the video-frame-sampling plumbing: one input row → many frame
    rows, schema ``(id, frame_no, frame_bytes)``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                for no, off in enumerate(range(0, len(p), every_n_bytes)):
                    ids.append(i)
                    nos.append(no)
                    frames.append(p[off : off + frame_len])
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame_bytes": frames})

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, frame_no int, frame_bytes binary"
    )
