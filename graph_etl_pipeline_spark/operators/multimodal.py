"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque binary columns (driver north-star).

The execution pattern is the REAL deliverable: Arrow-batched
mapInPandas iterators with schemas declared up front, operating on
`binary` blobs + typed metadata structs. The codec bodies are gated —
`PIL`/`av` are not in this container, so decode raises a clearly-marked
NotImplementedError unless the library is importable, while
`fake_features`/`sample_frames` are deterministic stand-ins that keep the
plumbing testable end-to-end. Swapping a stub for the real codec changes
only the function body; the Spark plan, partitioning, and schema are
already production-shaped.

Batch sizing note for 100 TB: media blobs are large — set
spark.sql.execution.arrow.maxRecordsPerBatch (and files.maxPartitionBytes)
so one Arrow batch of blobs fits executor memory; the iterator interface
processes a partition as a stream of bounded batches, never materializing
the partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real image codec, if present
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_head int"
FEATURE_SCHEMA = "doc_id bigint, blob_len int, head_byte int, tail_byte int, checksum bigint"


def decode_image(blob: bytes):
    """Decode an image blob. STUB: requires PIL, which this environment
    does not ship — the call site (mapInPandas iterator) is the tested,
    production-shaped part."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment has no codecs. "
            "The mapInPandas plumbing around this call is real and tested."
        )
    import io

    return Image.open(io.BytesIO(blob))


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """Resize stub — same gating contract as decode_image."""
    if not _HAS_PIL:
        raise NotImplementedError("image resize requires PIL (not in this container)")
    import io

    img = decode_image(blob)
    out = io.BytesIO()
    img.resize((width, height)).save(out, format=img.format or "PNG")
    return out.getvalue()


def sample_frames(blob: bytes, n_frames: int, frame_size: int) -> list[bytes]:
    """Deterministic fake 'video' frame sampler: treats the blob as a
    frame container and cuts n_frames evenly-spaced fixed-size windows —
    the real implementation swaps this body for `av`/ffmpeg keyframe
    extraction; stride math and output shape are identical."""
    if len(blob) == 0:
        return []
    stride = max(len(blob) // n_frames, 1)
    return [blob[i * stride : i * stride + frame_size] for i in range(n_frames)
            if i * stride < len(blob)]


def binary_features_df(blobs: DataFrame) -> DataFrame:
    """blobs(doc_id, blob) → deterministic fake features via an Arrow
    batch iterator (the single home of the decode stub — the registered
    mm_binary_features query delegates here). Empty-blob sentinel is 0 to
    match SQL `ascii('')` so oracles stay comparable on empty inputs."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            b = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob_len": b.map(len),
                    "head_byte": b.map(lambda x: x[0] if len(x) else 0),
                    "tail_byte": b.map(lambda x: x[-1] if len(x) else 0),
                    "checksum": b.map(lambda x: sum(x) % 2_147_483_647),
                }
            )

    return blobs.mapInPandas(_decode, schema=FEATURE_SCHEMA)


def frame_sample_df(blobs: DataFrame, n_frames: int = 4, frame_size: int = 16) -> DataFrame:
    """blobs(doc_id, blob) → one row per sampled frame, via an Arrow batch
    iterator (the video analogue of mm_binary_features)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_head": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for idx, frame in enumerate(sample_frames(blob, n_frames, frame_size)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(frame))
                    out["frame_head"].append(frame[0] if len(frame) else -1)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_sample, schema=FRAME_SCHEMA)


def with_media_metadata(df: DataFrame, blob_col: str, mime: str) -> DataFrame:
    """Attach the typed metadata struct that travels beside a blob column
    (projectable without touching blob bytes)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(F.col(blob_col)).cast("bigint").alias("n_bytes"),
        ),
    )
