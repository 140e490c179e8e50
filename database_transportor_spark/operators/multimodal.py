"""Multimodal (binary) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct; all
decode/feature work runs in Arrow-batched Pandas stages via
``mapInPandas`` so bytes never round-trip row-at-a-time through Python.

The image/audio codec libraries are NOT in this container, so the decode
step is stubbed (clearly marked ``NotImplementedError``) behind a
deterministic byte-level feature extractor that exercises the REAL Spark
plumbing: binary schema, Arrow batch transfer, batch-shaped UDF signature,
and partition-preserving execution.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_binary",
    "byte_features",
    "decode_image",
    "resize_image",
    "sample_frames",
]

#: typed metadata carried alongside the opaque payload
MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text",
                  out_col: str = "content") -> DataFrame:
    """Fixture adapter: materialize a real ``binary`` column (UTF-8 bytes of
    ``text_col``) plus a metadata struct, giving the media-table shape
    ``(id..., content binary, meta struct)`` the pipeline operates on."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def byte_features(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Deterministic byte-level features (size + md5) stand in for the decode
    step; the Spark side — ``mapInPandas`` batch iteration, schema contract,
    no shuffle — is exactly what a real image/audio featurizer uses.
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("digest", StringType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            content = pdf[content_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": content.map(len).astype("int64"),
                    "digest": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select(id_col, content_col).mapInPandas(extract, schema)


def decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Decode an image binary column to (height, width, channels) tensors.

    STUB: pillow/opencv are not available in this container.  The Spark
    plumbing contract is identical to :func:`byte_features` — swap the
    extractor body for ``PIL.Image.open(io.BytesIO(b))`` when the codec
    libraries exist.
    """
    raise NotImplementedError(
        "image codecs not available in this environment; see byte_features() "
        "for the identical mapInPandas plumbing with a deterministic extractor"
    )


def resize_image(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    target_width: int = 64,
    target_height: int = 64,
) -> DataFrame:
    """Resize an image binary column to ``target_width × target_height``,
    emitting the resized payload plus an updated metadata struct.

    When pillow is importable the real decoder runs
    (``Image.open → resize → tobytes``).  In this container it is not, so a
    clearly-marked deterministic fake stands in: the payload is
    stride-sampled down to exactly ``target_width * target_height`` bytes
    (or fewer for tiny payloads).  Either way the Spark side is the real
    resize shape — ``mapInPandas`` over Arrow batches, binary in / binary
    out, typed meta struct, no shuffle, partition-preserving — so swapping
    the body for the codec changes nothing in the plan.
    """
    try:  # pragma: no cover - pillow absent in this environment
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("content", BinaryType()),
            StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    n_out = target_width * target_height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if have_pil:  # pragma: no cover - real decode path
            import io

            from PIL import Image

            def one(b: bytes) -> bytes:
                img = Image.open(io.BytesIO(b))
                return img.resize((target_width, target_height)).tobytes()

        else:
            # Deterministic fake: stride-sample to n_out bytes.
            def one(b: bytes) -> bytes:
                if len(b) <= n_out:
                    return b
                step = len(b) / n_out
                return bytes(b[int(i * step)] for i in range(n_out))

        for pdf in batches:
            out = pdf[content_col].map(lambda b: one(bytes(b)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": out,
                    "meta": [
                        {
                            "mime": "image/raw",
                            "width": target_width,
                            "height": target_height,
                            "duration_ms": None,
                        }
                    ]
                    * len(pdf),
                }
            )

    return df.select(id_col, content_col).mapInPandas(do_resize, schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    frame_bytes: int = 64,
    stride: int = 128,
    max_frames: int = 8,
) -> DataFrame:
    """Sample "frames" from a binary payload — deterministic fake decode.

    Video codecs are not in this container, so the decoder is a byte
    slicer: frame ``i`` is ``content[i*stride : i*stride+frame_bytes]``.
    The Spark plumbing is the REAL video-sampling shape and is what this
    operator tests: ``mapInPandas`` with **fan-out** (one input row yields
    up to ``max_frames`` output rows), Arrow batch iteration, and a typed
    output schema carrying per-frame binary + metadata.  Swap the slicer
    for a PyAV/ffmpeg frame grab and nothing else changes.
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
            StructField("frame_digest", StringType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, frames, digests = [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content)
                for i in range(max_frames):
                    start = i * stride
                    if start >= len(data):
                        break
                    chunk = data[start : start + frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(chunk)
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "frame_digest": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(sample, schema)
