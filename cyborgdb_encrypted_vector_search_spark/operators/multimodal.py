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


def encode_bmp(width: int, height: int, rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode top-down RGB pixel rows as a standard 24-bit BMP.

    Layout (BMP spec, no library): 14-byte file header (``BM`` magic,
    file size, pixel-data offset) + 40-byte BITMAPINFOHEADER
    (BI_RGB / uncompressed, 24 bpp, POSITIVE height → rows stored
    bottom-up), pixel rows in B,G,R byte order, each row zero-padded
    to a 4-byte boundary. ``rows`` is top-down (rows[0] is the top
    scanline) — the natural in-memory orientation — so the encoder
    reverses row order on write, exactly what the decoder must undo."""
    if height != len(rows) or any(len(r) != width for r in rows):
        raise ValueError("rows shape does not match width/height")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    pixel_bytes = bytearray()
    for row in reversed(rows):  # bottom-up storage order
        for r, g, b in row:
            pixel_bytes += bytes((b, g, r))  # BGR on disk
        pixel_bytes += pad
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_bytes)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40,  # header size
        width,
        height,  # positive → bottom-up
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB (uncompressed)
        len(pixel_bytes),
        2835,  # 72 DPI in px/metre, conventional
        2835,
        0,
        0,
    )
    return bytes(file_header) + info_header + bytes(pixel_bytes)


def decode_image(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a 24-bit uncompressed BMP — REAL pixel recovery, pure
    Python (no codec library). Returns ``(width, height, rows)`` with
    ``rows`` top-down and each pixel an ``(r, g, b)`` tuple.

    Handles the three classic BMP traps: bottom-up row storage when
    the header height is positive (negative height = top-down, also
    supported), B,G,R byte order, and per-row zero padding to 4-byte
    boundaries. Rejects anything that is not BI_RGB 24 bpp loudly
    rather than guessing."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, raw_height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    if width <= 0 or raw_height == 0 or planes != 1:
        raise ValueError("malformed BMP dimensions")
    if data_offset < 14 + hdr_size:
        # a data offset inside the headers would silently decode
        # header bytes as pixels — reject loudly like every other
        # malformation
        raise ValueError(
            f"BMP data offset {data_offset} points inside the headers"
        )
    bottom_up = raw_height > 0
    height = abs(raw_height)
    row_stride = (width * 3 + 3) & ~3
    if data_offset + row_stride * height > len(payload):
        raise ValueError("BMP payload truncated")
    rows: list[list[tuple[int, int, int]]] = []
    for stored_idx in range(height):
        base = data_offset + stored_idx * row_stride
        row = [
            (payload[base + 3 * x + 2], payload[base + 3 * x + 1], payload[base + 3 * x])
            for x in range(width)
        ]
        rows.append(row)
    if bottom_up:
        rows.reverse()
    return width, height, rows


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


def synth_pixel(media_id: int, x: int, y: int, channel: int) -> int:
    """Deterministic pixel formula shared by the synthetic encoder and
    the DuckDB oracle: value depends on (x, y, channel) asymmetrically
    so a decoder that flips row order, swaps channels, or mis-skips row
    padding produces different position-weighted checksums."""
    return (media_id * 7 + 131 * x + 257 * y + 17 * channel) % 256


def synth_dims(media_id: int) -> tuple[int, int]:
    """Per-media synthetic dimensions. Widths 4..8 sweep every row-pad
    residue class (3*w mod 4 in {0,1,2,3}) so padding handling is
    exercised, not assumed."""
    return 4 + media_id % 5, 3 + media_id % 4


def synthetic_bmp_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Render one REAL 24-bit BMP payload per input id (deterministic
    pixels via synth_pixel) through an Arrow-batched mapInPandas stage —
    the ingest half of the decode gate. Output matches MEDIA_SCHEMA."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = synth_dims(mid)
                rows = [
                    [
                        (
                            synth_pixel(mid, x, y, 0),
                            synth_pixel(mid, x, y, 1),
                            synth_pixel(mid, x, y, 2),
                        )
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                out["media_id"].append(mid)
                out["kind"].append("image")
                out["payload"].append(encode_bmp(w, h, rows))
                out["meta"].append({"codec": "bmp24"})
            yield pd.DataFrame(out)

    return ids.mapInPandas(render, MEDIA_SCHEMA)


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("wsum_r", T.LongType()),
        T.StructField("wsum_g", T.LongType()),
        T.StructField("wsum_b", T.LongType()),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """Decode BMP payloads (decode_image — real header parse + pixel
    recovery) and reduce each image to exact-integer channel stats:
    plain channel sums plus position-weighted sums with weight
    ``1 + x + width*y`` (top-down coordinates). The weighted sums are
    the decode proof: they change if the decoder flips bottom-up rows,
    swaps BGR→RGB wrongly, or reads padding bytes as pixels — while the
    plain sums alone would survive a row-order bug. One mapInPandas
    stage, no shuffle; at 100 TB this is the same embarrassingly
    parallel batch-decode shape a Pillow/torchvision extractor runs."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DECODE_STATS_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, rows = decode_image(bytes(payload))
                sums = [0, 0, 0]
                wsums = [0, 0, 0]
                for y, row in enumerate(rows):
                    for x, px in enumerate(row):
                        weight = 1 + x + w * y
                        for c in range(3):
                            sums[c] += px[c]
                            wsums[c] += weight * px[c]
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(sums[0])
                out["sum_g"].append(sums[1])
                out["sum_b"].append(sums[2])
                out["wsum_r"].append(wsums[0])
                out["wsum_g"].append(wsums[1])
                out["wsum_b"].append(wsums[2])
            yield pd.DataFrame(out)

    return media.mapInPandas(stats, DECODE_STATS_SCHEMA)


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
