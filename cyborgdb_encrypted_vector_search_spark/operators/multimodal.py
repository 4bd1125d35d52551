"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star scope: a training-data pipeline carries images/audio/video as
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages. IMAGE decode is REAL: a pure-Python 24-bit BMP
codec (decode_image / encode_bmp below — header parse, bottom-up row
order, BGR channel order, 4-byte row padding), so the decode →
feature-extract stage runs actual pixel recovery and is oracle-gated
end to end (``multimodal_decode_stats``). VIDEO demux is REAL too
(r10): a pure-Python RIFF/AVI container walk (encode_avi / demux_avi —
RIFF chunk grammar, LIST hdrl with avih/strh/strf headers, LIST movi
holding ``00db`` chunks of raw bottom-up BGR DIB frames exactly as
uncompressed AVIs store them, even-byte chunk padding, idx1 index),
gated end to end by ``multimodal_video_stats``. No stubs remain; a
hardware-codec library would swap in only for compressed fourccs.

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
    pixel_bytes = _dib_frame_bytes(width, height, rows)
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
    return width, height, _decode_bgr_rows(
        payload, data_offset, width, height, bottom_up
    )


def _decode_bgr_rows(
    payload: bytes,
    data_offset: int,
    width: int,
    height: int,
    bottom_up: bool,
) -> list[list[tuple[int, int, int]]]:
    """Recover top-down (r, g, b) pixel rows from a raw 24-bit DIB
    pixel array (B,G,R byte order, rows padded to 4-byte boundaries,
    stored bottom-up unless ``bottom_up`` is False) — the byte layout
    shared by BMP files and uncompressed AVI ``00db`` frames."""
    row_stride = (width * 3 + 3) & ~3
    if data_offset + row_stride * height > len(payload):
        raise ValueError("DIB pixel array truncated")
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
    return rows


# ----------------------------------------------------------------------
# RIFF/AVI container codec — REAL video demux, pure Python (r10).
# An uncompressed ('DIB ') AVI is a RIFF file:
#   RIFF('AVI '
#     LIST('hdrl' avih(<MainAVIHeader>)
#                 LIST('strl' strh(<AVIStreamHeader>) strf(<BITMAPINFOHEADER>)))
#     LIST('movi' 00db(<raw DIB frame>) ...)
#     idx1(<index entries>))
# Every chunk is <fourcc><u32 size><payload> padded to EVEN length —
# the padding byte is NOT counted in size (the classic RIFF trap).
# Frame pixel data is the same bottom-up BGR padded DIB array BMP
# uses, so the decoder below shares _decode_bgr_rows with the image
# path. (RIFF spec: Microsoft Multimedia Programming Interface and
# Data Specifications 1.0; AVI structures per msdn AVIMAINHEADER /
# AVISTREAMHEADER.)
# ----------------------------------------------------------------------


def _dib_frame_bytes(
    width: int, height: int, rows: list[list[tuple[int, int, int]]]
) -> bytes:
    """Top-down RGB rows → raw bottom-up BGR padded DIB pixel array
    (the byte payload of a BMP file after its headers, and of an
    uncompressed AVI '00db' chunk)."""
    if height != len(rows) or any(len(r) != width for r in rows):
        raise ValueError("rows shape does not match width/height")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    out = bytearray()
    for row in reversed(rows):  # bottom-up storage order
        for r, g, b in row:
            out += bytes((b, g, r))  # BGR on disk
        out += pad
    return bytes(out)


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc + u32 size + payload, padded to even
    length (pad byte excluded from the recorded size)."""
    if len(fourcc) != 4:
        raise ValueError(f"fourcc must be 4 bytes, got {fourcc!r}")
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def encode_avi(
    width: int,
    height: int,
    frames: list[list[list[tuple[int, int, int]]]],
    fps: int = 30,
) -> bytes:
    """Encode top-down RGB frames as a standard uncompressed AVI
    (RIFF grammar above): real avih/strh/strf headers, one '00db'
    chunk of raw DIB bytes per frame inside LIST movi, and an idx1
    index with AVIIF_KEYFRAME entries — what a reference player or
    demuxer expects of a DIB-codec AVI."""
    if not frames:
        raise ValueError("encode_avi requires at least one frame")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    dibs = [_dib_frame_bytes(width, height, rows) for rows in frames]
    frame_bytes = max(len(d) for d in dibs)
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ",
        0,  # flags
        0, 0,  # priority, language
        0,  # initial frames
        1, fps,  # scale, rate → fps frames/sec
        0, len(frames), frame_bytes,  # start, length, suggested buffer
        0xFFFFFFFF, 0,  # quality, sample size (0: varying)
        0, 0, width, height,  # rcFrame
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes/sec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, frame_bytes,  # frames, initial, streams, buffer
        width, height,
        0, 0, 0, 0,  # reserved
    )
    strl = _riff_chunk(
        b"LIST",
        b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf),
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_body = bytearray(b"movi")
    index = bytearray()
    for dib in dibs:
        # idx1 offsets are relative to the 'movi' fourcc position,
        # pointing at the chunk's fourcc
        index += struct.pack(
            "<4sIII", b"00db", 0x10, len(movi_body), len(dib)
        )
        movi_body += _riff_chunk(b"00db", dib)
    movi = _riff_chunk(b"LIST", bytes(movi_body))
    idx1 = _riff_chunk(b"idx1", bytes(index))
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    buf[start:end], enforcing the even-padding rule and rejecting
    truncation loudly."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(
                f"RIFF chunk header truncated at offset {pos}"
            )
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"RIFF chunk {fourcc!r} overruns its parent "
                f"(offset {pos}, size {size})"
            )
        yield fourcc, body, size
        pos = body + size + (size % 2)  # pad to even


def demux_avi(payload: bytes) -> tuple[int, int, list[bytes]]:
    """REAL AVI demux, pure Python: walk the RIFF chunk tree, read the
    frame geometry from LIST hdrl's first VIDEO stream strf (require
    the uncompressed 24-bit DIB codec this module encodes/decodes),
    then collect THAT stream's frame chunks ('NNdb'/'NNdc', where NN
    is the stream's index in hdrl order) inside LIST movi — including
    frames grouped under the interleaved-AVI LIST 'rec ' wrapper —
    in stream order. Other streams' chunks (audio 'NNwb', a second
    video stream) are ignored by stream id, never decoded as DIB.
    Returns (width, height, [raw DIB frame bytes]). Rejects non-AVI,
    compressed-first-video-stream, or structurally damaged containers
    loudly — silent partial demux would vanish frames from a stats
    gate downstream."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload (missing RIFF magic)")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise ValueError("RIFF payload truncated")
    if payload[8:12] != b"AVI ":
        raise ValueError(
            f"RIFF form {payload[8:12]!r} is not 'AVI '"
        )
    geo: tuple[int, int, int] | None = None
    frames: list[bytes] = []
    saw_movi = False

    def collect(start: int, end: int, want: bytes) -> None:
        for cc, fbody, fsize in _walk_riff_chunks(payload, start, end):
            if cc == b"LIST" and payload[fbody : fbody + 4] == b"rec ":
                # interleaved-AVI record grouping — frames nest one
                # level down; descend rather than silently skipping
                collect(fbody + 4, fbody + fsize, want)
            elif cc[:2] == want and cc[2:4] in (b"db", b"dc"):
                frames.append(payload[fbody : fbody + fsize])

    for fourcc, body, size in _walk_riff_chunks(
        payload, 12, 8 + riff_size
    ):
        if fourcc != b"LIST":
            continue  # idx1 / JUNK — index is advisory, movi is truth
        list_type = payload[body : body + 4]
        if list_type == b"hdrl":
            geo = _parse_hdrl(payload, body + 4, body + size)
        elif list_type == b"movi":
            saw_movi = True
            if geo is None:
                raise ValueError("AVI movi before hdrl")
            collect(body + 4, body + size, b"%02d" % geo[2])
    if geo is None:
        raise ValueError("AVI missing LIST hdrl / strf geometry")
    if not saw_movi:
        raise ValueError("AVI missing LIST movi")
    return geo[0], geo[1], frames


def _parse_hdrl(buf: bytes, start: int, end: int) -> tuple[int, int, int]:
    """Extract (width, height, stream_index) from hdrl's first video
    stream strf, validating the codec is uncompressed 24-bit DIB.
    The stream index (position of the strl among ALL streams, the
    number embedded in its movi chunk ids) keys the frame collection
    so a multi-stream file's audio/second-video chunks are never
    mistaken for frames."""
    stream_idx = -1
    for fourcc, body, size in _walk_riff_chunks(buf, start, end):
        if fourcc != b"LIST" or buf[body : body + 4] != b"strl":
            continue
        stream_idx += 1
        is_video = False
        for cc, sbody, ssize in _walk_riff_chunks(
            buf, body + 4, body + size
        ):
            if cc == b"strh":
                is_video = buf[sbody : sbody + 4] == b"vids"
            elif cc == b"strf" and is_video:
                if ssize < 40:
                    raise ValueError("strf BITMAPINFOHEADER truncated")
                width, height = struct.unpack_from("<ii", buf, sbody + 4)
                bpp = struct.unpack_from("<H", buf, sbody + 14)[0]
                (compression,) = struct.unpack_from("<I", buf, sbody + 16)
                if bpp != 24 or compression != 0:
                    raise ValueError(
                        f"only uncompressed 24-bit DIB AVI supported "
                        f"(bpp={bpp}, compression={compression})"
                    )
                if width <= 0 or height == 0:
                    raise ValueError("malformed AVI frame dimensions")
                return width, height, stream_idx
    raise ValueError("AVI hdrl has no video stream (vids strh + strf)")


def decode_video_frame(
    width: int, height: int, dib: bytes
) -> list[list[tuple[int, int, int]]]:
    """Decode one raw AVI DIB frame (bottom-up when height > 0, same
    convention as BMP) to top-down (r, g, b) rows."""
    return _decode_bgr_rows(dib, 0, width, abs(height), height > 0)


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Sample every n-th frame from a real AVI container: full RIFF
    demux (demux_avi), then keep frames 0, n, 2n, ... Returns the raw
    DIB frame payloads (pair with demux_avi's geometry or
    decode_video_frame to recover pixels). Real byte-level extraction
    — the former NotImplementedError stub is closed (r10)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    _, _, frames = demux_avi(payload)
    return frames[::every_n]


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
                    # same loud-NULL contract as the decode stats
                    # stages (r10): a silently skipped payload would
                    # vanish from a frame-count gate downstream
                    raise ValueError(
                        f"sample_frame_chunks: NULL payload for "
                        f"media_id={mid}; filter or repair missing "
                        "media upstream"
                    )
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
                    # missing media must not silently vanish from the
                    # stats (a row-count gate downstream wouldn't see
                    # it) — reject loudly like every other malformation
                    raise ValueError(
                        f"decode_image_stats: NULL payload for "
                        f"media_id={mid}; filter or repair missing "
                        "media upstream"
                    )
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


def synth_frame_pixel(
    media_id: int, f: int, x: int, y: int, channel: int
) -> int:
    """Deterministic per-FRAME pixel formula shared by the synthetic
    AVI encoder and the DuckDB oracle — synth_pixel's (x, y, channel)
    asymmetry plus a frame term, so a demuxer that drops, reorders, or
    mis-indexes frames produces different per-frame checksums."""
    return (media_id * 7 + 101 * f + 131 * x + 257 * y + 17 * channel) % 256


def synth_video_frames(media_id: int) -> int:
    """Per-media synthetic frame count (2..6) — varied on a residue
    class distinct from synth_dims' so frame count never co-varies
    with geometry, and low enough that some videos yield a single
    sampled frame (the demuxer's frame-count recovery is exercised,
    not assumed)."""
    return 2 + (media_id * 3) % 5


def synthetic_avi_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Render one REAL uncompressed AVI per input id (deterministic
    frames via synth_frame_pixel, dims via synth_dims, frame count via
    synth_video_frames) through an Arrow-batched mapInPandas stage —
    the ingest half of the video demux gate. Output matches
    MEDIA_SCHEMA."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = synth_dims(mid)
                frames = [
                    [
                        [
                            (
                                synth_frame_pixel(mid, f, x, y, 0),
                                synth_frame_pixel(mid, f, x, y, 1),
                                synth_frame_pixel(mid, f, x, y, 2),
                            )
                            for x in range(w)
                        ]
                        for y in range(h)
                    ]
                    for f in range(synth_video_frames(mid))
                ]
                out["media_id"].append(mid)
                out["kind"].append("video")
                out["payload"].append(encode_avi(w, h, frames))
                out["meta"].append({"container": "avi", "codec": "dib24"})
            yield pd.DataFrame(out)

    return ids.mapInPandas(render, MEDIA_SCHEMA)


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
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


def decode_video_stats(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video demux + decode, one mapInPandas stage: walk each AVI
    container (demux_avi — RIFF grammar, hdrl geometry, movi frame
    chunks), sample every n-th frame (original frame_idx preserved, as
    a sampler must for timestamp alignment), recover every pixel of
    each kept frame from its raw bottom-up BGR DIB bytes
    (decode_video_frame), and reduce to the same exact-integer channel
    sums + position-weighted checksums as decode_image_stats. Output is
    the frame-exploded 1→N fan-out shape; no shuffle — at 100 TB this
    is the embarrassingly parallel batch-demux stage a PyAV/ffmpeg
    extractor runs, with only the codec swapped. NULL payloads are
    rejected loudly (missing media must not vanish from the stats)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in VIDEO_STATS_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    raise ValueError(
                        f"decode_video_stats: NULL payload for "
                        f"media_id={mid}; filter or repair missing "
                        "media upstream"
                    )
                w, h, frames = demux_avi(bytes(payload))
                for idx in range(0, len(frames), every_n):
                    rows = decode_video_frame(w, h, frames[idx])
                    sums = [0, 0, 0]
                    wsums = [0, 0, 0]
                    for y, row in enumerate(rows):
                        for x, px in enumerate(row):
                            weight = 1 + x + w * y
                            for c in range(3):
                                sums[c] += px[c]
                                wsums[c] += weight * px[c]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(abs(h))
                    out["sum_r"].append(sums[0])
                    out["sum_g"].append(sums[1])
                    out["sum_b"].append(sums[2])
                    out["wsum_r"].append(wsums[0])
                    out["wsum_g"].append(wsums[1])
                    out["wsum_b"].append(wsums[2])
            yield pd.DataFrame(out)

    return media.mapInPandas(stats, VIDEO_STATS_SCHEMA)


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
