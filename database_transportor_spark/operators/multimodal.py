"""Multimodal (binary) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct; all
decode/feature work runs in Arrow-batched Pandas stages via
``mapInPandas`` so bytes never round-trip row-at-a-time through Python.

Decode tiers: pillow when importable (JPEG/PNG/WebP/…), else REAL
pure-Python codecs — PNG (:func:`decode_png`/:func:`encode_png`, stdlib
zlib + numpy de-filtering), baseline-sequential JPEG
(:mod:`.jpeg` — actual DCT/Huffman per ITU-T T.81, round 7), and a
PCM-16 RIFF/WAVE codec (:func:`decode_wav`/:func:`encode_wav`) for
audio.  Containers (AVI RIFF, MP4/ISO-BMFF, APNG) demux for real; the
only remaining stand-in is the generic byte-slicing
:func:`sample_frames` for formats with no in-container demuxer or codec
(e.g. Matroska, H.264 — PyAV/ffmpeg are not in this container).
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
    "audio_frames",
    "byte_features",
    "decode_audio",
    "decode_avi",
    "decode_image",
    "decode_apng",
    "decode_png",
    "decode_video_frames",
    "decode_mp4",
    "decode_mp4_audio",
    "decode_wav",
    "encode_apng",
    "encode_avi",
    "encode_mp4",
    "encode_mp4_audio",
    "encode_png",
    "encode_wav",
    "jpeg_dimensions",
    "resize_image",
    "sample_frames",
    "png_metadata",
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
            StructField(id_col, df.schema[id_col].dataType),
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color_type → channel count (palette images unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr, text: dict | None = None) -> bytes:
    """Encode an ``(h, w)`` or ``(h, w, channels)`` uint8 numpy array as a
    real PNG (filter 0, zlib stream) — pure stdlib, used by the round-trip
    tests and available to sinks that need genuine image bytes.

    ``text`` writes standard ``tEXt`` metadata chunks (keyword →
    latin-1 value, spec-compliant 1-79-char keywords), readable back by
    :func:`png_metadata` and by any compliant viewer."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    texts = b""
    for k, v in (text or {}).items():
        kb = str(k).encode("latin-1")
        if not 1 <= len(kb) <= 79 or b"\x00" in kb:
            raise ValueError(f"encode_png: invalid tEXt keyword {k!r}")
        texts += chunk(b"tEXt", kb + b"\x00" + str(v).encode("latin-1"))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + texts
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(b: bytes):
    """REAL pure-Python PNG decode (stdlib ``zlib`` + numpy de-filtering):
    returns an ``(h, w, channels)`` uint8 array.  Supports 8-bit
    grayscale/RGB/gray+alpha/RGBA, non-interlaced — the shapes every
    PNG encoder (including :func:`encode_png` and PIL) emits by default.
    Palette/16-bit/interlaced images need pillow (raises ``ValueError``)."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], None
    while pos < len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color_type={ctype} "
                    f"interlace={interlace}); install pillow for full decode"
                )
            meta = (w, h, _PNG_CHANNELS[ctype])
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG (bad decompressed length)")
    flt = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, row = flt[y, 0], flt[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = row + prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                bb = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + bb) // 2
                else:
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                # mask NOW: Average/Paeth predict from reconstructed
                # BYTES, so deferred masking would feed them values >255
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG (filter {f})")
        out[y] = cur & 0xFF
    return out.reshape(h, w, ch)


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    errors: str = "raise",
    with_pixels: bool = False,
    decoder=None,
) -> DataFrame:
    """Decode an image binary column to real dimensions (and optionally
    raw pixel bytes): ``(id, width, height, channels[, pixels])``.

    REAL decode, two tiers: pillow when importable (JPEG/PNG/WebP/…);
    otherwise the built-in pure-Python codecs (:func:`decode_png` —
    stdlib zlib + numpy, genuinely decompresses and de-filters the pixel
    data — and the baseline-sequential JPEG decoder
    :func:`~.jpeg.decode_jpeg`).  Bytes neither tier can decode follow ``errors``:
    ``"raise"`` fails the job, ``"skip"`` drops the row, ``"null"``
    emits NULL dims — the quarantine-friendly mode for web-scraped
    corpora where a percent of payloads is always garbage.

    ``decoder`` (round 9): the image twin of the audio hook — a user
    callable ``bytes -> (h, w, ch) uint8 ndarray | None`` tried when
    the built-in tier raises, slotting WebP/AVIF/HEIC decoders into the
    same Arrow batching with the same ``errors=`` degrade contract
    (``None``/raise ⇒ the row is undecodable as usual).

    Scale shape: ``mapInPandas`` over Arrow batches — partition-
    preserving, no shuffle; pixel payloads (``with_pixels``) multiply
    output size, keep it off for stats-only passes.
    """
    if errors not in ("raise", "skip", "null"):
        raise ValueError(f"decode_image: errors must be raise|skip|null, got {errors!r}")
    try:  # pragma: no cover - pillow absent in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    fields = [
        StructField(id_col, df.schema[id_col].dataType),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
    ]
    if with_pixels:
        fields.append(StructField("pixels", BinaryType()))
    schema = StructType(fields)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes):
            import numpy as np

            try:
                if have_pil:  # pragma: no cover - real PIL path
                    import io

                    from PIL import Image

                    arr = np.asarray(Image.open(io.BytesIO(b)))
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    return arr
                if b[:2] == b"\xff\xd8":
                    from .jpeg import decode_jpeg

                    return decode_jpeg(b)
                return decode_png(b)
            except Exception:
                if decoder is None:
                    raise
                out = decoder(b)
                if out is None:
                    raise
                arr = np.asarray(out, dtype=np.uint8)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                return arr

        for pdf in batches:
            ids, ws, hs, chs, pix = [], [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    arr = one(bytes(content))
                except Exception:
                    if errors == "raise":
                        raise
                    if errors == "skip":
                        continue
                    ids.append(doc_id)
                    ws.append(None); hs.append(None); chs.append(None)
                    pix.append(None)
                    continue
                h, w, ch = arr.shape
                ids.append(doc_id)
                ws.append(w); hs.append(h); chs.append(ch)
                if with_pixels:  # stats-only mode must not copy pixels
                    pix.append(arr.tobytes())
            cols = {
                id_col: pd.Series(ids, dtype="object"),
                "width": pd.Series(ws, dtype="object"),
                "height": pd.Series(hs, dtype="object"),
                "channels": pd.Series(chs, dtype="object"),
            }
            if with_pixels:
                cols["pixels"] = pd.Series(pix, dtype="object")
            yield pd.DataFrame(cols)

    return df.select(id_col, content_col).mapInPandas(decode, schema)


def resize_image(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    target_width: int = 64,
    target_height: int = 64,
) -> DataFrame:
    """Resize an image binary column to ``target_width × target_height``,
    emitting the resized payload plus an updated metadata struct.

    Three tiers: pillow when importable (``Image.open → resize →
    tobytes``); else a REAL resize for PNG payloads (:func:`decode_png`
    → nearest-neighbor numpy indexing → raw pixel bytes); else — for
    payloads that are not decodable images at all (e.g. the text-bytes
    fixtures) — a deterministic stride-sample down to
    ``target_width * target_height`` bytes.  All tiers share the same
    Spark shape: ``mapInPandas`` over Arrow batches, binary in / binary
    out, typed meta struct, no shuffle, partition-preserving.
    """
    try:  # pragma: no cover - pillow absent in this environment
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
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
            def one(b: bytes) -> bytes:
                try:
                    # real PNG path: decode + nearest-neighbor resample
                    import numpy as np

                    arr = decode_png(b)
                    h, w, _ = arr.shape
                    ys = (np.arange(target_height) * h) // target_height
                    xs = (np.arange(target_width) * w) // target_width
                    return arr[ys][:, xs].tobytes()
                except Exception:
                    # not only ValueError: a truncated signature-bearing
                    # payload raises struct.error, a corrupt IDAT raises
                    # zlib.error — ANY decode failure falls back to the
                    # deterministic stride-sample tier instead of failing
                    # the job on one bad web-scraped row
                    pass
                # non-image payload: deterministic stride-sample
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
    decoder=None,
) -> DataFrame:
    """Sample "frames" from a binary payload — deterministic fake decode.

    Video codecs are not in this container, so the default decoder is a
    byte slicer: frame ``i`` is ``content[i*stride : i*stride+frame_bytes]``.
    The Spark plumbing is the REAL video-sampling shape and is what this
    operator tests: ``mapInPandas`` with **fan-out** (one input row yields
    up to ``max_frames`` output rows), Arrow batch iteration, and a typed
    output schema carrying per-frame binary + metadata.

    ``decoder`` (round 9) is that swap slot made explicit: a user
    callable ``bytes -> iterable[bytes] | None`` (e.g. a PyAV/ffmpeg
    H.264 frame grab rendered to bytes) tried FIRST per row; ``None``
    falls back to the byte slicer, so mixed corpora degrade gracefully.
    The engine keeps the fan-out cap, digests, batching, and schema.
    """
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
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
                decoded = decoder(data) if decoder is not None else None
                if decoded is not None:
                    for i, chunk in enumerate(decoded):
                        if i >= max_frames:
                            break
                        chunk = bytes(chunk)
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(chunk)
                        digests.append(hashlib.md5(chunk).hexdigest())
                    continue
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
                    id_col: pd.Series(ids, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "frame_digest": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(sample, schema)


def encode_wav(samples, sample_rate: int = 16_000) -> bytes:
    """Encode an ``(n,)`` or ``(n, channels)`` int16 numpy array as a real
    RIFF/WAVE PCM-16 file — pure stdlib ``struct``, used by round-trip
    tests and available to sinks emitting genuine audio bytes."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = np.ascontiguousarray(arr).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes):
    """REAL pure-Python WAV decode (stdlib ``struct``): returns
    ``(sample_rate, samples)`` with samples an ``(n, channels)`` int16
    array.  Supports PCM 16-bit (the canonical uncompressed encoding);
    compressed codecs (MP3/AAC/float WAV) need an audio library
    (raises ``ValueError``)."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        payload = b[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_format, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_format != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={audio_format} bits={bits}); "
                    "only PCM-16 decodes without an audio library"
                )
            fmt = (ch, rate)
        elif tag == b"data":
            data = payload
    if fmt is None or data is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    ch, rate = fmt
    samples = np.frombuffer(data[: len(data) - (len(data) % (2 * ch))],
                            dtype="<i2").reshape(-1, ch)
    return rate, samples


def _decode_audio_bytes(b: bytes, decoder=None):
    """Container sniff shared by every audio operator: MP4/ISO-BMFF
    (``ftyp`` at offset 4) → :func:`decode_mp4_audio`, otherwise RIFF
    WAV → :func:`decode_wav`.  Both return ``(sample_rate, (n, ch)
    int16 array)``, so callers are container-agnostic.

    ``decoder`` (round 9): optional user callable ``bytes ->
    (sample_rate, samples) | None``, tried when the built-in parsers
    raise — the pluggable slot for the compressed codecs (AAC/``mp4a``,
    MP3) the from-scratch PCM parsers honestly refuse.  The engine
    keeps everything around it: container sniffing, Arrow
    ``mapInPandas`` batching, and the ``errors=`` NULL-degrade
    contract — the callable only turns bytes into samples.  Returning
    ``None`` (or raising) re-raises the built-in's error, so such rows
    degrade under the caller's ``errors=`` policy exactly like any
    undecodable payload.  Samples may be ``(n,)`` or ``(n, ch)`` and
    are coerced to the int16 contract."""
    import numpy as np

    try:
        if len(b) >= 12 and b[4:8] == b"ftyp":
            return decode_mp4_audio(b)
        return decode_wav(b)
    except Exception:
        if decoder is None:
            raise
        out = decoder(b)
        if out is None:
            raise
        rate, samples = out
        arr = np.asarray(samples, dtype=np.int16)
        if arr.ndim == 1:
            arr = arr[:, None]
        return int(rate), arr


def decode_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    errors: str = "raise",
    decoder=None,
) -> DataFrame:
    """Decode an audio binary column to real signal statistics:
    ``(id, sample_rate, n_channels, n_samples, duration_ms, peak,
    sum_samples, sum_squares)`` — REAL decode via the built-in PCM-16
    parsers (WAV :func:`decode_wav`, MP4/M4A :func:`decode_mp4_audio`;
    container sniffed per row); ``peak``/``sum_samples``/
    ``sum_squares`` are exact integers over the decoded samples, so
    downstream RMS/loudness math (and the correctness oracle) is
    bit-reproducible.  ``errors`` as in :func:`decode_image`.
    ``decoder``: user fallback for compressed codecs (AAC/MP3) — see
    :func:`_decode_audio_bytes`; its rows keep the same exact-integer
    output contract.

    Scale shape: ``mapInPandas`` over Arrow batches — partition-
    preserving, no shuffle, bytes never row-trip through Python rows.
    """
    if errors not in ("raise", "skip", "null"):
        raise ValueError(f"decode_audio: errors must be raise|skip|null, got {errors!r}")
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("sample_rate", LongType()),
            StructField("n_channels", LongType()),
            StructField("n_samples", LongType()),
            StructField("duration_ms", LongType()),
            StructField("peak", LongType()),
            StructField("sum_samples", LongType()),
            StructField("sum_squares", LongType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    rate, samples = _decode_audio_bytes(bytes(content),
                                                        decoder)
                except Exception:
                    if errors == "raise":
                        raise
                    if errors == "skip":
                        continue
                    rows.append((doc_id, None, None, None, None, None,
                                 None, None))
                    continue
                n, ch = samples.shape
                s64 = samples.astype(np.int64)
                rows.append((
                    doc_id, rate, ch, n, n * 1000 // rate,
                    int(np.abs(s64).max(initial=0)),
                    int(s64.sum()), int((s64 * s64).sum()),
                ))
            yield pd.DataFrame(rows, columns=[
                id_col, "sample_rate", "n_channels", "n_samples",
                "duration_ms", "peak", "sum_samples", "sum_squares",
            ])

    return df.select(id_col, content_col).mapInPandas(decode, schema)


def audio_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    frame_len: int = 256,
    hop: int = 128,
    max_frames: int | None = None,
    errors: str = "raise",
    decoder=None,
) -> DataFrame:
    """Windowed audio frame features — the real STFT-prep shape: decode
    (WAV or MP4 PCM, sniffed per row like :func:`decode_audio`),
    slide a ``frame_len`` window by ``hop`` over
    channel 0, and emit one row per frame with exact integer statistics:
    ``(id, frame_idx, frame_start, n, energy, zero_crossings, peak)``
    where ``energy = Σ s²`` and ``zero_crossings`` counts strict sign
    flips (``s_k · s_{k+1} < 0``) within the frame.  The trailing
    partial frame is kept (``n < frame_len``); ``max_frames`` caps
    per-row fan-out (a 3-hour podcast shouldn't explode one task).
    ``decoder``: user fallback for compressed codecs — see
    :func:`_decode_audio_bytes`.

    Scale shape: ``mapInPandas`` with per-row FAN-OUT (one input row →
    many frame rows), Arrow-batched, no shuffle — the same plumbing
    :func:`sample_frames` uses, but over genuinely decoded samples.
    """
    if errors not in ("raise", "skip", "null"):
        raise ValueError(f"audio_frames: errors must be raise|skip|null, got {errors!r}")
    if frame_len < 2 or hop < 1:
        raise ValueError("audio_frames: frame_len must be >= 2 and hop >= 1")
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("frame_idx", LongType()),
            StructField("frame_start", LongType()),
            StructField("n", LongType()),
            StructField("energy", LongType()),
            StructField("zero_crossings", LongType()),
            StructField("peak", LongType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    _rate, samples = _decode_audio_bytes(bytes(content),
                                                         decoder)
                except Exception:
                    if errors == "raise":
                        raise
                    if errors == "skip":
                        continue
                    rows.append((doc_id, None, None, None, None, None, None))
                    continue
                s = samples[:, 0].astype(np.int64)
                f = 0
                while f * hop < len(s):
                    if max_frames is not None and f >= max_frames:
                        break
                    start = f * hop
                    w = s[start : start + frame_len]
                    rows.append((
                        doc_id, f, start, len(w),
                        int((w * w).sum()),
                        int(((w[:-1] * w[1:]) < 0).sum()),
                        int(np.abs(w).max(initial=0)),
                    ))
                    f += 1
            yield pd.DataFrame(rows, columns=[
                id_col, "frame_idx", "frame_start", "n", "energy",
                "zero_crossings", "peak",
            ])

    return df.select(id_col, content_col).mapInPandas(frames, schema)


def encode_apng(frames, delays=None) -> bytes:
    """Encode a list of same-shaped uint8 arrays as a real APNG
    (animated PNG: acTL/fcTL/fdAT chunks per the spec) — full-canvas
    frames, blend SOURCE, dispose NONE.  Pure stdlib."""
    import struct
    import zlib

    import numpy as np

    if not frames:
        raise ValueError("encode_apng: at least one frame required")
    arrs = [np.ascontiguousarray(np.asarray(f, dtype=np.uint8)) for f in frames]
    arrs = [a[:, :, None] if a.ndim == 2 else a for a in arrs]
    h, w, ch = arrs[0].shape
    if any(a.shape != (h, w, ch) for a in arrs):
        raise ValueError("encode_apng: all frames must share one shape")
    delays = delays or [(1, 10)] * len(arrs)
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    def raw(a) -> bytes:
        return zlib.compress(
            b"".join(b"\x00" + a[y].tobytes() for y in range(h))
        )

    seq = 0
    out = [_PNG_SIG,
           chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)),
           chunk(b"acTL", struct.pack(">II", len(arrs), 0))]
    for i, a in enumerate(arrs):
        dn, dd = delays[i]
        out.append(chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, dn, dd, 0, 0)))
        seq += 1
        data = raw(a)
        if i == 0:
            out.append(chunk(b"IDAT", data))
        else:
            out.append(chunk(b"fdAT", struct.pack(">I", seq) + data))
            seq += 1
    out.append(chunk(b"IEND", b""))
    return b"".join(out)


def decode_apng(b: bytes):
    """REAL APNG frame extraction: walks acTL/fcTL/IDAT/fdAT chunks and
    inflates + de-filters every frame through the same PNG
    reconstruction as :func:`decode_png`.  Returns
    ``[(array, delay_num, delay_den), ...]`` — per-frame REGION pixels
    (full images for full-canvas frames, the shape :func:`encode_apng`
    writes); dispose/blend compositing of partial-canvas frames is out
    of scope (use pillow for that).  A plain (non-animated) PNG raises
    ``ValueError`` — use :func:`decode_png`."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, meta = 8, None
    frames = []  # [(w, h, delay_num, delay_den, [data...])]
    has_actl = False
    while pos < len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace:
                raise ValueError("unsupported APNG (depth/type/interlace)")
            meta = _PNG_CHANNELS[ctype]
        elif tag == b"acTL":
            has_actl = True
        elif tag == b"fcTL":
            _seq, fw, fh, _x, _y, dn, dd, _disp, _blend = struct.unpack(
                ">IIIIIHHBB", data)
            frames.append((fw, fh, dn, dd, []))
        elif tag == b"IDAT":
            if frames:  # IDAT belongs to frame 0 when an fcTL precedes it
                frames[-1][4].append(data)
        elif tag == b"fdAT":
            if not frames:
                raise ValueError("corrupt APNG (fdAT before fcTL)")
            frames[-1][4].append(data[4:])  # strip sequence number
        elif tag == b"IEND":
            break
    if not has_actl or not frames:
        raise ValueError("not an APNG (no acTL/fcTL) — use decode_png")
    ch = meta
    out = []
    for fw, fh, dn, dd, datas in frames:
        raw = zlib.decompress(b"".join(datas))
        stride = fw * ch
        if len(raw) != fh * (stride + 1):
            raise ValueError("corrupt APNG frame (bad length)")
        flt = np.frombuffer(raw, dtype=np.uint8).reshape(fh, stride + 1)
        arr = np.zeros((fh, stride), dtype=np.uint8)
        for y in range(fh):
            f, row = flt[y, 0], flt[y, 1:].astype(np.int32)
            prev = arr[y - 1].astype(np.int32) if y else np.zeros(
                stride, np.int32)
            if f == 0:
                cur = row
            elif f == 2:
                cur = row + prev
            elif f in (1, 3, 4):
                cur = np.zeros(stride, np.int32)
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    bb = prev[x]
                    c = prev[x - ch] if x >= ch else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + bb) // 2
                    else:
                        p = a + bb - c
                        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                        pred = (a if pa <= pb and pa <= pc
                                else (bb if pb <= pc else c))
                    cur[x] = (row[x] + pred) & 0xFF
            else:
                raise ValueError(f"corrupt APNG frame (filter {f})")
            arr[y] = cur & 0xFF
        out.append((arr.reshape(fh, fw, ch), dn, dd))
    return out


def jpeg_dimensions(b: bytes):
    """REAL JPEG header parse (pure stdlib): walk the marker stream to
    the frame header (SOF0/1/2/...) and return ``(width, height,
    channels)``.  This is genuine JPEG structure — SOI check, marker
    segments with big-endian lengths, entropy-coded segments skipped —
    not a heuristic; only full *pixel* decode (DCT + Huffman) needs an
    image library."""
    import struct

    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("corrupt JPEG (marker desync)")
        marker = b[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn: bare
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        # SOF0-3, SOF5-7, SOF9-11, SOF13-15 all share the frame layout
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _prec, h, w, ncomp = struct.unpack(
                ">BHHB", b[pos + 4 : pos + 10]
            )
            return w, h, ncomp
        if marker == 0xDA:  # SOS: entropy-coded data follows, no SOF seen
            raise ValueError("corrupt JPEG (SOS before SOF)")
        pos += 2 + seg_len
    raise ValueError("truncated JPEG (no SOF marker)")


def encode_avi(
    frames: list,
    width: int,
    height: int,
    fps_num: int = 30,
    fps_den: int = 1,
    codec: bytes = b"MJPG",
) -> bytes:
    """Encode per-frame compressed payloads (JPEG bytes for MJPG, PNG
    bytes for MPNG — both real-world AVI video handlers) as a REAL AVI
    RIFF container: ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
    strf)) LIST('movi' 00dc…) idx1)``.  Pure stdlib ``struct``; the
    writer any round-trip test or sink can use to produce genuine
    container bytes."""
    import struct

    if not frames:
        raise ValueError("encode_avi: at least one frame required")
    if len(codec) != 4:
        raise ValueError("encode_avi: codec must be a 4-byte FourCC")
    frames = [bytes(f) for f in frames]

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""  # chunks are word-aligned
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    usec_per_frame = (1_000_000 * fps_den) // fps_num
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps_num // max(fps_den, 1), 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + codec
        + struct.pack(
            "<IHHIIIIIIII4h",
            0, 0, 0, 0,
            fps_den, fps_num,          # dwScale / dwRate: fps = rate/scale
            0, len(frames), max_bytes, 0xFFFFFFFF, 0,
            0, 0, width, height,       # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, codec, width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks, idx_entries, offset = [], [], 4  # offset from 'movi' tag
    for f in frames:
        movi_chunks.append(chunk(b"00dc", f))
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10, offset, len(f))
        )
        offset += 8 + len(f) + (len(f) & 1)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(b: bytes):
    """REAL AVI container demux (pure stdlib ``struct``): walks the RIFF
    chunk tree — ``avih``/``strh``/``strf`` headers, the ``movi`` list
    (including ``rec␣`` sublists), ``idx1`` — and returns
    ``(meta, frames)`` where ``meta`` carries ``width``, ``height``,
    ``fps_num``/``fps_den`` (from the video ``strh``'s dwRate/dwScale),
    ``codec`` (FourCC), ``n_frames``, and ``frames`` is the list of raw
    compressed frame payloads (``00dc``/``00db`` chunks, in stream
    order).  Decoding the payloads themselves is the codec tier's job
    (:func:`decode_png` for MPNG, :func:`jpeg_dimensions` +
    pillow-if-present for MJPG)."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF/AVI signature)")
    meta = {"width": None, "height": None, "fps_num": None,
            "fps_den": None, "codec": None, "n_frames": None}
    frames: list[bytes] = []
    in_video_strl = {"flag": False}

    def walk(data: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            payload_end = min(pos + 8 + length, end)
            payload = data[pos + 8 : payload_end]
            if tag == b"LIST":
                kind = payload[:4]
                if kind in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(data, pos + 12, payload_end)
            elif tag == b"avih" and len(payload) >= 40:
                vals = struct.unpack("<10I", payload[:40])
                meta["n_frames"] = vals[4]
                meta["width"], meta["height"] = vals[8], vals[9]
            elif tag == b"strh" and len(payload) >= 32:
                # only the VIDEO stream's timing/codec belongs in meta —
                # an audio strh would otherwise overwrite it
                is_video = payload[:4] == b"vids"
                in_video_strl["flag"] = is_video
                if is_video:
                    meta["codec"] = payload[4:8].decode(
                        "ascii", errors="replace"
                    )
                    scale, rate = struct.unpack("<II", payload[20:28])
                    meta["fps_num"], meta["fps_den"] = rate, scale or 1
            elif tag == b"strf" and in_video_strl["flag"] and len(payload) >= 12:
                _sz, w, h = struct.unpack("<Iii", payload[:12])
                # BITMAPINFOHEADER is authoritative for frame dims
                meta["width"], meta["height"] = abs(w), abs(h)
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(bytes(payload))
            pos = payload_end + (length & 1)  # word alignment

    walk(b, 12, len(b))
    if meta["width"] is None or not frames:
        raise ValueError("truncated AVI (missing hdrl or movi frames)")
    if meta["n_frames"] in (None, 0):
        meta["n_frames"] = len(frames)
    return meta, frames


def encode_mp4(
    frames: list,
    width: int,
    height: int,
    timescale: int = 600,
    sample_deltas: list[int] | None = None,
    codec: bytes = b"jpeg",
    samples_per_chunk: int | None = None,
    co64: bool = False,
) -> bytes:
    """Encode per-frame compressed payloads (JPEG/PNG bytes) as a REAL
    ISO-BMFF (MP4/ISO 14496-12) file: ``ftyp`` + ``mdat`` (payloads) +
    trailing ``moov`` with a full video sample table — ``mvhd``,
    ``trak``/``tkhd``, ``mdia``(``mdhd``/``hdlr``:vide/``minf``), and
    ``stbl`` with ``stsd`` (visual sample entry carrying ``codec``'s
    FourCC + dims), ``stts`` (run-length per-sample deltas in
    ``timescale`` units), ``stsc``/``stco`` (chunk map; all samples in
    one chunk unless ``samples_per_chunk`` splits them — multi-chunk
    exercises a decoder's stsc expansion), and ``stsz``.  Pure stdlib
    ``struct``; the writer round-trip tests and fixture queries use to
    produce genuine container bytes — the same role
    :func:`encode_avi` plays for RIFF.

    ``sample_deltas`` defaults to a constant 1-second delta per frame.
    ``codec`` is the 4-byte sample-entry type (``b"jpeg"`` — the
    QuickTime/ISO motion-JPEG entry — or ``b"png "``); payload decoding
    sniffs bytes, so the FourCC is metadata.  ``co64=True`` writes
    64-bit chunk offsets (what a >4 GiB recording needs) so the
    decoder's ``co64`` path has a real producer."""
    import struct

    if not frames:
        raise ValueError("encode_mp4: at least one frame required")
    if len(codec) != 4:
        raise ValueError("encode_mp4: codec must be a 4-byte FourCC")
    frames = [bytes(f) for f in frames]
    n = len(frames)
    if sample_deltas is None:
        sample_deltas = [timescale] * n
    if len(sample_deltas) != n:
        raise ValueError(
            f"encode_mp4: {len(sample_deltas)} deltas for {n} frames"
        )
    spc = samples_per_chunk or n
    if spc < 1:
        raise ValueError("encode_mp4: samples_per_chunk must be >= 1")

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + tag + payload

    def full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
        return box(tag, struct.pack(">I", (version << 24) | flags) + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    # mdat directly after ftyp: chunk offsets are ABSOLUTE file offsets
    mdat_payload = b"".join(frames)
    mdat = box(b"mdat", mdat_payload)
    chunk_offsets, off = [], len(ftyp) + 8
    for i in range(0, n, spc):
        chunk_offsets.append(off)
        off += sum(len(f) for f in frames[i:i + spc])

    duration = sum(sample_deltas)
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = full(b"mvhd", 0, 0, struct.pack(
        ">IIIIIHH8x", 0, 0, timescale, duration, 0x10000, 0x100, 0
    ) + matrix + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = full(b"tkhd", 0, 7, struct.pack(
        ">III4xIQHHHH", 0, 0, 1, duration, 0, 0, 0, 0, 0
    ) + matrix + struct.pack(">II", width << 16, height << 16))
    mdhd = full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))  # lang 'und'
    hdlr = full(b"hdlr", 0, 0,
                b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    vmhd = full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = full(b"dref", 0, 0, struct.pack(">I", 1) + full(b"url ", 0, 1, b""))
    dinf = box(b"dinf", dref)
    entry = box(codec, struct.pack(
        ">6xH", 1                       # data_reference_index
    ) + struct.pack(
        ">HH12xHHIIIH", 0, 0, width, height, 0x480000, 0x480000, 0, 1
    ) + b"\x00" * 32 + struct.pack(">Hh", 0x18, -1))
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    # stts: run-length-encode the delta sequence
    runs: list[tuple[int, int]] = []
    for d in sample_deltas:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = full(b"stts", 0, 0, struct.pack(">I", len(runs))
                + b"".join(struct.pack(">II", c, d) for c, d in runs))
    stsc_entries = [(1, spc, 1)]
    if n % spc:
        # a short last chunk needs its own stsc run
        stsc_entries.append((len(chunk_offsets), n % spc, 1))
    stsc = full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                + b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stsz = full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(f)) for f in frames))
    if co64:
        stco = full(b"co64", 0, 0, struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">Q", o) for o in chunk_offsets))
    else:
        stco = full(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_mp4_audio(
    samples,
    sample_rate: int = 16_000,
    codec: bytes = b"sowt",
    samples_per_chunk: int = 4096,
    co64: bool = False,
) -> bytes:
    """Encode an ``(n,)`` or ``(n, channels)`` int16 array as a REAL
    ISO-BMFF audio file (the M4A shape): ``ftyp`` + ``mdat`` (raw PCM)
    + trailing ``moov`` with a ``soun``-handler track whose ``stbl``
    follows the standard uncompressed-PCM layout — one table sample per
    PCM frame (``stsz`` fixed size ``2·channels``, ``stts`` a single
    ``(n, 1)`` run, ``mdhd`` timescale = the sample rate), chunked
    every ``samples_per_chunk`` frames through ``stsc``/``stco`` (or
    ``co64``).  ``codec`` picks the sample-entry FourCC and byte
    order: ``sowt`` (little-endian, the WAV-matching default) or
    ``twos`` (big-endian).  Pure stdlib ``struct`` + numpy — the audio
    sibling of :func:`encode_mp4`, giving :func:`decode_mp4_audio` a
    genuine producer for round-trip tests and fixture queries."""
    import struct

    import numpy as np

    if codec not in (b"sowt", b"twos"):
        raise ValueError("encode_mp4_audio: codec must be sowt or twos")
    if samples_per_chunk < 1:
        raise ValueError("encode_mp4_audio: samples_per_chunk must be >= 1")
    # the v0 AudioSampleEntry samplerate field is 16.16 fixed-point, so
    # its integer part caps at 65535 — higher rates (88.2k/96k) need a
    # v1 entry; silently masking would write a wrong rate for
    # third-party readers (our decoder uses the mdhd timescale)
    if not 1 <= sample_rate <= 0xFFFF:
        raise ValueError(
            "encode_mp4_audio: sample_rate must be in [1, 65535] — the "
            "version-0 AudioSampleEntry 16.16 field cannot represent "
            f"higher rates (got {sample_rate}); use a v1 sample entry "
            "encoder for 88.2k/96k material"
        )
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if n < 1:
        raise ValueError("encode_mp4_audio: at least one sample required")
    dt = "<i2" if codec == b"sowt" else ">i2"
    data = np.ascontiguousarray(arr.astype(dt)).tobytes()
    fsize = 2 * ch

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + tag + payload

    def full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
        return box(tag, struct.pack(">I", (version << 24) | flags) + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = box(b"mdat", data)
    spc = samples_per_chunk
    chunk_offsets, off = [], len(ftyp) + 8
    for i in range(0, n, spc):
        chunk_offsets.append(off)
        off += fsize * min(spc, n - i)

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = full(b"mvhd", 0, 0, struct.pack(
        ">IIIIIHH8x", 0, 0, sample_rate, n, 0x10000, 0x100, 0
    ) + matrix + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = full(b"tkhd", 0, 7, struct.pack(
        ">III4xIQHHHH", 0, 0, 1, n, 0, 0, 0, 0x100, 0
    ) + matrix + struct.pack(">II", 0, 0))
    mdhd = full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, sample_rate, n, 0x55C4, 0))
    hdlr = full(b"hdlr", 0, 0,
                b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"audio\x00")
    smhd = full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    dref = full(b"dref", 0, 0, struct.pack(">I", 1) + full(b"url ", 0, 1, b""))
    dinf = box(b"dinf", dref)
    # AudioSampleEntry: 6 reserved + data_ref_index, then version/
    # revision/vendor, channelcount, samplesize, compression_id,
    # packet_size, samplerate as 16.16 fixed
    entry = box(codec, struct.pack(
        ">6xHHH4xHHHHI", 1, 0, 0, ch, 16, 0, 0,
        (sample_rate & 0xFFFF) << 16))
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc_entries = [(1, min(spc, n), 1)]
    if n % spc and n > spc:
        stsc_entries.append((len(chunk_offsets), n % spc, 1))
    stsc = full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                + b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stsz = full(b"stsz", 0, 0, struct.pack(">II", fsize, n))
    if co64:
        stco = full(b"co64", 0, 0, struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">Q", o) for o in chunk_offsets))
    else:
        stco = full(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", smhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _mp4_sample_table(b: bytes, handler: bytes, kind: str):
    """Shared ISO-BMFF track walk for :func:`decode_mp4` (``vide``) and
    :func:`decode_mp4_audio` (``soun``): top-level box scan → ``moov``
    → first ``handler``-matching ``trak`` → ``stbl``, expanding
    ``stts``/``stsz``/``stsc``+``stco``/``co64`` into per-sample byte
    slices of ``mdat``.  Returns ``(timescale, entry_start, samples,
    deltas)`` where ``entry_start`` indexes the first ``stsd`` sample
    entry's box header (callers parse their own visual/audio entry
    layout).  ``kind`` names the track in error messages."""
    import struct

    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")

    def children(data: bytes, pos: int, end: int):
        """Yield (tag, payload_start, payload_end) of the boxes in
        [pos, end); handles largesize and to-EOF boxes."""
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("truncated MP4 (largesize header)")
                (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
                body = pos + 16
            elif size == 0:
                size = end - pos
            if size < body - pos or pos + size > end:
                raise ValueError(f"truncated MP4 (box {tag!r})")
            yield tag, body, pos + size
            pos += size

    def find(data: bytes, pos: int, end: int, tag: bytes):
        for t, s, e in children(data, pos, end):
            if t == tag:
                return s, e
        return None

    moov = find(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("truncated MP4 (no moov box)")

    track = None
    for t, s, e in children(b, *moov):
        if t != b"trak":
            continue
        mdia = find(b, s, e, b"mdia")
        if mdia is None:
            continue
        hdlr = find(b, *mdia, b"hdlr")
        if hdlr and b[hdlr[0] + 8:hdlr[0] + 12] == handler:
            track = mdia
            break
    if track is None:
        raise ValueError(f"MP4 has no {kind} track")

    mdhd = find(b, *track, b"mdhd")
    if mdhd is None:
        raise ValueError("truncated MP4 (no mdhd)")
    version = b[mdhd[0]]
    timescale = struct.unpack(
        ">I", b[mdhd[0] + (20 if version == 1 else 12):][:4])[0]

    minf = find(b, *track, b"minf")
    stbl = find(b, *minf, b"stbl") if minf else None
    if stbl is None:
        raise ValueError("truncated MP4 (no stbl)")

    tabs = {t: (s, e) for t, s, e in children(b, *stbl)}
    for need in (b"stsd", b"stts", b"stsz", b"stsc"):
        if need not in tabs:
            raise ValueError(f"truncated MP4 (no {need.decode()})")
    if b"stco" not in tabs and b"co64" not in tabs:
        raise ValueError("truncated MP4 (no stco/co64)")

    # stsd: fullbox header + entry_count, then the first sample entry
    s, e = tabs[b"stsd"]
    entry_start = s + 8

    s, _ = tabs[b"stts"]
    (nruns,) = struct.unpack(">I", b[s + 4:s + 8])
    deltas: list[int] = []
    for i in range(nruns):
        c, d = struct.unpack(">II", b[s + 8 + i * 8:s + 16 + i * 8])
        deltas.extend([d] * c)

    s, _ = tabs[b"stsz"]
    fixed, n = struct.unpack(">II", b[s + 4:s + 12])
    if fixed:
        sizes = [fixed] * n
    else:
        sizes = list(struct.unpack(f">{n}I", b[s + 12:s + 12 + 4 * n]))

    if b"stco" in tabs:
        s, _ = tabs[b"stco"]
        (nch,) = struct.unpack(">I", b[s + 4:s + 8])
        offsets = list(struct.unpack(f">{nch}I", b[s + 8:s + 8 + 4 * nch]))
    else:
        s, _ = tabs[b"co64"]
        (nch,) = struct.unpack(">I", b[s + 4:s + 8])
        offsets = list(struct.unpack(f">{nch}Q", b[s + 8:s + 8 + 8 * nch]))

    s, _ = tabs[b"stsc"]
    (nsc,) = struct.unpack(">I", b[s + 4:s + 8])
    sc = [struct.unpack(">III", b[s + 8 + i * 12:s + 20 + i * 12])
          for i in range(nsc)]

    # expand the chunk map: per-chunk samples_per_chunk, then walk
    # each chunk's samples accumulating sizes from its base offset
    frames: list[bytes] = []
    si = 0
    for ci in range(len(offsets)):  # chunks are 1-based in stsc
        spc = 0
        for first, count, _sdi in sc:
            if first <= ci + 1:
                spc = count
        pos = offsets[ci]
        for _ in range(spc):
            if si >= n:
                break
            if pos + sizes[si] > len(b):
                raise ValueError("truncated MP4 (sample beyond EOF)")
            frames.append(b[pos:pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si < n:
        raise ValueError(
            f"truncated MP4 (chunk map covers {si} of {n} samples)")
    if len(deltas) < n:
        deltas.extend([deltas[-1] if deltas else timescale] * (n - len(deltas)))
    return int(timescale), entry_start, frames, deltas[:n]


def decode_mp4(b: bytes):
    """REAL ISO-BMFF (MP4) demux, pure stdlib ``struct`` — the
    sample-table walk of the public ISO/IEC 14496-12 structure, the
    same way :func:`decode_avi` walks RIFF: top-level box scan →
    ``moov`` → first ``vide``-handler ``trak`` → ``stbl``, expanding
    ``stts`` (per-sample deltas), ``stsz`` (sizes), and
    ``stsc``+``stco``/``co64`` (chunk map → ABSOLUTE file offsets) into
    per-sample byte ranges sliced straight out of ``mdat``.  Returns
    ``(meta, frames, deltas)``: ``meta`` carries ``width``/``height``
    (from the visual sample entry), ``timescale`` (from ``mdhd``),
    ``codec`` (sample-entry FourCC), ``n_frames``; ``frames`` is the
    raw payload list and ``deltas`` the per-frame durations in
    ``timescale`` units.  64-bit ``co64`` offsets and size-0
    (to-EOF) / size-1 (largesize) boxes are handled; a missing video
    trak or truncated sample table raises ``ValueError``."""
    import struct

    timescale, entry_start, frames, deltas = _mp4_sample_table(
        b, b"vide", "video")
    codec = b[entry_start + 4:entry_start + 8].decode("ascii",
                                                      errors="replace")
    w, h = struct.unpack(">HH", b[entry_start + 32:entry_start + 36])
    meta = {"width": int(w), "height": int(h), "timescale": timescale,
            "codec": codec, "n_frames": len(frames)}
    return meta, frames, deltas


def decode_mp4_audio(b: bytes):
    """REAL MP4/M4A PCM audio demux (pure stdlib ``struct`` + numpy):
    the first ``soun``-handler track's sample table expanded by the
    same ISO-BMFF walk :func:`decode_mp4` uses, with the payload
    interpreted per the audio sample entry's FourCC — ``sowt``
    (little-endian int16 PCM) or ``twos`` (big-endian), the two
    QuickTime/ISO uncompressed-audio entries.  Returns ``(sample_rate,
    samples)`` with samples an ``(n, channels)`` int16 array — the
    exact contract of :func:`decode_wav`, so every audio operator
    works on MP4 input unchanged.  The sample rate is the track's
    ``mdhd`` timescale (for PCM tracks the two are the same clock; the
    16.16 rate in the sample entry is ignored).  Compressed codecs
    (AAC/``mp4a``) need an audio library — ``ValueError``, same
    contract as :func:`decode_wav` on MP3."""
    import struct

    import numpy as np

    timescale, entry_start, samples, _deltas = _mp4_sample_table(
        b, b"soun", "audio")
    fourcc = b[entry_start + 4:entry_start + 8]
    if fourcc not in (b"sowt", b"twos"):
        raise ValueError(
            f"unsupported MP4 audio codec {fourcc!r}; only sowt/twos "
            "(uncompressed int16 PCM) decode without an audio library"
        )
    # AudioSampleEntry: 8 header + 6 reserved + 2 dri + 2 version +
    # 2 revision + 4 vendor, then channelcount(2) samplesize(2)
    ch, bits = struct.unpack(
        ">HH", b[entry_start + 24:entry_start + 28])
    if bits != 16 or ch < 1:
        raise ValueError(
            f"unsupported MP4 PCM layout (channels={ch} bits={bits}); "
            "only int16 decodes"
        )
    data = b"".join(samples)
    dt = "<i2" if fourcc == b"sowt" else ">i2"
    arr = np.frombuffer(
        data[: len(data) - (len(data) % (2 * ch))], dtype=dt
    ).astype(np.int16, copy=False).reshape(-1, ch)
    return timescale, arr


def decode_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    stride: int = 1,
    max_frames: int | None = None,
    errors: str = "raise",
) -> DataFrame:
    """REAL video frame sampling over a video binary column: one output
    row per sampled frame — ``(id, frame_idx, width, height, channels,
    delay_num, delay_den, pixel_sum)`` with ``pixel_sum`` the exact
    integer sum of the frame's decoded bytes.  ``stride`` keeps every
    Nth frame and ``max_frames`` caps the fan-out — the same knobs an
    ffmpeg frame sampler exposes.  ``errors`` as in :func:`decode_image`.

    Container tiers, sniffed per payload:

    - **APNG** (``\\x89PNG``): acTL/fcTL/fdAT walk via
      :func:`decode_apng`; per-frame delays from fcTL.
    - **AVI** (``RIFF…AVI␣``): real-world container demux via
      :func:`decode_avi` — MJPEG-in-AVI and PNG-in-AVI (``MPNG``), the
      formats scraped web video actually arrives in.  Per-frame delay is
      the stream timing (``dwScale/dwRate``).  PNG payloads decode fully
      (dims + exact ``pixel_sum``); JPEG payloads decode through the
      built-in baseline-sequential decoder (:func:`~.jpeg.decode_jpeg` —
      real DCT/Huffman, deterministic in every environment, used even
      when pillow is importable so ``pixel_sum`` never depends on a
      libjpeg IDCT variant).  Payloads outside the baseline process
      (progressive JPEG) degrade to REAL header dims via
      :func:`jpeg_dimensions` + NULL ``pixel_sum``.
    - **MP4/ISO-BMFF** (``ftyp`` at offset 4; round 8 — the container a
      real user's video corpus actually arrives in): full sample-table
      demux via :func:`decode_mp4` (stsd/stts/stsc/stsz/stco walk to
      absolute ``mdat`` offsets); JPEG/PNG sample payloads decode
      through the same codec tiers as AVI, and per-frame delay is the
      ``stts`` sample delta over the ``mdhd`` timescale.

    Scale shape: ``mapInPandas`` fan-out, Arrow-batched, no shuffle —
    identical plumbing to :func:`sample_frames`, but over genuinely
    demuxed + decoded container frames.
    """
    if errors not in ("raise", "skip", "null"):
        raise ValueError(f"decode_video_frames: errors must be raise|skip|null, got {errors!r}")
    if stride < 1:
        raise ValueError("decode_video_frames: stride must be >= 1")
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("delay_num", LongType()),
        StructField("delay_den", LongType()),
        StructField("pixel_sum", LongType()),
    ])

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg import decode_jpeg

        def decode_payload(p: bytes, dn, dd, container: str):
            """One demuxed compressed payload → the normalized record."""
            if p[:8] == _PNG_SIG:  # PNG payload: full decode
                arr = decode_png(p)
                h, w, ch = arr.shape
                return (w, h, ch, dn, dd, int(arr.astype(np.int64).sum()))
            if p[:2] == b"\xff\xd8":
                # MJPEG: the built-in baseline decoder, ALWAYS —
                # never pillow here even when importable: libjpeg
                # IDCT variants differ by ±1/pixel, which would
                # make pixel_sum environment-dependent and break
                # oracle hashes across machines.  Payloads the
                # baseline decoder rejects (progressive JPEG)
                # degrade to REAL header dims + NULL pixel_sum.
                try:
                    arr = decode_jpeg(p)
                    h, w, ch = arr.shape
                    return (w, h, ch, dn, dd,
                            int(arr.astype(np.int64).sum()))
                except ValueError:
                    w, h, ch = jpeg_dimensions(p)
                    return (w, h, ch, dn, dd, None)
            raise ValueError(
                f"unsupported {container} frame payload (not JPEG/PNG)"
            )

        def demux(data: bytes):
            """→ [(w, h, ch, delay_num, delay_den, pixel_sum), ...] —
            one normalized record per frame, container-independent."""
            if data[:4] == b"RIFF":
                meta, payloads = decode_avi(data)
                # per-frame duration = dwScale/dwRate seconds
                dn = meta["fps_den"] or 1
                dd = meta["fps_num"] or 1
                return [decode_payload(p, dn, dd, "AVI") for p in payloads]
            if len(data) >= 12 and data[4:8] == b"ftyp":
                # MP4/ISO-BMFF (round 8): per-frame duration is the
                # stts sample delta over the mdhd timescale
                meta, payloads, deltas = decode_mp4(data)
                ts = meta["timescale"] or 1
                return [decode_payload(p, int(d), ts, "MP4")
                        for p, d in zip(payloads, deltas)]
            return [
                (arr.shape[1], arr.shape[0], arr.shape[2], dn, dd,
                 int(arr.astype(np.int64).sum()))
                for arr, dn, dd in decode_apng(data)
            ]

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    frames = demux(bytes(content))
                except Exception:
                    if errors == "raise":
                        raise
                    if errors == "skip":
                        continue
                    rows.append((doc_id, None, None, None, None, None,
                                 None, None))
                    continue
                kept = 0
                for idx in range(0, len(frames), stride):
                    if max_frames is not None and kept >= max_frames:
                        break
                    w, h, ch, dn, dd, psum = frames[idx]
                    rows.append((doc_id, idx, w, h, ch, dn, dd, psum))
                    kept += 1
            yield pd.DataFrame(rows, columns=[
                id_col, "frame_idx", "width", "height", "channels",
                "delay_num", "delay_den", "pixel_sum",
            ])

    return df.select(id_col, content_col).mapInPandas(sample, schema)


def png_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    errors: str = "raise",
) -> DataFrame:
    """Extract PNG header + ``tEXt``/``zTXt`` metadata WITHOUT decoding
    pixels: ``(id, width, height, channels, meta map<string,string>)``.

    A training pipeline routinely filters scraped images on embedded
    metadata (generator tags, copyright, software) before paying for a
    decode — this walk reads only the chunk directory (IHDR + text
    chunks; IDAT is skipped wholesale), so it costs header bytes, not
    pixel bytes.  ``zTXt`` values are zlib-inflated (the real format);
    non-latin-1 ``iTXt`` is skipped (needs utf-8 handling per spec —
    keys are reported with a ``itxt:`` prefix and empty value so their
    presence is still visible).  ``errors`` as in :func:`decode_image`.
    """
    if errors not in ("raise", "skip", "null"):
        raise ValueError(f"png_metadata: errors must be raise|skip|null, got {errors!r}")
    from pyspark.sql.types import MapType, StringType

    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("meta", MapType(StringType(), StringType())),
    ])

    def walk(b: bytes):
        import struct
        import zlib

        if b[:8] != _PNG_SIG:
            raise ValueError("not a PNG (bad signature)")
        pos, meta, dims = 8, {}, None
        while pos + 8 <= len(b):
            (length,) = struct.unpack(">I", b[pos : pos + 4])
            tag = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                w, h, _depth, ctype, _c, _f, _i = struct.unpack(
                    ">IIBBBBB", data
                )
                dims = (w, h, _PNG_CHANNELS.get(ctype))
            elif tag == b"tEXt":
                k, _, v = data.partition(b"\x00")
                meta[k.decode("latin-1")] = v.decode("latin-1")
            elif tag == b"zTXt":
                k, _, rest = data.partition(b"\x00")
                if rest[:1] == b"\x00":  # compression method 0 = zlib
                    meta[k.decode("latin-1")] = zlib.decompress(
                        rest[1:]
                    ).decode("latin-1")
            elif tag == b"iTXt":
                k, _, _rest = data.partition(b"\x00")
                meta["itxt:" + k.decode("latin-1")] = ""
            elif tag == b"IEND":
                break
        if dims is None:
            raise ValueError("truncated PNG (missing IHDR)")
        return dims, meta

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs, metas = [], [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    (w, h, ch), meta = walk(bytes(content))
                except Exception:
                    if errors == "raise":
                        raise
                    if errors == "skip":
                        continue
                    w = h = ch = None
                    meta = None
                ids.append(doc_id)
                ws.append(w); hs.append(h); chs.append(ch)
                metas.append(meta)
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="object"),
                "width": pd.Series(ws, dtype="object"),
                "height": pd.Series(hs, dtype="object"),
                "channels": pd.Series(chs, dtype="object"),
                "meta": pd.Series(metas, dtype="object"),
            })

    return df.select(id_col, content_col).mapInPandas(extract, schema)
