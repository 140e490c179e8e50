"""Perceptual near-duplicate detection for media columns.

Text near-dup (MinHash/SimHash, ``operators/dedup.py``) keys on tokens;
scraped IMAGE, AUDIO, and VIDEO corpora need the same treatment keyed on
*content*: the same photo re-encoded, re-scaled, brightness-shifted,
re-sampled, or re-containered should collapse to one training example.  This module maps
each media binary to a compact fixed-width bit signature — a perceptual
hash — and feeds the signatures to the generic banded Hamming join
(:func:`~.dedup.hamming_pairs`), so media dedup inherits the exact scale
shape text dedup already has: one Arrow-batched decode pass (no
shuffle), one band-bucketed candidate join (never all-pairs), bit-math
verification in codegen.

Signatures implemented (all REAL math over really-decoded pixels /
samples — the decode tier is ``operators/multimodal.py``'s pure-Python
PNG/WAV codecs, or pillow when importable):

- **dHash** (difference hash): area-downscale to ``(N, N+1)`` grayscale,
  emit the sign of each horizontal gradient — N²=64 bits at the default
  N=8.  Invariant to uniform brightness/contrast shifts and to any
  rescale that preserves gradient signs; the standard web-dedup hash.
- **aHash** (average hash): N² cells vs their global mean.  Cheaper,
  slightly less robust; kept for corpora where dHash's gradient bias
  hurts (flat-field scans).
- **per-frame video dHash** (round 11): demux the container (APNG /
  AVI / MP4 — the same tiers as ``decode_video_frames``), dHash each
  sampled frame, and aggregate banded-Hamming FRAME matches into
  video-pair evidence (``least`` of the two sides' distinct matched
  frames, so a static title card cannot inflate the score).  A
  re-encoded, re-graded, or re-containered copy matches on nearly
  every sampled frame.
- **audio fingerprint**: frame the waveform, take per-frame log-energy
  in ``bands`` frequency bands (Goertzel-free: rectangular DFT bins via
  numpy matmul), emit Haitsma-Kalker-style sign-quantized bits — band
  log-energy vs the frame's mean log-energy (spectral contrast).  Gain
  scales every band equally, so the bits are amplitude-invariant, and
  unlike pure temporal-delta bits they stay informative for
  steady-spectrum content (tones, drones) where deltas are all ≈0.

100 TB shape: hashing is ``mapInPandas`` over the stored binaries —
partition-preserving, scan-bound, embarrassing-parallel; signatures are
8 bytes/row, so the pair join's input is ~1/10⁶ the corpus bytes.  The
banded join is the ONLY shuffle and its payload is (id, 8-byte sig).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .dedup import hamming_pairs

__all__ = [
    "dhash_images",
    "ahash_images",
    "image_dup_pairs",
    "audio_fingerprint",
    "audio_dup_pairs",
    "video_frame_hashes",
    "video_dup_pairs",
]


def _to_gray(arr):
    """(h, w, ch) uint8 → float64 grayscale via integer-friendly luma
    (Rec.601 weights on RGB; alpha ignored; 1-channel passthrough)."""
    import numpy as np

    a = arr.astype(np.float64)
    if a.shape[2] == 1:
        return a[:, :, 0]
    if a.shape[2] == 2:  # gray + alpha
        return a[:, :, 0]
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def _area_resize(g, out_h: int, out_w: int):
    """Area-mean downscale of a 2-D array to (out_h, out_w): average each
    cell's covering block (np.add.reduceat on linspace edges).  Upscale
    degenerates to nearest — fine for hash-sized targets."""
    import numpy as np

    h, w = g.shape
    ye = np.linspace(0, h, out_h + 1).astype(np.int64)
    xe = np.linspace(0, w, out_w + 1).astype(np.int64)
    # degenerate (repeated) edges when the source is smaller than the
    # target: reduceat returns the single element at the start index and
    # the count fix below divides by 1 — i.e. nearest-neighbor upscale
    rows = np.add.reduceat(g, ye[:-1], axis=0)
    cells = np.add.reduceat(rows, xe[:-1], axis=1)
    counts = np.outer(np.diff(ye), np.diff(xe)).astype(np.float64)
    counts[counts == 0] = 1.0
    return cells / counts


def _pack_bits(bits) -> int:
    """Flat 0/1 array (≤64 entries) → signed int64, bit i = entry i."""
    import numpy as np

    v = np.uint64(0)
    for i, b in enumerate(np.asarray(bits).ravel()):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(v.astype(np.int64))


def _hash_images(
    df: DataFrame,
    id_col: str,
    content_col: str,
    hash_size: int,
    errors: str,
    out_col: str,
    kind: str,
    decoder=None,
) -> DataFrame:
    if errors not in ("raise", "skip"):
        raise ValueError(f"errors must be raise|skip, got {errors!r}")
    if not 2 <= hash_size <= 8:
        raise ValueError(f"hash_size must be in [2, 8] (≤64 bits), got {hash_size}")
    try:  # pragma: no cover - pillow absent in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField(out_col, LongType()),
    ])

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg import decode_jpeg
        from .multimodal import _PNG_SIG, decode_png

        def decode(b: bytes):
            try:
                if b[:8] == _PNG_SIG:
                    return decode_png(b)
                if b[:2] == b"\xff\xd8":
                    # built-in baseline decoder ALWAYS, even with pillow
                    # importable: libjpeg IDCT variants differ by ±1/pixel,
                    # which would make signatures environment-dependent —
                    # same determinism policy as decode_video_frames
                    return decode_jpeg(b)
                if have_pil:  # pragma: no cover - real PIL path (other fmts)
                    import io

                    from PIL import Image

                    arr = np.asarray(Image.open(io.BytesIO(b)))
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    return arr
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
            ids, sigs = [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    g = _to_gray(decode(bytes(content)))
                except Exception:
                    if errors == "raise":
                        raise
                    continue
                if kind == "dhash":
                    cells = _area_resize(g, hash_size, hash_size + 1)
                    bits = cells[:, 1:] > cells[:, :-1]
                else:  # ahash
                    cells = _area_resize(g, hash_size, hash_size)
                    bits = cells > cells.mean()
                ids.append(doc_id)
                sigs.append(_pack_bits(bits))
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="object"),
                out_col: pd.Series(sigs, dtype="object"),
            })

    return df.select(id_col, content_col).mapInPandas(hash_batch, schema)


def dhash_images(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    hash_size: int = 8,
    errors: str = "raise",
    out_col: str = "dhash",
    decoder=None,
) -> DataFrame:
    """Difference-hash each image binary: ``(id, dhash int64)``.

    Bit ``r*hash_size + c`` is ``1`` iff the area-downscaled grayscale
    cell ``(r, c+1)`` is brighter than ``(r, c)`` — gradient signs, so a
    uniform brightness/contrast change or a gradient-preserving rescale
    leaves the hash IDENTICAL, and small local edits flip only the bits
    whose cells they touch.  ``errors="skip"`` drops undecodable rows
    (web-scrape mode); ``"raise"`` fails the job.

    Decoder policy (determinism over coverage): every JPEG payload is
    decoded by the in-repo BASELINE codec even when pillow is
    importable, because libjpeg IDCT variants differ by ±1/pixel and
    would make signatures environment-dependent.  The tradeoff:
    progressive JPEGs (SOF2 — common in web corpora) raise where PIL
    would have decoded them, so with the default ``errors="raise"``
    one such file fails the whole job.  For wild corpora run with
    ``errors="skip"`` (or pre-filter on
    :func:`~.multimodal.sniff_media` + a progressive probe) and count
    the drops; an environment-pinned PIL fallback is a deliberate
    non-goal.

    Scale shape: one ``mapInPandas`` decode pass, no shuffle; 8 bytes of
    signature per image regardless of image size.
    """
    return _hash_images(df, id_col, content_col, hash_size, errors,
                        out_col, "dhash", decoder=decoder)


def ahash_images(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    hash_size: int = 8,
    errors: str = "raise",
    out_col: str = "ahash",
    decoder=None,
) -> DataFrame:
    """Average-hash each image binary: bit = cell brighter than the
    image mean.  Same plan shape as :func:`dhash_images`."""
    return _hash_images(df, id_col, content_col, hash_size, errors,
                        out_col, "ahash", decoder=decoder)


def image_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    hash_size: int = 8,
    max_hamming: int = 6,
    bands: int = 8,
    clean_bands: int = 2,
    errors: str = "raise",
    decoder=None,
) -> DataFrame:
    """Near-duplicate image pairs: dHash + banded Hamming join.

    ``(id_a, id_b, hamming)`` with ``id_a < id_b`` for every pair of
    images whose dHashes differ in ≤ ``max_hamming`` of the
    ``hash_size²`` bits.  Candidates come from the pigeonhole band join
    (:func:`~.dedup.hamming_pairs`) — never an all-pairs comparison; the
    corpus binaries are read exactly once (the hash pass).

    Defaults (64-bit dHash, Hamming ≤ 6, 8 bands, 2 clean bands ⇒
    16-bit compound bucket keys) match the common web-dedup operating
    point: re-encodes and brightness shifts land at distance 0-4,
    unrelated photos at ~32.  ``clean_bands=2`` is what keeps the
    candidate join linear past ~10⁵ images — single 8-bit bands have
    only 256 buckets (see SCALE.md's image_dups rows).
    """
    bits = hash_size * hash_size
    sig = dhash_images(df, id_col, content_col, hash_size, errors,
                       decoder=decoder)
    return hamming_pairs(sig, id_col, "dhash", bits=bits,
                         max_hamming=max_hamming, bands=bands,
                         clean_bands=clean_bands)


# ---------------------------------------------------------------------------
# Audio fingerprints (Haitsma-Kalker sign-of-energy-delta bits)
# ---------------------------------------------------------------------------


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    frame: int = 1024,
    n_frames: int = 8,
    bands: int = 8,
    errors: str = "raise",
    out_col: str = "afp",
    decoder=None,
) -> DataFrame:
    """Fingerprint audio binaries: ``(id, afp int64)``.

    Decode (WAV via ``operators/multimodal.py:decode_wav``, MP4/M4A PCM
    via ``decode_mp4_audio`` — container sniffed per row, round 8),
    take the first ``n_frames`` non-overlapping frames of
    ``frame`` samples, compute each frame's power spectrum (one
    vectorized ``rfft`` per clip), sum it into ``bands`` log-spaced
    frequency bands, and emit ``n_frames × bands`` spectral-contrast
    bits: bit set iff the band's log-energy exceeds the frame's mean
    log-energy.  Gain multiplies every band energy equally (adds a
    constant in log space, removed by the mean), so the bits — like
    dHash's gradients — are amplitude-invariant, and steady-spectrum
    content still produces a distinctive pattern.  Clips shorter than
    ``frame`` samples hash to 0.

    ``n_frames * bands`` must be ≤ 64 (one int64 signature).

    ``decoder`` (round 9): user fallback for compressed codecs
    (AAC/``mp4a``, MP3 — see ``multimodal._decode_audio_bytes``); its
    samples flow through the identical fingerprint math, so a decoded
    M4A copy collides with its WAV source cross-container.
    """
    if n_frames * bands > 64:
        raise ValueError(
            f"n_frames*bands must be <= 64, got {n_frames * bands}"
        )
    if errors not in ("raise", "skip"):
        raise ValueError(f"errors must be raise|skip, got {errors!r}")

    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField(out_col, LongType()),
    ])

    def fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .multimodal import _decode_audio_bytes

        # log-spaced band edges over the positive-frequency bins (bin 0,
        # DC, excluded — it carries offset, not content); shared across
        # the whole batch
        edges = np.unique(
            np.geomspace(1, frame // 2 + 1, bands + 1).astype(np.int64)
        )
        if len(edges) != bands + 1:
            raise ValueError(
                f"frame={frame} too short for {bands} log-spaced bands"
            )

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    _rate, samples = _decode_audio_bytes(bytes(content),
                                                         decoder)
                except Exception:
                    if errors == "raise":
                        raise
                    continue
                x = np.asarray(samples, dtype=np.float64)
                if x.ndim > 1:  # mixdown
                    x = x.mean(axis=1)
                usable = min(len(x) // frame, n_frames)
                sig = 0
                if usable >= 1:
                    fr = x[: usable * frame].reshape(usable, frame)
                    power = np.abs(np.fft.rfft(fr, axis=1)) ** 2
                    # band log-energy per frame; +1 floors the log
                    e = np.log1p(
                        np.add.reduceat(power[:, : frame // 2 + 1],
                                        edges[:-1], axis=1)
                    )
                    contrast = e > e.mean(axis=1, keepdims=True)
                    bits = np.zeros((n_frames, bands), dtype=bool)
                    bits[:usable] = contrast
                    sig = _pack_bits(bits)
                ids.append(doc_id)
                sigs.append(sig)
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="object"),
                out_col: pd.Series(sigs, dtype="object"),
            })

    return df.select(id_col, content_col).mapInPandas(fp_batch, schema)


def audio_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    frame: int = 1024,
    n_frames: int = 8,
    fp_bands: int = 8,
    max_hamming: int = 6,
    join_bands: int = 8,
    clean_bands: int = 2,
    errors: str = "raise",
    decoder=None,
) -> DataFrame:
    """Near-duplicate audio pairs: fingerprint + banded Hamming join —
    the audio twin of :func:`image_dup_pairs`, same one-scan/one-shuffle
    scale shape (incl. the ``clean_bands=2`` compound bucket keys).
    Signature width is ``n_frames * fp_bands`` bits, padded to the next
    multiple of ``join_bands``."""
    bits = n_frames * fp_bands
    bits += (-bits) % join_bands
    sig = audio_fingerprint(df, id_col, content_col, frame, n_frames,
                            fp_bands, errors, decoder=decoder)
    return hamming_pairs(sig, id_col, "afp", bits=bits,
                         max_hamming=max_hamming, bands=join_bands,
                         clean_bands=clean_bands)


# ---------------------------------------------------------------------------
# Video near-dup (per-frame dHash over REALLY demuxed + decoded frames)
# ---------------------------------------------------------------------------


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    hash_size: int = 8,
    stride: int = 1,
    max_frames: int = 8,
    errors: str = "raise",
    decoder=None,
) -> DataFrame:
    """Per-frame dHash over a video binary column: ``(id, frame_idx,
    fhash int64)`` — the video member of the perceptual-signature
    family, over GENUINELY demuxed and decoded frames (the same
    container tiers as :func:`~.multimodal.decode_video_frames`: APNG
    chunk walk, AVI RIFF demux, MP4 sample-table demux; PNG payloads
    fully decoded, MJPEG through the in-repo baseline JPEG codec — the
    same determinism policy as :func:`dhash_images`, so signatures
    never depend on a libjpeg variant).

    ``stride`` keeps every Nth frame and ``max_frames`` caps the
    fan-out, exactly as in ``decode_video_frames``.  Per-frame decode
    failures (e.g. a progressive-JPEG payload the baseline codec
    refuses) follow ``errors``: ``"raise"`` fails the job, ``"skip"``
    drops the FRAME (an undecodable container drops the whole row).

    ``decoder``: the compressed-codec escape hatch, same contract as
    :func:`~.multimodal.sample_frames` — a callable ``bytes ->
    iterable[pixel array] | None`` (e.g. a PyAV/ffmpeg H.264 frame
    grab) tried FIRST per row; ``None`` falls back to the built-in
    container tiers, so mixed corpora degrade gracefully while the
    engine keeps the stride/cap/hash/batching.  Note the signatures
    then inherit the external decoder's determinism, not the built-in
    codecs' — pin the decoder build if cross-run hash identity
    matters.

    Scale shape: one ``mapInPandas`` decode pass, no shuffle; ≤
    ``max_frames`` × 8 bytes of signature per video regardless of
    video size.
    """
    if errors not in ("raise", "skip"):
        raise ValueError(f"errors must be raise|skip, got {errors!r}")
    if not 2 <= hash_size <= 8:
        raise ValueError(
            f"hash_size must be in [2, 8] (≤64 bits), got {hash_size}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("frame_idx", LongType()),
        StructField("fhash", LongType()),
    ])

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg import decode_jpeg
        from .multimodal import (
            _PNG_SIG,
            decode_apng,
            decode_avi,
            decode_mp4,
            decode_png,
        )

        def payload_array(p: bytes):
            if p[:8] == _PNG_SIG:
                return decode_png(p)
            if p[:2] == b"\xff\xd8":
                return decode_jpeg(p)  # baseline ALWAYS (determinism)
            raise ValueError("unsupported frame payload (not JPEG/PNG)")

        def demux_arrays(data: bytes):
            if decoder is not None:
                decoded = decoder(data)
                if decoded is not None:
                    return list(decoded), None
            if data[:4] == b"RIFF":
                _, payloads = decode_avi(data)
                return payloads, payload_array
            if len(data) >= 12 and data[4:8] == b"ftyp":
                _, payloads, _ = decode_mp4(data)
                return payloads, payload_array
            return [a for a, _, _ in decode_apng(data)], None

        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    frames, to_arr = demux_arrays(bytes(content))
                except Exception:
                    if errors == "raise":
                        raise
                    continue
                kept = 0
                for idx in range(0, len(frames), stride):
                    if kept >= max_frames:
                        break
                    try:
                        arr = (frames[idx] if to_arr is None
                               else to_arr(frames[idx]))
                        arr = np.asarray(arr, dtype=np.uint8)
                        if arr.ndim == 2:
                            arr = arr[:, :, None]
                        g = _to_gray(arr)
                        cells = _area_resize(g, hash_size, hash_size + 1)
                        bits = cells[:, 1:] > cells[:, :-1]
                    except Exception:
                        if errors == "raise":
                            raise
                        continue
                    ids.append(doc_id)
                    idxs.append(idx)
                    sigs.append(_pack_bits(bits))
                    kept += 1
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "fhash": pd.Series(sigs, dtype="object"),
            })

    return df.select(id_col, content_col).mapInPandas(hash_batch, schema)


def video_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    hash_size: int = 8,
    stride: int = 1,
    max_frames: int = 8,
    max_hamming: int = 6,
    join_bands: int = 8,
    clean_bands: int = 2,
    min_matches: int = 2,
    errors: str = "raise",
    decoder=None,
) -> DataFrame:
    """Near-duplicate video pairs: per-frame dHash + banded Hamming
    FRAME join + per-video-pair evidence aggregation — the video twin
    of :func:`image_dup_pairs`.

    ``(id_a, id_b, matched_frames, min_hamming)`` with ``id_a < id_b``
    for every pair of videos where at least ``min_matches`` frames
    agree: ``matched_frames = least(#distinct matching frames of a,
    #distinct matching frames of b)`` — the ``least`` keeps a single
    static frame that matches everything (title cards, black frames)
    from inflating the score, and a re-encoded / brightness-shifted
    copy matches on nearly every sampled frame.

    Scale shape: one decode pass (``mapInPandas``, no shuffle), one
    banded-join shuffle whose payload is frame-level ``(video,
    frame_idx, 8-byte sig)`` — ≤ ``max_frames`` rows per video, never
    an all-pairs comparison — and one (id_a, id_b)-keyed aggregate
    over the surviving frame matches.  Same ``clean_bands=2`` compound
    bucket keys as the image family (SCALE.md).

    Key-width guidance: frames MULTIPLY the join's row count (a corpus
    of V videos probes with up to ``V × max_frames`` signatures), so
    the 16-bit compound buckets saturate ``max_frames``× sooner than
    for still images — the sf0.01→sf0.1 byte census already shows the
    candidate set growing superlinearly (METRICS.md).  Past ~10⁵
    FRAMES either widen the keys (``join_bands=16, clean_bands=4`` at
    ``max_hamming≤12``-equivalent recall arithmetic) or pre-collapse
    exact copies first (group by ``fhash`` — re-encodes land at
    distance 0, which is most of a scraped corpus's duplication) and
    run the banded join on the survivors.
    """
    if min_matches < 1:
        raise ValueError(f"min_matches must be >= 1, got {min_matches}")
    bits = hash_size * hash_size
    bits += (-bits) % join_bands
    fh = video_frame_hashes(df, id_col, content_col, hash_size, stride,
                            max_frames, errors, decoder=decoder)
    # frame-level ids: struct ordering is (vid, idx) lexicographic, so
    # hamming_pairs' id_a < id_b gives vid_a <= vid_b for free and the
    # same-video filter below leaves a strict vid_a < vid_b
    fid = F.struct(F.col(id_col).alias("vid"),
                   F.col("frame_idx").alias("idx"))
    pairs = hamming_pairs(
        fh.select(fid.alias("__fid"), "fhash"), "__fid", "fhash",
        bits=bits, max_hamming=max_hamming, bands=join_bands,
        clean_bands=clean_bands,
    )
    return (
        pairs.select(
            F.col("id_a.vid").alias("id_a"),
            F.col("id_a.idx").alias("__fa"),
            F.col("id_b.vid").alias("id_b"),
            F.col("id_b.idx").alias("__fb"),
            "hamming",
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.countDistinct("__fa").alias("__ma"),
            F.countDistinct("__fb").alias("__mb"),
            F.min("hamming").alias("min_hamming"),
        )
        .withColumn("matched_frames",
                    F.least(F.col("__ma"), F.col("__mb")).cast("long"))
        .filter(F.col("matched_frames") >= min_matches)
        .select("id_a", "id_b", "matched_frames", "min_hamming")
    )
