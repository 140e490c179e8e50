"""Perceptual media near-dup: dHash/aHash invariances, banded Hamming
pair recall/soundness, audio fingerprint gain-invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.media_dedup import (
    _area_resize,
    ahash_images,
    audio_dup_pairs,
    audio_fingerprint,
    dhash_images,
    image_dup_pairs,
)
from database_transportor_spark.operators.multimodal import (
    encode_png,
    encode_wav,
)


def _img(seed: int, h: int = 24, w: int = 24) -> np.ndarray:
    """Deterministic pseudo-random grayscale image, pixels in 0..250
    (headroom so brightness shifts never clip)."""
    import hashlib

    need, blocks = h * w, []
    i = 0
    while sum(len(b) for b in blocks) < need:
        blocks.append(hashlib.sha256(f"{seed}:{i}".encode()).digest())
        i += 1
    raw = b"".join(blocks)[:need]
    return (np.frombuffer(raw, dtype=np.uint8) % 251).reshape(h, w, 1)


def _media_df(spark, items):
    """items: list of (id, png_bytes)."""
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in items], "doc_id long, content binary"
    )


class TestAreaResize:
    def test_exact_block_means(self):
        g = np.arange(16, dtype=np.float64).reshape(4, 4)
        out = _area_resize(g, 2, 2)
        assert out.shape == (2, 2)
        assert out[0, 0] == np.mean([0, 1, 4, 5])
        assert out[1, 1] == np.mean([10, 11, 14, 15])

    def test_upscale_degenerates_to_nearest(self):
        g = np.array([[1.0, 2.0]])
        out = _area_resize(g, 2, 4)
        assert out.shape == (2, 4)
        assert set(np.unique(out)) <= {1.0, 2.0}


class TestDHash:
    def test_brightness_shift_is_invariant(self, spark):
        base = _img(7)
        bright = np.clip(base.astype(np.int64) + 3, 0, 255).astype(np.uint8)
        df = _media_df(spark, [(1, encode_png(base)), (2, encode_png(bright))])
        got = {r["doc_id"]: r["dhash"] for r in dhash_images(df).collect()}
        assert got[1] == got[2]

    def test_distinct_images_far_apart(self, spark):
        df = _media_df(spark, [(i, encode_png(_img(i))) for i in range(8)])
        sigs = [r["dhash"] for r in dhash_images(df).collect()]
        assert len(set(sigs)) == 8
        for i in range(8):
            for j in range(i + 1, 8):
                assert bin(sigs[i] ^ sigs[j]).count("1") > 6

    def test_local_edit_flips_few_bits(self, spark):
        base = _img(11)
        edited = base.copy()
        edited[0:3, 0:3, 0] = 250  # one corner patch
        df = _media_df(spark, [(1, encode_png(base)), (2, encode_png(edited))])
        got = {r["doc_id"]: r["dhash"] for r in dhash_images(df).collect()}
        ham = bin(got[1] ^ got[2]).count("1")
        assert 0 < ham <= 6

    def test_rgb_and_gray_supported(self, spark):
        rgb = np.repeat(_img(3), 3, axis=2)
        df = _media_df(spark, [(1, encode_png(_img(3))), (2, encode_png(rgb))])
        got = {r["doc_id"]: r["dhash"] for r in dhash_images(df).collect()}
        # gray replicated to RGB has identical luma -> identical hash
        assert got[1] == got[2]

    def test_errors_skip_drops_garbage(self, spark):
        df = _media_df(spark, [(1, encode_png(_img(1))), (2, b"not a png")])
        with pytest.raises(Exception):
            dhash_images(df).collect()
        out = dhash_images(df, errors="skip").collect()
        assert [r["doc_id"] for r in out] == [1]

    def test_ahash_differs_from_dhash_but_same_shape(self, spark):
        df = _media_df(spark, [(1, encode_png(_img(5)))])
        a = ahash_images(df).collect()[0]
        assert a["ahash"] is not None


class TestImageDupPairs:
    def test_pairs_found_and_sound(self, spark):
        items = []
        for g in range(6):
            base = _img(100 + g)
            jitter = np.clip(base.astype(np.int64) + 3, 0, 255).astype(np.uint8)
            jitter[0:2, 0:2, 0] = 250
            items.append((2 * g, encode_png(base)))
            items.append((2 * g + 1, encode_png(jitter)))
        df = _media_df(spark, items)
        got = {(r["id_a"], r["id_b"]) for r in image_dup_pairs(df).collect()}
        assert got == {(2 * g, 2 * g + 1) for g in range(6)}

    def test_band_guards(self, spark):
        df = _media_df(spark, [(1, encode_png(_img(1)))])
        with pytest.raises(ValueError, match="pigeonhole"):
            image_dup_pairs(df, max_hamming=8, bands=8).collect()


class TestAudioFingerprint:
    def _wav(self, freqs, n=1024 * 8, rate=16_000, amp=8000):
        t = np.arange(n) / rate
        x = sum(np.sin(2 * np.pi * f * t) for f in freqs)
        return encode_wav((amp / len(freqs) * x).astype(np.int16), rate)

    def test_gain_invariant(self, spark):
        a = self._wav([440, 880], amp=8000)
        b = self._wav([440, 880], amp=2000)  # 12 dB quieter
        df = _media_df(spark, [(1, a), (2, b)])
        got = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
        assert got[1] == got[2] != 0

    def test_different_content_differs(self, spark):
        df = _media_df(
            spark, [(1, self._wav([440])), (2, self._wav([3123, 5077]))]
        )
        got = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
        assert got[1] != got[2]

    def test_short_clip_hashes_to_zero(self, spark):
        df = _media_df(spark, [(1, encode_wav(np.zeros(10, np.int16)))])
        assert audio_fingerprint(df).collect()[0]["afp"] == 0

    def test_dup_pairs_end_to_end(self, spark):
        a = self._wav([440, 880], amp=8000)
        b = self._wav([440, 880], amp=3000)
        c = self._wav([1237, 2971], amp=8000)
        df = _media_df(spark, [(1, a), (2, b), (3, c)])
        got = {(r["id_a"], r["id_b"]) for r in audio_dup_pairs(df).collect()}
        assert got == {(1, 2)}

    def test_width_guard(self, spark):
        df = _media_df(spark, [(1, self._wav([440]))])
        with pytest.raises(ValueError, match="<= 64"):
            audio_fingerprint(df, n_frames=32, bands=4).collect()


def test_audio_fingerprint_mp4_equals_wav(spark):
    """The same PCM signal fingerprints identically from a WAV and an
    MP4 container — the round-8 sniff makes the dedup operator
    container-agnostic, so cross-container duplicates still collide."""
    import numpy as np

    from database_transportor_spark.operators.media_dedup import (
        audio_fingerprint,
    )
    from database_transportor_spark.operators.multimodal import (
        encode_mp4_audio, encode_wav,
    )

    t = np.arange(4096)
    sig = (3000 * np.sin(2 * np.pi * 440 * t / 8000)
           + 1500 * np.sin(2 * np.pi * 1760 * t / 8000)).astype(np.int16)
    rows = [(1, bytearray(encode_wav(sig, 8000))),
            (2, bytearray(encode_mp4_audio(sig, 8000))),
            (3, bytearray(encode_mp4_audio(sig, 8000, codec=b"twos")))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert got[1] == got[2] == got[3] and got[1] != 0


def test_dhash_jpeg_tier_builtin_decoder(spark):
    """JPEG binaries fingerprint through the built-in baseline decoder
    (round-8 wiring of the round-7 codec) — a JPEG copy of a PNG image
    lands within a small hamming distance of its twin, so
    cross-format near-dup pairs are discoverable."""
    import numpy as np

    from database_transportor_spark.operators.jpeg import encode_jpeg
    from database_transportor_spark.operators.media_dedup import (
        dhash_images,
    )
    from database_transportor_spark.operators.multimodal import encode_png

    # strong horizontal gradient: dhash bits are column deltas, robust
    # to JPEG quantization
    arr = np.tile(np.linspace(10, 245, 64).astype(np.uint8), (64, 1))
    arr3 = np.stack([arr] * 3, axis=2)
    rows = [(1, bytearray(encode_png(arr3))),
            (2, bytearray(encode_jpeg(arr3, quality=90)))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r["dhash"] for r in dhash_images(df).collect()}
    assert len(got) == 2 and got[1] != 0
    d = bin((got[1] ^ got[2]) & ((1 << 64) - 1)).count("1")
    assert d <= 4, d


def test_audio_dedup_cross_container_with_decoder(spark):
    """decoder= (round 9, VERDICT #3): an mp4a ("compressed") copy
    fingerprints through a user decoder and collides cross-container
    with its WAV source — the engine keeps sniffing, batching, and the
    NULL-degrade contract; only the bytes->samples step is supplied."""
    import numpy as np

    from database_transportor_spark.operators.media_dedup import (
        audio_dup_pairs, audio_fingerprint,
    )
    from database_transportor_spark.operators.multimodal import (
        encode_mp4_audio, encode_wav,
    )

    # tones in DISJOINT fingerprint bands (FFT bins 5/15/30 vs
    # 60/150/300 of the 1024-sample frame): hamming(sig, other) = 48,
    # far past max_hamming, while the cross-container copy is 0
    t = np.arange(8192)

    def tone(bin_):
        return np.sin(2 * np.pi * t * bin_ / 1024) * 1500

    sig = (tone(5) + tone(15) + tone(30)).astype(np.int16)
    other = (tone(60) + tone(150) + tone(300)).astype(np.int16)
    mp4a = encode_mp4_audio(sig, 8000).replace(b"sowt", b"mp4a")

    def stub_decoder(b: bytes):
        from database_transportor_spark.operators.multimodal import (
            decode_mp4_audio,
        )
        if b[4:8] == b"ftyp" and b"mp4a" in b:
            return decode_mp4_audio(b.replace(b"mp4a", b"sowt"))
        return None

    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(sig, 8000))),
         (2, bytearray(mp4a)),
         (3, bytearray(encode_wav(other, 8000)))],
        "doc_id long, content binary",
    )
    # identical samples => identical fingerprints across containers
    fp = {r["doc_id"]: r["afp"] for r in
          audio_fingerprint(df, decoder=stub_decoder).collect()}
    assert fp[1] == fp[2] != fp[3]
    pairs = {(r["id_a"], r["id_b"]) for r in
             audio_dup_pairs(df, decoder=stub_decoder).collect()}
    assert pairs == {(1, 2)}
    # without the decoder the mp4a row is skipped, not fabricated
    fp2 = {r["doc_id"] for r in
           audio_fingerprint(df, errors="skip").collect()}
    assert fp2 == {1, 3}


def test_image_dedup_cross_format_with_decoder(spark):
    """Image twin of the audio decoder hook: a fake-WebP payload (magic
    the built-ins refuse) decodes through a user callable and its dHash
    collides with the PNG encoding of the same pixels."""
    import numpy as np

    from database_transportor_spark.operators.media_dedup import (
        dhash_images, image_dup_pairs,
    )
    from database_transportor_spark.operators.multimodal import encode_png

    a = ((np.arange(24 * 24 * 3, dtype=np.int64) * 31) % 251).astype(
        np.uint8).reshape(24, 24, 3)
    other = a[::-1].copy()          # different gradient signs
    webp = b"RIFF\x00\x00\x00\x00WEBPVP8 " + a.tobytes()

    def stub_decoder(b: bytes):
        if b[8:12] == b"WEBP":
            return np.frombuffer(b[16:], np.uint8).reshape(24, 24, 3)
        return None

    df = spark.createDataFrame(
        [(1, bytearray(encode_png(a))), (2, bytearray(webp)),
         (3, bytearray(encode_png(other)))],
        "doc_id long, content binary",
    )
    sigs = {r["doc_id"]: r["dhash"] for r in
            dhash_images(df, decoder=stub_decoder).collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    pairs = {(r["id_a"], r["id_b"]) for r in
             image_dup_pairs(df, decoder=stub_decoder).collect()}
    assert pairs == {(1, 2)}
    # without the hook the WebP row is skipped, not fabricated
    assert {r["doc_id"] for r in
            dhash_images(df, errors="skip").collect()} == {1, 3}


def test_decode_image_decoder_hook(spark):
    import numpy as np

    from database_transportor_spark.operators.multimodal import decode_image

    a = np.full((5, 7, 3), 9, np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(b"XWEBP" + a.tobytes()))],
        "doc_id long, content binary",
    )
    got = decode_image(df, errors="null").collect()[0]
    assert got["width"] is None     # built-ins refuse the magic
    got = decode_image(
        df, decoder=lambda b: np.frombuffer(b[5:], np.uint8)
        .reshape(5, 7, 3) if b[:5] == b"XWEBP" else None,
    ).collect()[0]
    assert (got["height"], got["width"], got["channels"]) == (5, 7, 3)


class TestVideoDedup:
    def _frames(self, seeds, shift=0):
        return [
            np.clip(_img(s).astype(np.int64) + shift, 0, 255).astype(np.uint8)
            for s in seeds
        ]

    def _apng(self, seeds, shift=0):
        from database_transportor_spark.operators.multimodal import (
            encode_apng,
        )

        return encode_apng(self._frames(seeds, shift))

    def _avi_mpng(self, seeds, shift=0):
        from database_transportor_spark.operators.multimodal import (
            encode_avi, encode_png,
        )

        return encode_avi(
            [encode_png(f) for f in self._frames(seeds, shift)],
            24, 24, codec=b"MPNG",
        )

    def test_frame_hashes_brightness_invariant(self, spark):
        from database_transportor_spark.operators.media_dedup import (
            video_frame_hashes,
        )

        df = _media_df(spark, [
            (1, self._apng([1, 2, 3])),
            (2, self._apng([1, 2, 3], shift=5)),
        ])
        got = video_frame_hashes(df).collect()
        a = {r["frame_idx"]: r["fhash"] for r in got if r["doc_id"] == 1}
        b = {r["frame_idx"]: r["fhash"] for r in got if r["doc_id"] == 2}
        assert len(a) == 3 and a == b  # dHash: gradient signs survive +5

    def test_dup_pairs_copy_found_unrelated_not(self, spark):
        from database_transportor_spark.operators.media_dedup import (
            video_dup_pairs,
        )

        df = _media_df(spark, [
            (1, self._apng([1, 2, 3, 4])),
            (2, self._apng([1, 2, 3, 4], shift=5)),   # re-graded copy
            (3, self._apng([50, 51, 52, 53])),        # unrelated
        ])
        rows = video_dup_pairs(df).collect()
        assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
        assert rows[0]["matched_frames"] == 4
        assert rows[0]["min_hamming"] == 0

    def test_cross_container_copy_dedups(self, spark):
        from database_transportor_spark.operators.media_dedup import (
            video_dup_pairs,
        )

        df = _media_df(spark, [
            (1, self._apng([7, 8, 9])),
            (2, self._avi_mpng([7, 8, 9])),  # same content, AVI container
        ])
        rows = video_dup_pairs(df).collect()
        assert [(r["id_a"], r["id_b"], r["matched_frames"]) for r in rows] \
            == [(1, 2, 3)]

    def test_min_matches_gates_single_shared_frame(self, spark):
        from database_transportor_spark.operators.media_dedup import (
            video_dup_pairs,
        )

        df = _media_df(spark, [
            (1, self._apng([1, 2, 3, 4])),
            (2, self._apng([1, 60, 61, 62])),  # shares ONLY frame seed 1
        ])
        assert video_dup_pairs(df, min_matches=2).collect() == []
        got = video_dup_pairs(df, min_matches=1).collect()
        assert [(r["id_a"], r["id_b"], r["matched_frames"]) for r in got] \
            == [(1, 2, 1)]

    def test_static_frames_do_not_inflate_matches(self, spark):
        from database_transportor_spark.operators.media_dedup import (
            video_dup_pairs,
        )

        # B repeats ONE of A's frames 4x: least(#a, #b) counts the
        # evidence once per distinct B frame but only ONE distinct A
        # frame matched -> matched_frames == 1, gated by the default
        df = _media_df(spark, [
            (1, self._apng([1, 2, 3, 4])),
            (2, self._apng([1, 1, 1, 1])),
        ])
        assert video_dup_pairs(df).collect() == []
        got = video_dup_pairs(df, min_matches=1).collect()
        assert got and got[0]["matched_frames"] == 1

    def test_garbage_and_caps(self, spark):
        import pytest

        from database_transportor_spark.operators.media_dedup import (
            video_frame_hashes,
        )

        df = _media_df(spark, [
            (1, self._apng([1, 2, 3, 4, 5, 6])),
            (2, b"\x00not a video"),
        ])
        with pytest.raises(Exception):
            video_frame_hashes(df).collect()
        got = video_frame_hashes(df, errors="skip", stride=2,
                                 max_frames=2).collect()
        assert sorted(r["frame_idx"] for r in got) == [0, 2]
        assert {r["doc_id"] for r in got} == {1}

    def test_decoder_hook_dedups_opaque_codec(self, spark):
        """A user decoder (stand-in for PyAV/ffmpeg H.264) slots into the
        hash pass: an opaque-codec copy of an APNG video dedups against
        the original through the hook."""
        from database_transportor_spark.operators.media_dedup import (
            video_dup_pairs,
        )

        frames = self._frames([7, 8, 9])
        opaque = b"X264" + b"".join(f.tobytes() for f in frames)

        def decoder(b):
            if b[:4] != b"X264":
                return None  # not ours: built-in tiers take over
            body = b[4:]
            n = len(body) // (24 * 24)
            return [
                np.frombuffer(body[i * 576:(i + 1) * 576],
                              dtype=np.uint8).reshape(24, 24, 1)
                for i in range(n)
            ]

        df = _media_df(spark, [(1, self._apng([7, 8, 9])), (2, opaque)])
        rows = video_dup_pairs(df, decoder=decoder).collect()
        assert [(r["id_a"], r["id_b"], r["matched_frames"]) for r in rows] \
            == [(1, 2, 3)]
