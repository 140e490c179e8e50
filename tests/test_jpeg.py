"""Baseline JPEG codec: round trips, sampling modes, failure modes."""

import numpy as np
import pytest

from database_transportor_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w, c=3):
    return np.linspace(0, 255, h * w * c).reshape(h, w, c).astype(np.uint8)


class TestRoundTrip:
    def test_constant_color_is_exact(self):
        # constant blocks carry only a DC coefficient: quantize/dequantize
        # reconstructs them EXACTLY — the property the SQL-exact
        # mjpeg_frames oracle builds on
        for v in (0, 77, 130, 255):
            for shape in ((16, 24, 3), (8, 8, 1), (5, 13, 3)):
                a = np.full(shape, v, dtype=np.uint8)
                d = decode_jpeg(encode_jpeg(a, quality=90))
                assert np.array_equal(a, d), (v, shape)

    def test_gradient_within_one_lsb_at_q95(self):
        a = _gradient(33, 47)
        for sub in ("4:4:4", "4:2:0"):
            d = decode_jpeg(encode_jpeg(a, quality=95, subsampling=sub))
            assert d.shape == a.shape
            assert np.abs(a.astype(int) - d.astype(int)).max() <= 2, sub

    def test_grayscale(self):
        a = _gradient(24, 17, 1)
        d = decode_jpeg(encode_jpeg(a, quality=95))
        assert d.shape == (24, 17, 1)
        assert np.abs(a.astype(int) - d.astype(int)).max() <= 2

    def test_noise_behaves_like_jpeg(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(a, quality=75))
        assert d.shape == a.shape
        # lossy but sane: mean error well under random (~85)
        assert np.abs(a.astype(int) - d.astype(int)).mean() < 40

    def test_restart_markers_are_transparent(self):
        a = _gradient(40, 56)
        for sub in ("4:4:4", "4:2:0"):
            ref = decode_jpeg(encode_jpeg(a, quality=90, subsampling=sub))
            for ri in (1, 2, 5):
                d = decode_jpeg(encode_jpeg(a, quality=90, subsampling=sub,
                                            restart_interval=ri))
                assert np.array_equal(d, ref), (sub, ri)

    def test_determinism(self):
        a = _gradient(19, 21)
        assert encode_jpeg(a) == encode_jpeg(a)
        assert np.array_equal(decode_jpeg(encode_jpeg(a)),
                              decode_jpeg(encode_jpeg(a)))

    def test_dims_agree_with_header_parser(self):
        from database_transportor_spark.operators.multimodal import (
            jpeg_dimensions,
        )

        a = _gradient(9, 31)
        b = encode_jpeg(a, quality=80, subsampling="4:2:0")
        assert jpeg_dimensions(b) == (31, 9, 3)
        assert decode_jpeg(b).shape == (9, 31, 3)


class TestGuards:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x00\x01\x02\x03")

    def test_progressive_named_unsupported(self):
        # hand-build a SOF2 (progressive) header: the decoder must name
        # the unsupported mode instead of mis-decoding
        import struct

        sof2 = (b"\xff\xd8"
                + b"\xff\xc2" + struct.pack(">H", 11)
                + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(sof2)

    def test_truncated_scan(self):
        b = encode_jpeg(_gradient(16, 16), quality=90)
        with pytest.raises(ValueError, match="truncated|corrupt|invalid"):
            decode_jpeg(b[: len(b) // 2])

    def test_encoder_guards(self):
        with pytest.raises(ValueError, match="quality"):
            encode_jpeg(np.zeros((8, 8), np.uint8), quality=0)
        with pytest.raises(ValueError, match="subsampling"):
            encode_jpeg(np.zeros((8, 8), np.uint8), subsampling="4:1:1")
        with pytest.raises(ValueError, match="array"):
            encode_jpeg(np.zeros((8, 8, 4), np.uint8))


class TestSparkIntegration:
    def test_video_frames_mjpeg_pixel_sum_no_pillow(self, spark):
        # the round-6 verdict's last fake-decode tier: MJPEG frames in a
        # real AVI container must yield non-NULL exact pixel sums in the
        # no-image-library environment
        import pandas as pd
        from pyspark.sql.types import (BinaryType, LongType, StructField,
                                       StructType)

        from database_transportor_spark.operators.multimodal import (
            decode_video_frames, encode_avi,
        )

        frames = [np.full((6, 8, 3), 40 + 10 * f, dtype=np.uint8)
                  for f in range(3)]
        avi = encode_avi([encode_jpeg(f, quality=90) for f in frames],
                         width=8, height=6, fps_num=10, codec=b"MJPG")
        schema = StructType([StructField("doc_id", LongType()),
                             StructField("content", BinaryType())])
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "content": [avi]}), schema)
        rows = {r["frame_idx"]: r
                for r in decode_video_frames(df, "doc_id", "content")
                .collect()}
        assert len(rows) == 3
        for f in range(3):
            r = rows[f]
            assert (r["width"], r["height"], r["channels"]) == (8, 6, 3)
            # constant frames decode exactly: sum = w*h*ch*value
            assert r["pixel_sum"] == 8 * 6 * 3 * (40 + 10 * f)

    def test_decode_image_jpeg_fallback(self, spark):
        import pandas as pd
        from pyspark.sql.types import (BinaryType, LongType, StructField,
                                       StructType)

        from database_transportor_spark.operators.multimodal import (
            decode_image,
        )

        b = encode_jpeg(_gradient(12, 20), quality=90)
        schema = StructType([StructField("doc_id", LongType()),
                             StructField("content", BinaryType())])
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [7], "content": [b]}), schema)
        row = decode_image(df, "doc_id", "content").collect()[0]
        assert (row["width"], row["height"], row["channels"]) == (20, 12, 3)


class TestRobustness:
    # review r7: every malformed input must surface as ValueError so the
    # video/image degrade paths need exactly one exception type

    def test_malformed_inputs_raise_valueerror_only(self):
        good = encode_jpeg(_gradient(16, 16), quality=90)
        cases = {
            "truncated after lone FF": good[: good.index(b"\xff\xdb") + 1],
            "missing DQT": good[:2] + good[good.index(b"\xff\xc0"):],
            "half scan": good[: len(good) * 2 // 3],
            "random garbage": b"\xff\xd8" + bytes(range(256)),
        }
        for label, payload in cases.items():
            with pytest.raises(ValueError):
                decode_jpeg(payload)

    def test_unknown_scan_component_is_valueerror(self):
        good = bytearray(encode_jpeg(_gradient(8, 8, 1), quality=90))
        sos = good.index(b"\xff\xda")
        good[sos + 5] = 9  # scan references component id 9 (frame has 1)
        with pytest.raises(ValueError):
            decode_jpeg(bytes(good))

    def test_fill_bytes_before_markers(self):
        # T.81 B.1.1.2: 0xFF padding before a marker is legal
        good = encode_jpeg(_gradient(16, 16), quality=90)
        ref = decode_jpeg(good)
        i = good.index(b"\xff\xdb")
        padded = good[:i] + b"\xff\xff\xff" + good[i:]
        assert np.array_equal(decode_jpeg(padded), ref)

    def test_single_component_scan_is_non_interleaved(self):
        # T.81 A.2: a one-component scan ignores sampling factors; a
        # grayscale SOF declaring h=v=2 must decode like the 1x1 stream
        good = bytearray(encode_jpeg(_gradient(24, 40, 1), quality=95))
        ref = decode_jpeg(bytes(good))
        sof = bytes(good).index(b"\xff\xc0")
        # FF C0 (2) len (2) prec (1) h (2) w (2) nc (1) id (1) -> hv
        assert good[sof + 11] == 0x11
        good[sof + 11] = 0x22  # declare h=v=2 on the only component
        out = decode_jpeg(bytes(good))
        assert np.array_equal(out, ref)

    def test_zero_sampling_factor_is_valueerror(self):
        # review r8: h or v = 0 in SOF used to escape as raw
        # ZeroDivisionError from the upsample step
        good = bytearray(encode_jpeg(_gradient(8, 8, 1), quality=90))
        sof = bytes(good).index(b"\xff\xc0")
        for hv in (0x01, 0x10, 0x00, 0x51, 0x15):  # zero or >4 factors
            bad = bytearray(good)
            bad[sof + 11] = hv
            with pytest.raises(ValueError, match="sampling factors"):
                decode_jpeg(bytes(bad))

    def test_multi_scan_baseline_is_valueerror(self):
        # review r8: a per-component (non-interleaved) scan sequence is
        # legal baseline; decoding only the first scan would silently
        # return grayscale for a color frame — must refuse loudly
        import struct

        good = encode_jpeg(_gradient(16, 16, 3), quality=90)
        sos = good.index(b"\xff\xda")
        # original SOS: len=12, ns=3; replace with a Y-only first scan
        assert good[sos + 4] == 3
        y_only = (b"\xff\xda" + struct.pack(">H", 8)
                  + bytes([1, 1, 0x00, 0, 0x3F, 0]))
        patched = good[:sos] + y_only + good[sos + 14:]
        with pytest.raises(ValueError, match="multi-scan"):
            decode_jpeg(patched)
