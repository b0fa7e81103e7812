"""Real media codec tests: round-trip properties for the stdlib+numpy
codecs (PNG/BMP/PNM/WAV/raw video) and the decoder='real' operator paths.

These validate that the multimodal operators run ACTUAL decode/resize on
real payloads with no external imaging libraries — the 'real' path is no
longer a stub for these formats.
"""

from __future__ import annotations

import numpy as np
import pytest

from avro_spark.operators import media_codecs as mc
from avro_spark.operators.multimodal import (
    decode_features,
    pack_media,
    resize_media,
    sample_frames,
)

rng = np.random.default_rng(42)


def _img(h, w, ch=3):
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


# --------------------------------------------------------------- codecs
class TestCodecs:
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_png_roundtrip(self, ch):
        px = _img(13, 7, ch) if ch > 1 else _img(13, 7, 1).reshape(13, 7, 1)
        out = mc.decode_png(mc.encode_png(px))
        assert out.shape == (13, 7, ch)
        assert np.array_equal(out, px)

    def test_png_all_filters_decode(self):
        # encode with each filter type manually, decode must reconstruct
        import struct, zlib
        px = _img(6, 5, 3)
        h, w, chn = px.shape
        bpp = chn
        for ftype in range(5):
            rows = []
            prev = np.zeros(w * chn, dtype=np.int32)
            for y in range(h):
                cur = px[y].reshape(-1).astype(np.int32)
                filt = np.empty_like(cur)
                for i in range(len(cur)):
                    a = cur[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    if ftype == 0:
                        pred = 0
                    elif ftype == 1:
                        pred = a
                    elif ftype == 2:
                        pred = b
                    elif ftype == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    filt[i] = (cur[i] - pred) & 0xFF
                rows.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
                prev = cur
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            idat = zlib.compress(b"".join(rows))

            def chunk(tag, body):
                return (struct.pack(">I", len(body)) + tag + body
                        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

            data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
            assert np.array_equal(mc.decode_png(data), px), f"filter {ftype}"

    def test_bmp_roundtrip(self):
        px = _img(9, 11)  # odd width exercises row padding
        out = mc.decode_bmp(mc.encode_bmp(px))
        assert np.array_equal(out, px)

    def test_pnm_roundtrip(self):
        rgb = _img(5, 6)
        assert np.array_equal(mc.decode_pnm(mc.encode_pnm(rgb)), rgb)
        gray = _img(5, 6, 1).reshape(5, 6)
        assert np.array_equal(mc.decode_pnm(mc.encode_pnm(gray)), gray)

    def test_wav_roundtrip(self):
        samples = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int16)
        out, rate = mc.decode_wav(mc.encode_wav(samples, 16000))
        assert rate == 16000
        assert np.array_equal(out, samples)

    def test_raw_video(self):
        frames = rng.integers(0, 256, size=(4, 3, 5, 3), dtype=np.uint8)
        out = mc.decode_raw_video(frames.tobytes(), 5, 3)
        assert np.array_equal(out, frames)

    def test_resize_nearest(self):
        px = _img(10, 10)
        small = mc.resize_nearest(px, 5, 5)
        assert small.shape == (5, 5, 3)
        assert np.array_equal(small, px[::2, ::2])
        up = mc.resize_nearest(small, 10, 10)
        assert up.shape == (10, 10, 3)

    def test_unsupported_raises(self):
        # JPEG is supported now (jpeg_codec.py); compressed video isn't
        with pytest.raises(NotImplementedError):
            mc.decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")

    def test_truncated_jpeg_raises_value_error(self):
        with pytest.raises(ValueError, match="truncated"):
            mc.decode_media(b"\xff\xd8\xff", "image/jpeg")


# ----------------------------------------------------- operator real path
class TestRealOperatorPath:
    def _media_df(self, spark):
        rows = []
        for i in range(6):
            px = _img(12, 10)
            mime = ["image/png", "image/bmp", "image/x-portable-pixmap"][i % 3]
            rows.append((i, bytearray(mc.encode_media(px, mime)), mime, 10, 12))
        df = spark.createDataFrame(
            rows, "id long, data binary, mime string, w int, h int"
        )
        # per-row mime: pack manually (pack_media uses a constant mime)
        from pyspark.sql import functions as F

        return df.select(
            "id",
            F.struct(
                F.col("data").alias("data"),
                F.col("mime").alias("mime"),
                F.col("w").alias("width"),
                F.col("h").alias("height"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("int").alias("n_frames"),
            ).alias("media"),
        )

    def test_decode_features_real(self, spark):
        df = self._media_df(spark)
        feats = decode_features(df, "media", ("id",), decoder="real").collect()
        assert len(feats) == 6
        for r in feats:
            assert r.n_bytes > 0
            assert 0.0 <= r.mean <= 255.0 and r.std > 0
            assert len(r.phash) == 16 and len(r.sha256) == 64

    def test_resize_real_roundtrips_format(self, spark):
        df = self._media_df(spark)
        out = resize_media(df, 5, 4, "media", decoder="real").collect()
        for r in out:
            m = r.media
            assert (m.width, m.height) == (5, 4)
            px = mc.decode_media(bytes(m.data), m.mime)
            assert px.shape[:2] == (4, 5)

    def test_wav_features_real(self, spark):
        samples = rng.integers(-1000, 1000, size=(500, 1), dtype=np.int16)
        wav = mc.encode_wav(samples, 8000)
        df = spark.createDataFrame([(1, bytearray(wav))], "id long, data binary")
        packed = pack_media(df, "data", "audio/wav", sample_rate=None)
        feats = decode_features(packed, "media", ("id",), decoder="real").collect()
        assert len(feats) == 1 and feats[0].n_bytes == len(wav)

    def test_raw_video_frame_sample(self, spark):
        frames = rng.integers(0, 256, size=(8, 4, 4, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(frames.tobytes()), 8)], "id long, data binary, nf int"
        )
        packed = pack_media(df, "data", "video/x-raw", n_frames="nf")
        out = sample_frames(packed, every_n=2, media_col="media", id_cols=("id",)).collect()
        assert [r.frame_no for r in out] == [0, 2, 4, 6]
        # each sampled frame slice is the true raw frame
        fsz = 4 * 4 * 3
        for r in out:
            assert bytes(r.frame) == frames.tobytes()[r.frame_no * fsz:(r.frame_no + 1) * fsz]


# ---------------------------------------------------------------- JPEG
class TestJpeg:
    @staticmethod
    def _psnr(a, b):
        import numpy as np

        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)

    @staticmethod
    def _gradient(h, w):
        import numpy as np

        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (h + w))],
            axis=-1,
        ).astype(np.uint8)

    def test_rgb_roundtrip_psnr(self):
        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        img = self._gradient(40, 56)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec.shape == img.shape and dec.dtype == img.dtype
        assert self._psnr(img, dec) > 40

    def test_gray_roundtrip_psnr(self):
        import numpy as np

        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        gray = self._gradient(33, 41)[:, :, 0]
        dec = decode_jpeg(encode_jpeg(gray, quality=85))
        assert dec.shape == gray.shape
        assert self._psnr(gray, dec) > 40

    def test_noise_roundtrip_q95(self):
        import numpy as np

        rng = np.random.default_rng(11)
        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        noise = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(noise, quality=95))
        assert self._psnr(noise, dec) > 30

    def test_restart_interval_roundtrip(self):
        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        img = self._gradient(24, 64)
        plain = decode_jpeg(encode_jpeg(img, quality=90))
        rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
        assert self._psnr(img, rst) > 40
        assert abs(self._psnr(img, plain) - self._psnr(img, rst)) < 1.0

    def test_non_multiple_of_8_dims(self):
        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        img = self._gradient(9, 13)
        dec = decode_jpeg(encode_jpeg(img, quality=92))
        assert dec.shape == (9, 13, 3)

    def test_quality_tradeoff(self):
        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        img = self._gradient(40, 40)
        lo = encode_jpeg(img, quality=20)
        hi = encode_jpeg(img, quality=95)
        assert len(lo) < len(hi)
        assert self._psnr(img, decode_jpeg(hi)) > self._psnr(img, decode_jpeg(lo))

    def test_not_a_jpeg_raises(self):
        import pytest

        from avro_spark.operators.jpeg_codec import decode_jpeg

        with pytest.raises(ValueError, match="missing SOI"):
            decode_jpeg(b"\x00\x01\x02")

    def test_progressive_raises(self):
        import struct

        import pytest

        from avro_spark.operators.jpeg_codec import decode_jpeg

        # minimal stream with SOF2 (progressive) marker
        sof2 = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
        with pytest.raises(NotImplementedError, match="non-baseline"):
            decode_jpeg(sof2)

    def test_420_subsampled_roundtrip(self):
        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        img = self._gradient(41, 57)
        enc444 = encode_jpeg(img, quality=90)
        enc420 = encode_jpeg(img, quality=90, subsample=True)
        assert len(enc420) < len(enc444)  # chroma at quarter resolution
        dec = decode_jpeg(enc420)
        assert dec.shape == img.shape
        assert self._psnr(img, dec) > 35

    def test_420_with_restart_interval(self):
        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        img = self._gradient(41, 57)
        dec = decode_jpeg(
            encode_jpeg(img, quality=90, subsample=True, restart_interval=3)
        )
        assert self._psnr(img, dec) > 35

    def test_media_dispatch(self):
        from avro_spark.operators.media_codecs import decode_media, encode_media

        img = self._gradient(16, 16)
        blob = encode_media(img, "image/jpeg")
        dec = decode_media(blob, "image/jpeg")
        assert dec.shape == (16, 16, 3)

    def test_420_dims_with_empty_edge_blocks(self):
        # h or w mod 16 in 1..8 puts a doubled-luma-grid block entirely
        # outside the plane — clamped gather must handle it (regression:
        # empty-slice np.pad raised ValueError)
        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        for h, w in [(24, 64), (8, 8), (17, 40), (40, 17)]:
            img = self._gradient(h, w)
            dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
            assert dec.shape == (h, w, 3)
            # tiny images at quarter-res chroma are inherently lossier
            assert self._psnr(img, dec) > 25

    def test_decode_time_scales_linearly(self):
        # regression: the bit reader once kept consumed bits in its
        # accumulator, making decode O(n^2) (19.7s for a 256px image)
        import time

        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        img = self._gradient(256, 256)
        blob = encode_jpeg(img, quality=90)
        t0 = time.perf_counter()
        decode_jpeg(blob)
        assert time.perf_counter() - t0 < 5.0


# --------------------------------------------------- MP4 / WebM probes (r3)
class TestContainerProbes:
    def test_mp4_roundtrip(self):
        from avro_spark.operators.media_probe import build_mp4, probe_mp4

        b = build_mp4(640, 360, 12345, "avc1", audio=("mp4a", 44100, 2), brand="mp42")
        m = probe_mp4(b)
        assert (m["brand"], m["duration_ms"], m["width"], m["height"]) == (
            "mp42", 12345.0, 640, 360)
        assert (m["video_codec"], m["audio_codec"], m["sample_rate"],
                m["channels"], m["n_tracks"]) == ("avc1", "mp4a", 44100, 2, 2)

    def test_mp4_video_only(self):
        from avro_spark.operators.media_probe import build_mp4, probe_mp4

        m = probe_mp4(build_mp4(320, 240, 500, "hvc1"))
        assert m["video_codec"] == "hvc1" and m["audio_codec"] is None
        assert m["n_tracks"] == 1 and m["sample_rate"] is None

    def test_mp4_largesize_box(self):
        """size==1 + 64-bit largesize header parses identically."""
        import struct

        from avro_spark.operators.media_probe import build_mp4, probe_mp4

        b = build_mp4(100, 50, 1000)
        # rewrite the moov box header to the largesize form
        i = b.index(b"moov") - 4
        size = struct.unpack(">I", b[i:i + 4])[0]
        big = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", size + 8)
        b2 = b[:i] + big + b[i + 8:]
        assert probe_mp4(b2)["width"] == 100

    def test_mp4_malformed(self):
        import pytest as _pytest

        from avro_spark.operators.media_probe import probe_mp4

        with _pytest.raises(ValueError, match="no moov"):
            probe_mp4(b"")
        with _pytest.raises(ValueError, match="overruns"):
            probe_mp4(b"\x00\x00\x00\x40moov")

    def test_webm_roundtrip(self):
        from avro_spark.operators.media_probe import build_webm, probe_webm

        w = build_webm(1920, 1080, 9876.5, "V_VP9", audio=("A_OPUS", 48000, 2))
        m = probe_webm(w)
        assert (m["container"], m["duration_ms"], m["width"], m["height"]) == (
            "webm", 9876.5, 1920, 1080)
        assert (m["video_codec"], m["audio_codec"], m["sample_rate"],
                m["channels"], m["n_tracks"]) == ("V_VP9", "A_OPUS", 48000, 2, 2)

    def test_webm_unknown_size_segment(self):
        """Streaming WebM writes the Segment with unknown size (all size
        bits set) — it must extend to EOF."""
        from avro_spark.operators.media_probe import (
            _SEGMENT, build_webm, probe_webm,
        )

        w = build_webm(64, 48, 100.0)
        seg_id = _SEGMENT.to_bytes(4, "big")
        i = w.index(seg_id)
        w2 = w[:i + 4] + b"\xff" + w[i + 8:]  # 1-byte unknown-size vint
        assert probe_webm(w2)["width"] == 64

    def test_webm_matroska_doctype(self):
        from avro_spark.operators.media_probe import build_webm, probe_media_bytes

        w = build_webm(10, 10, 1.0, "V_MPEG4/ISO/AVC", doctype="matroska")
        assert probe_media_bytes(w, "video/x-matroska")["container"] == "matroska"

    def test_sniffing_dispatch(self):
        from avro_spark.operators.media_probe import (
            build_mp4, build_webm, probe_media_bytes,
        )
        import pytest as _pytest

        assert probe_media_bytes(build_mp4(8, 8, 10))["container"] == "mp4"
        assert probe_media_bytes(build_webm(8, 8, 10))["container"] == "webm"
        with _pytest.raises(ValueError, match="unrecognized container"):
            probe_media_bytes(b"\x89PNG\r\n\x1a\n")

    def test_probe_media_operator_error_column(self, spark):
        """Malformed payloads land in the error column; good rows probe."""
        from avro_spark.operators.media_probe import build_mp4
        from avro_spark.operators.multimodal import pack_media, probe_media

        rows = [(1, build_mp4(32, 16, 2000)), (2, b"garbage-not-a-container")]
        df = spark.createDataFrame(rows, "id long, blob binary")
        media = pack_media(df, "blob", "video/mp4")
        out = {r.id: r for r in probe_media(media, "media", id_cols=("id",)).collect()}
        assert out[1].width == 32 and out[1].error is None
        assert out[2].width is None and out[2].error is not None
