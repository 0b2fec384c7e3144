"""Multimodal plumbing: binary columns, sniffing, decode/resize/frame
stubs with real Arrow batch shapes, embeddings feeding ANN."""

import pytest
from pyspark.sql import functions as F

from ffp_spark.multimodal import (
    MEDIA_SCHEMA,
    attach_mime,
    decode_images,
    embed_media,
    resize_images,
    sample_frames,
    sniff_mime,
    synth_media_rows,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(synth_media_rows(80), schema=MEDIA_SCHEMA).cache()


def test_sniff_mime_unit():
    assert sniff_mime(b"\x89PNG\r\n\x1a\nxxx") == "image/png"
    assert sniff_mime(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_mime(b"RIFF1234WAVEdata") == "audio/wav"
    assert sniff_mime(b"\x00\x00\x00\x18ftypmp42") == "video/mp4"
    assert sniff_mime(b"plain text") == "application/octet-stream"
    assert sniff_mime(None) is None


def test_attach_mime_matches_kind(spark, media):
    got = attach_mime(media.drop("mime")).select("kind", "mime").distinct().collect()
    pairs = {(r.kind, r.mime) for r in got}
    assert ("image", "image/png") in pairs or ("image", "image/jpeg") in pairs
    assert ("audio", "audio/wav") in pairs
    assert ("video", "video/mp4") in pairs
    assert not any(m is None for _, m in pairs)


def test_decode_resize_shapes(spark, media):
    imgs = media.filter("kind = 'image'")
    decoded = decode_images(imgs)
    rows = decoded.collect()
    assert len(rows) == imgs.count()
    for r in rows:
        assert len(r.pixels) == r.width * r.height * 3
    resized = resize_images(decoded, 8, 8).collect()
    assert all(len(r.pixels) == 8 * 8 * 3 for r in resized)
    # deterministic
    again = {r.media_id: bytes(r.pixels) for r in resize_images(decoded, 8, 8).collect()}
    assert {r.media_id: bytes(r.pixels) for r in resized} == again


def test_resize_contains_zero_dim_images(spark):
    """A crafted PNG can declare zero width in IHDR (decodes to real
    dims 0 x h with empty pixels); resize must degrade to a NULL-pixel
    row, never fail the task (corrupt-media containment)."""
    import numpy as np

    from ffp_spark import mediacodec as mc
    from ffp_spark.multimodal import DECODED_IMAGE_SCHEMA

    zero_png = mc.png_encode(np.zeros((4, 0, 3), dtype=np.uint8))
    media = spark.createDataFrame(
        [
            ("z0", "image", bytearray(zero_png), None, None),
            ("ok", "image", bytearray(mc.png_encode(np.full((4, 4, 3), 7, np.uint8))), None, None),
        ],
        schema=MEDIA_SCHEMA,
    )
    decoded = decode_images(media)
    # also exercise the guard directly on hand-built degenerate rows
    degenerate = spark.createDataFrame(
        [("d0", 0, 4, bytearray(b"")), ("d1", 4, 0, bytearray(b"")), ("d2", 4, 4, bytearray(b"\x00" * 5))],
        schema=DECODED_IMAGE_SCHEMA,
    )
    rows = {r.media_id: r for r in resize_images(decoded.union(degenerate), 8, 8).collect()}
    assert len(rows) == 5  # no task failure
    assert rows["ok"].pixels is not None and len(rows["ok"].pixels) == 8 * 8 * 3
    for mid in ("z0", "d0", "d1", "d2"):
        assert rows[mid].pixels is None, mid


def test_frame_sampling_row_counts(spark, media):
    frames = sample_frames(media, every_ms=500)
    counts = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durations = {
        r.media_id: r.duration_ms for r in media.filter("kind='video'").collect()
    }
    assert counts  # some videos exist
    for mid, n in counts.items():
        expected = (durations[mid] + 499) // 500
        assert n == expected, (mid, n, expected)


def test_mjpeg_avi_frames_decode_real_pixels(spark):
    """AVI/MJPEG is the one video container this environment can decode
    end-to-end: RIFF 'movi' chunks are complete baseline JPEGs.  Each
    sampled tick must carry the REAL pixels of the frame at-or-before
    it (solid-color frames roundtrip losslessly at quant=4)."""
    import numpy as np

    from ffp_spark import mediacodec as mc

    fps, n_frames, w, h = 2, 6, 24, 16  # 500ms per frame, 3000ms total
    colors = [(37 * k) % 256 for k in range(n_frames)]
    avi = mc.avi_encode_mjpeg(
        [np.full((h, w, 3), c, dtype=np.uint8) for c in colors], fps=fps
    )
    media = spark.createDataFrame(
        [("v0", "video", bytearray(avi), None, 3000)], schema=MEDIA_SCHEMA
    )
    rows = sorted(sample_frames(media, every_ms=1000).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.ts_ms for r in rows] == [0, 1000, 2000]
    for r in rows:
        assert (r.width, r.height) == (w, h)
        src_idx = int(r.ts_ms) // 500  # frame at-or-before the tick
        expected = bytes([colors[src_idx]] * (w * h * 3))
        assert bytes(r.frame) == expected, r.frame_idx


def test_video_degrade_paths(spark):
    """Non-MJPEG video (MP4 without ffmpeg) and corrupt RIFF payloads
    degrade to deterministic fake frames with NULL dims — row-level
    degradation, never a task failure or NotImplementedError."""
    import hashlib

    from ffp_spark import mediacodec as mc

    mp4 = mc.mp4_box(mvhd_timescale=1000, mvhd_duration=1200)
    corrupt = b"RIFF\x20\x00\x00\x00AVI " + b"\xde\xad\xbe\xef" * 8
    media = spark.createDataFrame(
        [
            ("m0", "video", bytearray(mp4), None, 1200),
            ("c0", "video", bytearray(corrupt), None, 900),
        ],
        schema=MEDIA_SCHEMA,
    )
    rows = {(r.media_id, r.frame_idx): r for r in sample_frames(media, every_ms=500).collect()}
    assert len(rows) == 3 + 2  # ceil(1200/500) + ceil(900/500)
    for (mid, idx), r in rows.items():
        assert r.width is None and r.height is None
        assert bytes(r.frame) == hashlib.sha256(f"{mid}:{idx}".encode()).digest()


def test_probe_avi_header(spark):
    import numpy as np

    from ffp_spark import mediacodec as mc
    from ffp_spark.multimodal import probe_media

    avi = mc.avi_encode_mjpeg(
        [np.zeros((12, 20, 3), dtype=np.uint8)] * 4, fps=4
    )
    media = spark.createDataFrame(
        [("a0", "video", bytearray(avi), None, None)], schema=MEDIA_SCHEMA
    )
    r = probe_media(media).collect()[0]
    assert r.mime == "video/x-msvideo"
    assert (r.width, r.height) == (20, 12)
    assert r.duration_ms == 1000


def test_embeddings_feed_ann(spark, media):
    emb = embed_media(media).filter("embedding is not null")
    row = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in row] == [64]
    # unit-norm within float tolerance
    norms = emb.select(
        F.aggregate(
            F.zip_with(F.col("embedding").cast("array<double>"),
                       F.col("embedding").cast("array<double>"),
                       lambda x, y: x * y),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("sq")
    ).collect()
    assert all(abs(r.sq - 1.0) < 1e-3 for r in norms)


class TestGifCodec:
    """Pure-codec tests (no Spark): real LZW encode/decode byte-parity."""

    def test_gif_roundtrip_small_palette(self):
        import numpy as np
        from ffp_spark import mediacodec as mc

        rng = np.random.RandomState(11)
        # 4-value channel space keeps distinct colors <= 64
        img = (rng.randint(0, 4, (17, 23, 3)) * 85).astype(np.uint8)
        payload = mc.gif_encode(img)
        assert payload.startswith(b"GIF87a")
        assert mc.gif_dims(payload) == (23, 17)
        w, h, out = mc.gif_decode(payload)
        assert (w, h) == (23, 17)
        assert out.tobytes() == img.tobytes()  # byte-exact

    def test_gif_roundtrip_code_width_growth(self):
        import numpy as np
        from ffp_spark import mediacodec as mc

        rng = np.random.RandomState(5)
        # 256 distinct colors + a large image drives the LZW dictionary
        # through several code-width bumps (9 -> 12 bits)
        vals = rng.randint(0, 256, (64, 64), dtype=np.uint8)
        img = np.stack([vals, vals ^ 0x5A, (vals * 3).astype(np.uint8)], axis=2)
        payload = mc.gif_encode(img)
        w, h, out = mc.gif_decode(payload)
        assert out.tobytes() == img.tobytes()

    def test_gif_roundtrip_dictionary_reset(self):
        import numpy as np
        from ffp_spark import mediacodec as mc

        rng = np.random.RandomState(13)
        # enough entropy to overflow the 4096-entry dictionary and force
        # a mid-stream CLEAR + reset on both sides
        vals = (rng.randint(0, 16, (128, 128)) * 17).astype(np.uint8)
        img = np.stack([vals, vals, vals], axis=2)
        payload = mc.gif_encode(img)
        _, _, out = mc.gif_decode(payload)
        assert out.tobytes() == img.tobytes()

    def test_gif_two_color_and_flat(self):
        import numpy as np
        from ffp_spark import mediacodec as mc

        flat = np.full((9, 7, 3), 200, dtype=np.uint8)
        _, _, out = mc.gif_decode(mc.gif_encode(flat))
        assert out.tobytes() == flat.tobytes()
        bw = np.zeros((8, 8, 3), dtype=np.uint8)
        bw[::2, ::2] = 255
        _, _, out = mc.gif_decode(mc.gif_encode(bw))
        assert out.tobytes() == bw.tobytes()

    def test_gif_interlaced_decode(self):
        import numpy as np
        import struct
        from ffp_spark import mediacodec as mc

        rng = np.random.RandomState(3)
        img = (rng.randint(0, 4, (16, 5, 3)) * 80).astype(np.uint8)
        # encode the rows in GIF pass order, then set the interlace flag:
        # the decoder must de-interlace back to the original row order
        order = (
            list(range(0, 16, 8)) + list(range(4, 16, 8))
            + list(range(2, 16, 4)) + list(range(1, 16, 2))
        )
        inter = bytearray(mc.gif_encode(img[np.asarray(order)]))
        inter[inter.index(b"\x2c") + 9] |= 0x40
        w, h, out = mc.gif_decode(bytes(inter))
        assert out.tobytes() == img.tobytes()

    def test_gif_corrupt_streams_raise_cleanly(self):
        import pytest
        import numpy as np
        from ffp_spark import mediacodec as mc

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        payload = bytearray(mc.gif_encode(img))
        with pytest.raises(ValueError):
            mc.gif_decode(b"GIF87a\x04\x00")  # truncated header
        truncated = bytes(payload[: len(payload) // 2])
        with pytest.raises(Exception):
            mc.gif_decode(truncated)
        too_many = np.zeros((32, 32, 3), dtype=np.uint8)  # 1024 distinct colors
        flat = too_many.reshape(-1, 3)
        flat[:, 0] = np.arange(1024) % 256
        flat[:, 1] = np.arange(1024) // 256
        with pytest.raises(ValueError):
            mc.gif_encode(too_many)


class TestJpegCodec:
    """Real baseline JPEG: lossy, so roundtrips assert tolerance; flat
    blocks reconstruct exactly."""

    @staticmethod
    def _smooth(h, w, seed):
        import numpy as np

        rng = np.random.RandomState(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack(
            [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=2
        ).astype(np.float64)
        return np.clip(base + rng.randn(h, w, 3) * 4, 0, 255).astype(np.uint8)

    def test_jpeg_roundtrip_444(self):
        import numpy as np
        from ffp_spark import mediacodec as mc

        img = self._smooth(40, 56, 1)
        p = mc.jpeg_encode(img, quant=2, subsample="444")
        assert mc.jpeg_dims(p) == (56, 40)
        w, h, out = mc.jpeg_decode(p)
        assert (w, h) == (56, 40)
        diff = np.abs(out.astype(int) - img.astype(int))
        assert diff.max() <= 8 and diff.mean() < 2.0, (diff.max(), diff.mean())

    def test_jpeg_roundtrip_subsampled_and_restarts(self):
        import numpy as np
        from ffp_spark import mediacodec as mc

        img = self._smooth(33, 41, 2)  # non-multiple-of-MCU dims
        for sub in ("422", "420"):
            for ri in (0, 2):
                w, h, out = mc.jpeg_decode(
                    mc.jpeg_encode(img, quant=2, subsample=sub, restart_interval=ri)
                )
                assert (w, h) == (41, 33)
                diff = np.abs(out.astype(int) - img.astype(int))
                # chroma averaging bounds: looser than 4:4:4
                assert diff.mean() < 5.0 and diff.max() < 48, (sub, ri, diff.max())

    def test_jpeg_flat_color_exact(self):
        import numpy as np
        from ffp_spark import mediacodec as mc

        flat = np.full((20, 24, 3), 99, dtype=np.uint8)
        _, _, out = mc.jpeg_decode(mc.jpeg_encode(flat, quant=2))
        assert np.array_equal(out, flat)

    def test_jpeg_corrupt_and_unsupported_raise_cleanly(self):
        import numpy as np
        import pytest
        from ffp_spark import mediacodec as mc

        img = np.full((16, 16, 3), 7, dtype=np.uint8)
        p = bytearray(mc.jpeg_encode(img))
        with pytest.raises(ValueError):
            mc.jpeg_decode(b"\x00\x01")
        with pytest.raises(ValueError):
            mc.jpeg_encode(img, quant=1)  # 11-bit AC magnitudes
        # flip SOF0 -> SOF2: the baseline scan header (Ss=0, Se=63) is
        # invalid for progressive, so the mislabeled file must raise
        # from the scan-header validation, not mis-decode
        i = bytes(p).find(b"\xff\xc0")
        p2 = bytearray(p)
        p2[i + 1] = 0xC2
        with pytest.raises(ValueError):
            mc.jpeg_decode(bytes(p2))

    def test_jpeg_decode_through_spark(self, spark):
        import numpy as np
        from ffp_spark import mediacodec as mc
        from ffp_spark.multimodal import decode_images

        img = self._smooth(24, 32, 3)
        rows = [
            {"media_id": "j0", "kind": "image",
             "payload": mc.jpeg_encode(img, quant=2),
             "mime": None, "duration_ms": None}
        ]
        df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        r = decode_images(df).collect()[0]
        assert (r.width, r.height) == (32, 24)
        got = np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(24, 32, 3)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 8  # REAL pixels


class TestProgressiveJpeg:
    """Progressive (SOF2) decode: successive approximation is lossless
    across scans, so decoding a progressive encoding must be
    BIT-IDENTICAL to decoding the baseline encoding of the same image
    at the same quant — both paths reconstruct the same coefficients."""

    def test_progressive_matches_baseline_pixels_exactly(self):
        import numpy as np
        from ffp_spark import mediacodec as mc

        rng = np.random.RandomState(7)
        for (h, w), sub in [
            ((20, 24), "444"),
            ((33, 41), "444"),  # non-multiple-of-MCU dims
            ((30, 44), "420"),
            ((17, 25), "422"),
            ((8, 8), "444"),
        ]:
            img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            _, _, base = mc.jpeg_decode(mc.jpeg_encode(img, quant=3, subsample=sub))
            wp, hp, prog = mc.jpeg_decode(
                mc.jpeg_encode_progressive(img, quant=3, subsample=sub)
            )
            assert (wp, hp) == (w, h)
            assert np.array_equal(base, prog), (h, w, sub)

    def test_progressive_smooth_and_flat(self):
        # smooth gradients exercise long ZRL/EOB runs; flat color is
        # DC-only (every AC scan is pure EOB streams)
        import numpy as np
        from ffp_spark import mediacodec as mc

        smooth = TestJpegCodec._smooth(40, 56, 11)
        _, _, base = mc.jpeg_decode(mc.jpeg_encode(smooth, quant=2))
        _, _, prog = mc.jpeg_decode(mc.jpeg_encode_progressive(smooth, quant=2))
        assert np.array_equal(base, prog)

        flat = np.full((20, 24, 3), 99, dtype=np.uint8)
        _, _, out = mc.jpeg_decode(mc.jpeg_encode_progressive(flat, quant=2))
        assert np.array_equal(out, flat)

    def test_progressive_with_restart_intervals(self):
        # DRI restarts inside progressive scans: predictors and EOB
        # runs reset at every RSTn in both encoder and decoder
        import numpy as np
        from ffp_spark import mediacodec as mc

        rng = np.random.RandomState(3)
        for (h, w), sub, ri in [((33, 41), "444", 2), ((30, 44), "420", 3),
                                ((24, 32), "444", 1)]:
            img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            _, _, base = mc.jpeg_decode(mc.jpeg_encode(img, quant=3, subsample=sub))
            _, _, prog = mc.jpeg_decode(
                mc.jpeg_encode_progressive(
                    img, quant=3, subsample=sub, restart_interval=ri
                )
            )
            assert np.array_equal(base, prog), (h, w, sub, ri)

    def test_progressive_truncated_raises_cleanly(self):
        import pytest
        from ffp_spark import mediacodec as mc

        img = TestJpegCodec._smooth(24, 32, 5)
        p = mc.jpeg_encode_progressive(img)
        with pytest.raises(ValueError):
            mc.jpeg_decode(p[:40])  # cut inside the first scan header

    def test_progressive_decode_through_spark(self, spark):
        # the multimodal decode path now yields REAL pixels for
        # progressive payloads (previously degraded to header dims)
        import numpy as np
        from ffp_spark import mediacodec as mc
        from ffp_spark.multimodal import decode_images

        img = TestJpegCodec._smooth(24, 32, 3)
        rows = [
            {"media_id": "jp0", "kind": "image",
             "payload": mc.jpeg_encode_progressive(img, quant=2),
             "mime": None, "duration_ms": None}
        ]
        df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        r = decode_images(df).collect()[0]
        assert (r.width, r.height) == (32, 24)
        got = np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(24, 32, 3)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 8


class TestRealCodecs:
    def test_gif_decode_roundtrip_through_spark(self, spark):
        import numpy as np
        from ffp_spark import mediacodec as mc

        rng = np.random.RandomState(9)
        imgs = {
            f"g{i}": (rng.randint(0, 4, (8 + i, 9 + i, 3)) * 85).astype(np.uint8)
            for i in range(3)
        }
        rows = [
            {"media_id": k, "kind": "image", "payload": mc.gif_encode(v),
             "mime": None, "duration_ms": None}
            for k, v in imgs.items()
        ]
        df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        got = {r.media_id: r for r in decode_images(df).collect()}
        for k, v in imgs.items():
            r = got[k]
            assert (r.width, r.height) == (v.shape[1], v.shape[0])
            assert bytes(r.pixels) == v.tobytes()  # REAL GIF pixels

    def test_png_decode_roundtrip_through_spark(self, spark):
        import numpy as np
        from ffp_spark import mediacodec as mc

        rng = np.random.RandomState(7)
        imgs = {f"p{i}": rng.randint(0, 256, (10 + i, 12 + i, 3), dtype=np.uint8) for i in range(4)}
        rows = [
            {"media_id": k, "kind": "image", "payload": mc.png_encode(v),
             "mime": None, "duration_ms": None}
            for k, v in imgs.items()
        ]
        df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        got = {r.media_id: r for r in decode_images(df).collect()}
        for k, v in imgs.items():
            r = got[k]
            assert (r.width, r.height) == (v.shape[1], v.shape[0])
            # REAL pixels, byte-exact
            assert bytes(r.pixels) == v.tobytes()

    def test_probe_media_reads_real_headers(self, spark, media):
        from ffp_spark.multimodal import probe_media

        probed = {r.media_id: r for r in probe_media(media).collect()}
        src = {r.media_id: r for r in media.collect()}
        assert len(probed) == len(src)
        for mid, p in probed.items():
            s = src[mid]
            if s.kind == "image":
                assert p.width is not None and p.height is not None
                assert p.mime in ("image/png", "image/jpeg")
            elif s.kind == "audio":
                assert p.mime == "audio/wav"
                assert p.sample_rate == 8000 and p.channels == 1
                assert p.duration_ms == s.duration_ms
            else:
                assert p.mime in ("video/mp4", "video/x-msvideo")
                assert p.duration_ms == s.duration_ms  # real mvhd/avih parse
                if p.mime == "video/x-msvideo":
                    # AVI probes carry real frame dimensions too
                    assert p.width is not None and p.height is not None

    def test_decode_audio_real_features(self, spark, media):
        import math

        from ffp_spark.multimodal import decode_audio

        feats = {r.media_id: r for r in decode_audio(media.filter("kind = 'audio'")).collect()}
        assert feats
        for r in feats.values():
            assert r.sample_rate == 8000 and r.channels == 1
            assert r.n_frames == r.duration_ms * 8  # 8000 Hz
            # a pure sine of amplitude A has RMS ~ A/sqrt(2)
            assert r.peak > 900
            assert abs(r.rms - r.peak / math.sqrt(2)) / r.peak < 0.05


class TestCorruptMediaDegradesGracefully:
    def test_corrupt_payloads_never_fail_tasks(self, spark):
        import struct

        # PNG signature + corrupt IDAT (zlib.error), truncated IHDR
        # (struct.error), truncated v1 mvhd (struct.error), corrupt WAV
        bad_png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 100) + b"IDAT" + b"garbage"
        trunc_png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + b"\x00\x00"
        trunc_mp4 = (
            struct.pack(">I", 16) + b"ftypmp42" + b"mp42"
            + struct.pack(">I", 24) + b"moov"
            + struct.pack(">I", 16) + b"mvhd" + b"\x01\x00\x00\x00" + b"\x00" * 4
        )
        bad_wav = b"RIFF" + struct.pack("<I", 100) + b"WAVEfmt " + b"\x02"
        rows = [
            {"media_id": "png_bad", "kind": "image", "payload": bad_png, "mime": None, "duration_ms": None},
            {"media_id": "png_trunc", "kind": "image", "payload": trunc_png, "mime": None, "duration_ms": None},
            {"media_id": "mp4_trunc", "kind": "video", "payload": trunc_mp4, "mime": None, "duration_ms": None},
            {"media_id": "wav_bad", "kind": "audio", "payload": bad_wav, "mime": None, "duration_ms": None},
        ]
        df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        from ffp_spark.multimodal import decode_audio, probe_media

        # none of these may raise — degraded rows come back instead
        decoded = decode_images(df.filter("kind = 'image'")).collect()
        assert len(decoded) == 2
        assert all(r.width is not None and len(r.pixels) == r.width * r.height * 3 for r in decoded)
        probed = {r.media_id: r for r in probe_media(df).collect()}
        assert len(probed) == 4
        assert probed["mp4_trunc"].duration_ms is None
        audio = decode_audio(df.filter("kind = 'audio'")).collect()
        assert len(audio) == 1 and audio[0].sample_rate is None

    def test_8bit_wav_silence_has_zero_rms(self, spark):
        import struct

        import numpy as np
        from ffp_spark import mediacodec as mc

        # 8-bit PCM silence is 0x80 per the spec
        data = b"\x80" * 8000
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        riff += b"data" + struct.pack("<I", len(data)) + data
        wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
        info = mc.wav_decode(wav)
        assert info["sample_rate"] == 8000 and info["n_frames"] == 8000
        assert int(np.max(np.abs(info["samples"]))) == 0  # silence decodes to 0

    def test_jpeg_dims_with_fill_bytes(self):
        from ffp_spark import mediacodec as mc

        plain = mc.jpeg_header(111, 222)
        # inject legal 0xFF fill bytes before the APP0 marker
        filled = plain[:2] + b"\xff\xff\xff" + plain[2:]
        assert mc.jpeg_dims(plain) == (111, 222)
        assert mc.jpeg_dims(filled) == (111, 222)


class TestAHash:
    def test_halves_roundtrip_and_block_semantics(self):
        import numpy as np

        from ffp_spark.multimodal import ahash64_halves

        # top-half dark, bottom-half bright: bits = rows 4..7 of the 8x8
        # grid -> lo (indices 0..31) all zero, hi all ones
        g = np.zeros((16, 16), dtype=np.int64)
        g[8:, :] = 200
        hi, lo = ahash64_halves(g)
        assert (hi, lo) == (0xFFFFFFFF, 0)
        # constant image: every block equals the mean -> all bits set
        assert ahash64_halves(np.full((16, 16), 7)) == (0xFFFFFFFF, 0xFFFFFFFF)
        # sides not divisible by 8 refuse loudly
        import pytest as _pytest

        with _pytest.raises(ValueError):
            ahash64_halves(np.zeros((15, 16)))

    def test_near_duplicate_gradients_have_small_hamming(self):
        import numpy as np

        from ffp_spark.multimodal import ahash64_halves

        y, x = np.mgrid[0:16, 0:16]
        base = (y * 16 + x) % 256
        h0 = ahash64_halves(base)
        h1 = ahash64_halves((base + 4) % 256)      # tiny brightness shift
        rnd = ahash64_halves((y * 131 + x * 29) % 256)  # different structure

        def ham(a, b):
            return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

        assert ham(h0, h1) <= 8          # perceptual near-dup stays close
        assert ham(h0, rnd) > ham(h0, h1)  # and closer than a reshuffle
