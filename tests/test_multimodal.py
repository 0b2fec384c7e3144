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


class TestRealCodecs:
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
                assert p.mime == "video/mp4"
                assert p.duration_ms == s.duration_ms  # real mvhd parse

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
