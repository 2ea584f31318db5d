"""Multimodal plumbing: schema, batching, real PNM decode, content hashing."""

import numpy as np
import pytest

from pcompress_spark import kernels
from pcompress_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=48).cache()


def test_feature_extraction_shape_and_determinism(spark, media):
    f1 = mm.extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    f2 = mm.extract_features(media.repartition(7)).toPandas().sort_values(
        "media_id").reset_index(drop=True)
    assert len(f1) == 48
    assert all(len(v) == mm.FEATURE_DIM for v in f1["feature"])
    # partition-independent (content-addressed)
    assert f1["payload_sha_like"].tolist() == f2["payload_sha_like"].tolist()
    for a, b in zip(f1["feature"], f2["feature"]):
        assert list(a) == list(b)
    # images, audio, AND png decode for real; video uses the declared stub
    by_kind = f1.groupby("kind")["decoded"].all()
    assert by_kind["image"] and by_kind["audio"] and by_kind["png"]
    assert not f1[f1["kind"] == "video"]["decoded"].any()
    # header tier: every container header parses in-tree now (PNM/WAV full
    # decode, JPEG marker walk, PNG IHDR, MP4 box walk)
    by_hdr = f1.groupby("kind")["header_decoded"].all()
    assert by_hdr["image"] and by_hdr["audio"] and by_hdr["jpeg"]
    assert by_hdr["png"] and by_hdr["video"]
    # header-only jpeg rasters stay behind the stub (undecodable entropy);
    # jpeg_full rows DECODE for real (jpeg_baseline entropy decode + IDCT)
    assert not f1[f1["kind"] == "jpeg"]["decoded"].any()
    assert by_kind["jpeg_full"] and by_hdr["jpeg_full"]
    # decoded jpeg carries the DQT quality estimate like the header tier
    assert f1[f1["kind"] == "jpeg_full"]["jpeg_quality"].notna().all()
    # jpeg/png/video parsed dims equal the generator's metadata columns
    meta = mm.generate_media_pdf(n=48).set_index("media_id")
    for r in f1[f1["kind"].isin(["jpeg", "png", "video",
                                 "jpeg_full"])].itertuples():
        assert int(r.hdr_width) == int(meta.at[r.media_id, "width"])
        assert int(r.hdr_height) == int(meta.at[r.media_id, "height"])


def test_jpeg_header_decode():
    ent = bytes(range(1, 200))
    p = mm.make_jpeg_header(640, 480, ent)
    assert mm.decode_jpeg_header(p) == (640, 480, 1)
    # marker walk must skip unknown segments (insert a COM before SOF)
    com = b"\xff\xfe\x00\x07hello"
    walked = p[:20] + com + p[20:]
    assert mm.decode_jpeg_header(walked) == (640, 480, 1)
    # progressive SOF2 parses too
    assert mm.decode_jpeg_header(
        mm.make_jpeg_header(33, 9, ent, progressive=True)) == (33, 9, 1)
    # invalid: not jpeg / truncated segment / SOS before any SOF
    assert mm.decode_jpeg_header(None) is None
    assert mm.decode_jpeg_header(b"P5\n1 1\n255\n\x00") is None
    assert mm.decode_jpeg_header(p[:24]) is None
    # SOI + APP0 (20 bytes), then straight to SOS — drop the DQT (69 B)
    # and SOF (13 B) segments
    no_sof = p[:20] + p[102:]
    assert p[102:104] == b"\xff\xda"
    assert mm.decode_jpeg_header(no_sof) is None


def test_jpeg_quality_estimate():
    """The DQT quality estimator inverts make_jpeg_header's IJG scaling:
    exact round-trip at even-scale qualities, within 1 elsewhere (clamp
    rounding); non-JPEG and DQT-less payloads give None."""
    ent = bytes(range(1, 100))
    for q in (25, 50, 60, 75, 90, 95, 100):
        p = mm.make_jpeg_header(64, 64, ent, quality=q)
        est = mm.jpeg_quality_estimate(p)
        assert est is not None and abs(est - q) <= 1, (q, est)
    # very low quality: the 255-coefficient clamp truncates the sum, so
    # the estimate reads the CLAMPED table (higher than the setting) —
    # the same behavior real-world DQT estimators have
    est10 = mm.jpeg_quality_estimate(mm.make_jpeg_header(8, 8, ent, quality=10))
    assert est10 is not None and 10 <= est10 <= 25
    # quality ordering is monotone in the table scale
    qs = [mm.jpeg_quality_estimate(mm.make_jpeg_header(8, 8, ent, quality=q))
          for q in (20, 40, 60, 80)]
    assert qs == sorted(qs)
    assert mm.jpeg_quality_estimate(b"P5\n1 1\n255\n\x00") is None
    # a JPEG without any DQT before SOS estimates nothing
    p = mm.make_jpeg_header(64, 64, ent, quality=75)
    no_dqt = p[:20] + p[89:]
    assert p[89:91] == b"\xff\xc0"
    assert mm.jpeg_quality_estimate(no_dqt) is None
    # 16-bit (Pq=1) table parses too: same coefficients widened to BE16
    coefs8 = p[25:89]
    dqt16 = (b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + bytes([0x10])
             + b"".join(bytes([0, c]) for c in coefs8))
    p16 = p[:20] + dqt16 + p[89:]
    assert mm.jpeg_quality_estimate(p16) == mm.jpeg_quality_estimate(p)


def test_mp4_header_decode():
    ent = bytes(range(1, 200))
    p = mm.make_mp4(1920, 1080, 42_500, ent)
    assert mm.decode_mp4_header(p) == (1920, 1080, 42_500)
    # box walk must skip unknown top-level boxes (insert 'free' before moov)
    import struct
    free = struct.pack(">I", 12) + b"free" + b"xxxx"
    walked = p[:20] + free + p[20:]
    assert mm.decode_mp4_header(walked) == (1920, 1080, 42_500)
    # size==0 (box extends to EOF) handled on the last box
    tail = p[:236] + struct.pack(">I", 0) + b"mdat" + ent
    assert mm.decode_mp4_header(tail) == (1920, 1080, 42_500)
    # invalid: not mp4 / truncated mid-box / ftyp but no moov
    assert mm.decode_mp4_header(None) is None
    assert mm.decode_mp4_header(b"RIFF....WAVE") is None
    assert mm.decode_mp4_header(p[:100]) is None
    assert mm.decode_mp4_header(p[:20] + p[236:]) is None


def test_png_header_decode():
    idat = bytes(range(1, 100))
    p = mm.make_png(800, 600, idat)
    assert mm.decode_png_header(p) == (800, 600, 1)
    # 4-byte dims parse fully (above 16-bit)
    assert mm.decode_png_header(mm.make_png(70000, 3, idat)) == (70000, 3, 1)
    # invalid: not png / truncated / signature without IHDR first
    assert mm.decode_png_header(None) is None
    assert mm.decode_png_header(p[:20]) is None
    assert mm.decode_png_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30) is None
    assert mm.decode_png_header(mm.make_jpeg_header(8, 8, idat)) is None
    # jpeg parser rejects png and vice versa (router picks exactly one)
    assert mm.decode_jpeg_header(p) is None


def test_png_raster_roundtrip():
    """decode_png must invert make_png_raster exactly — every filter type
    (the encoder cycles 0..4 by row, so h >= 5 exercises them all)."""
    rng = np.random.Generator(np.random.PCG64(7))
    for w, h in [(1, 1), (3, 7), (16, 16), (31, 9)]:
        raster = rng.integers(0, 256, size=w * h, dtype=np.uint8)
        p = mm.make_png_raster(w, h, raster)
        got = mm.decode_png(p)
        assert got is not None, (w, h)
        out, gw, gh = got
        assert (gw, gh) == (w, h)
        assert out.tolist() == raster.tolist(), (w, h)
    # fake-IDAT container is refused (undecodable), header still parses
    fake = mm.make_png(8, 8, bytes(range(1, 100)))
    assert mm.decode_png(fake) is None
    assert mm.decode_png_header(fake) == (8, 8, 1)
    # corrupted CRC is refused
    good = mm.make_png_raster(8, 8, np.zeros(64, dtype=np.uint8))
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    assert mm.decode_png(bad) is None
    assert mm.decode_png(None) is None


def test_pnm_decode_roundtrip():
    raster = np.arange(12, dtype=np.uint8)
    p5 = b"P5\n4 3\n255\n" + raster.tobytes()
    got = mm.decode_pnm(p5)
    assert got is not None and got.tolist() == list(range(12))
    # comments + arbitrary whitespace in header
    p5c = b"P5 # comment\n # more\n 4\t3\n255\n" + raster.tobytes()
    assert mm.decode_pnm(p5c).tolist() == list(range(12))
    # P6 RGB
    p6 = b"P6\n2 2\n255\n" + bytes(range(12))
    assert mm.decode_pnm(p6).tolist() == list(range(12))
    # invalid payloads
    assert mm.decode_pnm(None) is None
    assert mm.decode_pnm(b"JFIF....") is None
    assert mm.decode_pnm(b"P5\n4 3\n255\nshort") is None
    assert mm.decode_pnm(b"P5\n0 3\n255\n") is None


def test_wav_decode_roundtrip():
    samples = np.array([-32768, -1, 0, 1, 32767, 1234], dtype="<i2")
    wav = mm.make_wav(samples)
    got = mm.decode_wav(wav)
    assert got is not None and got.tolist() == samples.tolist()
    # invalid payloads: wrong magic, stereo, 8-bit, truncated data
    assert mm.decode_wav(None) is None
    assert mm.decode_wav(b"RIFF" + wav[4:8] + b"AIFF" + wav[12:]) is None
    stereo = bytearray(wav); stereo[22] = 2
    assert mm.decode_wav(bytes(stereo)) is None
    eight = bytearray(wav); eight[34] = 8
    assert mm.decode_wav(bytes(eight)) is None
    assert mm.decode_wav(wav[:-2]) is None


def test_audio_feature_is_amplitude_histogram(spark):
    pdf = mm.generate_media_pdf(n=6, seed=9)
    wav = pdf[pdf["kind"] == "audio"].iloc[0]
    samples = mm.decode_wav(wav["payload"])
    want = mm.amplitude_histogram(samples)
    sdf = mm.synthetic_media(spark, n=6, seed=9)
    feats = mm.extract_features(sdf).toPandas().set_index("media_id")
    got = np.asarray(feats.loc[wav["media_id"], "feature"], dtype=np.float32)
    assert np.array_equal(got, want)
    assert abs(float(want.sum()) - 1.0) < 1e-6


def test_image_feature_is_pixel_histogram(spark):
    pdf = mm.generate_media_pdf(n=6, seed=9)
    img = pdf[pdf["kind"] == "image"].iloc[0]
    raster = mm.decode_pnm(img["payload"])
    want = mm.raster_histogram(raster)
    sdf = mm.synthetic_media(spark, n=6, seed=9)
    feats = mm.extract_features(sdf).toPandas().set_index("media_id")
    got = np.asarray(feats.loc[img["media_id"], "feature"], dtype=np.float32)
    assert np.array_equal(got, want)
    assert abs(float(want.sum()) - 1.0) < 1e-6


def test_payload_hash_is_content_hash():
    """Equal-length payloads with different bytes MUST hash differently
    (the round-1 length-hash bug)."""
    a, b = b"\x00" * 128, b"\x00" * 127 + b"\x01"
    ha, hb = kernels.hash_bytes_rows([a, b])
    assert int(ha) != int(hb)
    # batch result == singleton result (mask correctness across widths)
    mixed = kernels.hash_bytes_rows([a, b"xy", b, b"", None])
    assert int(mixed[0]) == int(ha)
    assert int(mixed[2]) == int(hb)
    assert int(mixed[3]) == int(mixed[4])  # empty == None sentinel


def test_real_decode_raises_only_for_undecodable(spark, media):
    from pyspark.sql import functions as F

    decodable = media.where(F.col("kind").isin("image", "audio"))
    out = mm.extract_features(decodable, decode_stub=False).toPandas()
    assert out["decoded"].all()
    with pytest.raises(Exception, match="NotImplementedError|decoder|decode_stub"):
        mm.extract_features(media.where(F.col("kind") == "video"),
                            decode_stub=False).collect()


class TestJpegBaselineCodec:
    """jpeg_baseline: real entropy decode + IDCT (grayscale baseline)."""

    def test_constant_block_closed_form(self):
        import math

        from pcompress_spark.functions.jpeg_baseline import (
            SNAP, decode_baseline, encode_baseline, quality_scaled_qt)

        rng = np.random.Generator(np.random.PCG64(3))
        for q in (25, 50, 75, 92):
            bv = rng.integers(0, 256, size=(3, 5))
            raster = np.repeat(np.repeat(bv, 8, 0), 8, 1).astype(np.uint8)
            dec, w, h = decode_baseline(encode_baseline(raster, q))
            assert (w, h) == (40, 24)
            q00 = int(quality_scaled_qt(q)[0])
            exp = np.vectorize(
                lambda v: min(255, max(0, math.floor(
                    math.floor(8 * (int(v) - 128) / q00 + 0.5 + SNAP)
                    * q00 / 8 + 128.5 + SNAP))))(bv)
            assert (dec.reshape(h, w)
                    == np.repeat(np.repeat(exp, 8, 0), 8, 1)).all()

    def test_general_raster_bounded_error(self):
        from pcompress_spark.functions.jpeg_baseline import (
            decode_baseline, encode_baseline)

        rng = np.random.Generator(np.random.PCG64(4))
        raster = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
        dec, w, h = decode_baseline(encode_baseline(raster, 95))
        err = np.abs(dec.reshape(h, w).astype(int) - raster.astype(int))
        assert err.mean() < 4 and err.max() < 32  # quantization-bounded
        # smooth content roundtrips near-losslessly at high quality
        yy, xx = np.mgrid[0:24, 0:32]
        smooth = (yy * 3 + xx * 2 + 40).astype(np.uint8)
        dec2, _, _ = decode_baseline(encode_baseline(smooth, 95))
        assert np.abs(dec2.reshape(24, 32).astype(int)
                      - smooth.astype(int)).mean() < 1

    def test_refusals(self):
        from pcompress_spark.functions.jpeg_baseline import decode_baseline

        # header-only fixture (no DHT), progressive SOF, non-JPEG, None
        assert decode_baseline(mm.make_jpeg_header(64, 64, b"ab" * 40)) is None
        assert decode_baseline(
            mm.make_jpeg_header(64, 64, b"ab" * 40, progressive=True)) is None
        assert decode_baseline(b"P5\n1 1\n255\n\x00") is None
        assert decode_baseline(None) is None
        assert decode_baseline(mm.make_wav(np.zeros(8, dtype=np.int16))) is None

    def test_header_tier_readers_see_baseline_payloads(self):
        """The DQT/SOF offset contracts hold for encode_baseline output:
        header parser and quality estimator read it like any JPEG."""
        from pcompress_spark.functions.jpeg_baseline import encode_baseline

        raster = np.full((16, 24), 200, dtype=np.uint8)
        p = encode_baseline(raster, 80)
        assert mm.decode_jpeg_header(p) == (24, 16, 1)
        est = mm.jpeg_quality_estimate(p)
        assert est is not None and abs(est - 80) <= 1
