"""Multimodal plumbing: schema, batching, determinism of the stubbed decode."""

import pytest

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
    # partition-independent (content-addressed stub)
    assert f1["payload_sha_like"].tolist() == f2["payload_sha_like"].tolist()
    for a, b in zip(f1["feature"], f2["feature"]):
        assert list(a) == list(b)


def test_real_decode_is_explicit_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|pillow|ffmpeg"):
        mm.extract_features(media, decode_stub=False).collect()
