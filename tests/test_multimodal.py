"""Multimodal plumbing: schemas, mapInPandas batch shapes, deterministic
fake decode, frame sampling; real decode correctly gated."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    make_media_fixture,
    resize_stub,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_media_fixture(spark, n=48).cache()


def test_fixture_deterministic(spark):
    a = make_media_fixture(spark, n=8).collect()
    b = make_media_fixture(spark, n=8).collect()
    assert [bytes(r.payload) for r in a] == [bytes(r.payload) for r in b]


def test_real_decode_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 100, fake=False)


def test_feature_extraction_golden(spark, media):
    feats = {r.media_id: r for r in extract_image_features(media).collect()}
    rows = media.collect()
    assert set(feats) == {r.media_id for r in rows}
    for r in rows[:10]:
        payload = bytes(r.payload)
        f = feats[r.media_id]
        assert f.n_bytes == len(payload)
        assert f.sha256 == hashlib.sha256(payload).hexdigest()
        arr = np.frombuffer(payload, dtype=np.uint8)
        assert f.histogram == np.bincount(arr // 16, minlength=16)[:16].tolist()
        img = decode_image(payload, fake=True)
        assert f.mean_byte == pytest.approx(float(img.mean()), rel=1e-6)


def test_frame_sampling_shapes(spark, media):
    frames = sample_frames(media, every_n_bytes=512, max_frames=4)
    pdf = frames.toPandas()
    assert (pdf.groupby("media_id")["frame_idx"].count() <= 4).all()
    sizes = pdf["frame_bytes"].map(len)
    assert (sizes <= 512).all()
    # deterministic content: frame 0 == payload prefix
    row = media.filter(F.col("media_id") == 0).collect()[0]
    f0 = pdf[(pdf.media_id == 0) & (pdf.frame_idx == 0)]["frame_bytes"].iloc[0]
    assert bytes(f0) == bytes(row.payload)[:512]


def test_no_shuffle_in_feature_plan(spark, media):
    plan = extract_image_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # payloads must not shuffle


def test_resize_stub_metadata(spark, media):
    out = resize_stub(media, 224, 224)
    r = out.limit(1).collect()[0]
    assert (r.width, r.height) == (224, 224)


def test_decode_image_pil_gate():
    """Real-codec gate (mirrors the netCDF4 gate): PIL decodes when
    importable; the documented NotImplementedError otherwise."""
    from gridmet_etl_spark.operators.multimodal import decode_image

    try:
        from PIL import Image

        has_pil = True
    except ImportError:
        has_pil = False

    if not has_pil:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG not really", fake=False)
    else:  # pragma: no cover - PIL not in this container
        import io

        import numpy as np

        img = Image.new("L", (4, 3), color=7)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        arr = decode_image(buf.getvalue(), fake=False)
        assert arr.shape == (3, 4)
        assert np.all(arr == 7.0)
