"""Multimodal plumbing: binary columns, metadata, stubbed decode via Arrow."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators import multimodal


@pytest.fixture(scope="module")
def blobs(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(50)
    return multimodal.attach_blob(docs, "text")


def test_blob_meta(blobs):
    out = multimodal.blob_meta(blobs, media_type="image/fake")
    r = out.select("doc_id", "text", "media_meta").collect()[0]
    expect = hashlib.sha256(r.text.encode()).hexdigest()
    assert r.media_meta.content_sha == expect
    assert r.media_meta.n_bytes == len(r.text.encode())
    assert r.media_meta.media_type == "image/fake"


def test_decode_image_features_stub(blobs):
    feats = multimodal.decode_image_features(blobs, fake=True).collect()
    assert len(feats) == 50
    for r in feats:
        assert 16 <= r.width <= 271 and r.channels == 3
        assert len(r.feature) == 8 and all(0 <= x <= 1 for x in r.feature)
    # determinism: rerun produces identical rows
    again = {r.doc_id: (r.width, tuple(r.feature)) for r in
             multimodal.decode_image_features(blobs, fake=True).collect()}
    for r in feats:
        assert again[r.doc_id] == (r.width, tuple(r.feature))


def test_decode_without_libs_raises(blobs):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_features(blobs, fake=False)
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(blobs, fake=False)


def test_sample_frames_stub(blobs):
    frames = multimodal.sample_frames(blobs, every_n=4, fake=True)
    rows = frames.collect()
    assert all(r.frame_index % 4 == 0 for r in rows)
    n_docs = len({r.doc_id for r in rows})
    assert n_docs == 50


def test_resize_image_stub(blobs):
    out = multimodal.resize_image(blobs, 8, 6, fake=True).collect()
    assert len(out) == 50
    for r in out:
        assert (r.width, r.height) == (8, 6)
        assert len(r.resized) == 8 * 6 * 3
    # deterministic payloads
    again = {r.doc_id: bytes(r.resized) for r in
             multimodal.resize_image(blobs, 8, 6, fake=True).collect()}
    for r in out:
        assert again[r.doc_id] == bytes(r.resized)


def test_decode_audio_features_stub(blobs):
    out = multimodal.decode_audio_features(blobs, fake=True).collect()
    assert len(out) == 50
    for r in out:
        assert r.sample_rate == 16_000
        assert r.n_samples > 0
        assert abs(r.duration_s - r.n_samples / 16_000) < 1e-12
        assert len(r.feature) == 8


def test_resize_audio_without_libs_raise(blobs):
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(blobs, 8, 6, fake=False)
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio_features(blobs, fake=False)
