"""Multimodal plumbing tests: media wrapping, Arrow-batched feature
extraction, frame sampling fan-out, and resize passthrough — the
Spark-side contracts that stay fixed when real codecs replace the
stubs."""

from __future__ import annotations

import pytest

from nhl_data_warehouse_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (1, "a" * 300, "web"),
            (2, "b" * 64, "pdf"),
            (3, "", "empty"),
        ],
        "doc_id long, text string, source string",
    )
    return multimodal.as_media_table(docs)


def test_metadata_projection_never_reads_payload(spark, media):
    meta = media.select("media_id", "meta.n_bytes", "meta.mime")
    rows = {r.media_id: r.n_bytes for r in meta.collect()}
    assert rows == {1: 300, 2: 64, 3: 0}
    # payload column absent from the scan-side projection
    assert "payload" not in meta.columns


def test_feature_extract_batch_contract(media):
    feats = {r.media_id: r for r in multimodal.extract_features(media).collect()}
    assert feats[1].n_bytes == 300
    assert feats[1].byte_mean == pytest.approx(97.0)  # ord('a')
    assert feats[3].n_bytes == 0 and feats[3].byte_mean == 0.0
    assert not feats[1].decoded_real  # stubbed decode is flagged


def test_frame_sample_fanout_and_determinism(media):
    frames = multimodal.frame_sample(media, every_n=4, frame_bytes=64).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    # 300 bytes, step 256: frames at offsets 0 and 256 -> 64 and 44 bytes
    one = sorted(by_id[1], key=lambda r: r.frame_index)
    assert [(r.frame_index, r.n_frame_bytes) for r in one] == [(0, 64), (1, 44)]
    assert bytes(one[0].frame_payload) == b"a" * 64
    # 64 bytes -> exactly one full frame; empty payload -> no frames
    assert [(r.frame_index, r.n_frame_bytes) for r in by_id[2]] == [(0, 64)]
    assert 3 not in by_id


def test_resize_stub_keeps_media_shape(media):
    out = multimodal.resize_stub(media, max_dim=128)
    assert out.schema == multimodal.MEDIA_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].meta.n_bytes == 150  # stub halves the payload
    assert rows[1].meta.mime.endswith("resized")
    assert rows[1].meta.source == "web"
