"""Multimodal plumbing (UD4 [NORTH-STAR]): binary payload schema, Arrow
feature-stage batch shape, injectable decoder contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.queries.multimodal import (
    assets_from_documents,
    byte_histogram_features,
    decode_media,
    fake_decoder,
    real_decoder,
)


def test_asset_schema_is_opaque_binary_plus_metadata(spark, sf_dir):
    assets = assets_from_documents(spark, sf_dir)
    types = dict(assets.dtypes)
    assert types["payload"] == "binary"
    assert types["media_type"] == "string" and types["n_bytes"] == "bigint"
    r = assets.first()
    assert isinstance(r["payload"], (bytes, bytearray)) and r["n_bytes"] == len(
        r["payload"]
    )


def test_byte_histogram_sums_to_payload_length(spark, sf_dir):
    assets = assets_from_documents(spark, sf_dir).limit(50)
    feats = byte_histogram_features(assets)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["byte_hist"]) == 8
        assert sum(r["byte_hist"]) == r["n_bytes"]


def test_decode_media_with_fake_decoder(spark, sf_dir):
    assets = assets_from_documents(spark, sf_dir).limit(10)
    out = decode_media(assets, decoder=fake_decoder).collect()
    assert len(out) == 10
    for r in out:
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert 1 <= r["n_frames"] <= 30


def test_real_decoder_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decoder(1, b"\x00")


def test_payload_survives_shuffle_unparsed(spark, sf_dir):
    # the asset bytes must round-trip a repartition untouched
    assets = assets_from_documents(spark, sf_dir).limit(20)
    before = {r["doc_id"]: bytes(r["payload"]) for r in assets.collect()}
    after = {
        r["doc_id"]: bytes(r["payload"])
        for r in assets.repartition(4, "doc_id").collect()
    }
    assert before == after
    digests = (
        assets.repartition(4)
        .select("doc_id", F.sha2("payload", 256).alias("d"))
        .collect()
    )
    assert all(len(r["d"]) == 64 for r in digests)


def test_resize_media_with_fake_decoder(spark, sf_dir):
    """Resize stage: decoded source dims pass through, payload is strided
    down to the dst byte budget, binary end-to-end."""
    from uk_procurement_data_pipeline_spark.queries.multimodal import resize_media

    assets = assets_from_documents(spark, sf_dir).limit(10)
    src = {r["doc_id"]: bytes(r["payload"]) for r in assets.collect()}
    out = resize_media(assets, 8, 8, decoder=fake_decoder).collect()
    assert len(out) == 10
    for r in out:
        buf = src[r["doc_id"]]
        assert (r["src_w"], r["src_h"]) == (len(buf) % 640 + 1, len(buf) % 480 + 1)
        assert (r["dst_w"], r["dst_h"]) == (8, 8)
        stride = max(1, len(buf) // 64)
        assert bytes(r["resized"]) == buf[::stride][:64]
        assert len(bytes(r["resized"])) <= 64


def test_frame_sample_cadence(spark, sf_dir):
    """Every 3rd 16-byte frame, tail frame included short."""
    from uk_procurement_data_pipeline_spark.queries.multimodal import frame_sample

    assets = assets_from_documents(spark, sf_dir).limit(5)
    src = {r["doc_id"]: bytes(r["payload"]) for r in assets.collect()}
    rows = frame_sample(assets, every_n=3).collect()
    seen = {}
    for r in rows:
        buf = src[r["doc_id"]]
        assert r["frame_idx"] % 3 == 0
        assert r["frame_hex"] == buf[r["frame_idx"] * 16 : (r["frame_idx"] + 1) * 16].hex().upper()
        seen.setdefault(r["doc_id"], 0)
        seen[r["doc_id"]] += 1
    for doc_id, n in seen.items():
        n_frames = (len(src[doc_id]) + 15) // 16
        assert n == len(range(0, n_frames, 3))
