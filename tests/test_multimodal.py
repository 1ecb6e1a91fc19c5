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
