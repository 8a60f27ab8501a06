"""Multimodal plumbing tests: binary columns + mapInPandas seams (schema,
batching, corrupt payloads, binary-out transforms). Real codecs are stubbed
(NotImplementedError) — the fake DCSM format carries the plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    return mm.attach_fake_media(docs).cache()


def test_attach_schema_and_counts(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "content",
        "content_type",
        "n_bytes",
    ]
    rows = media.collect()
    assert len(rows) == 40
    assert all(bytes(r.content)[:4] == b"DCSM" for r in rows)
    assert all(r.n_bytes == len(bytes(r.content)) for r in rows)


def test_decode_features_deterministic(media, spark):
    out = mm.decode_media(media).orderBy("media_id").collect()
    assert len(out) == 40 and all(r.ok for r in out)
    assert out[0].width == 8 and out[0].height == 6 and out[0].channels == 3
    # decode twice -> identical features (determinism across partitions)
    again = mm.decode_media(media).orderBy("media_id").collect()
    assert [r.mean_intensity for r in out] == [r.mean_intensity for r in again]


def test_corrupt_payload_flagged_not_fatal(spark):
    rows = [(1, mm.encode_fake_image(4, 4)), (2, b"JUNK" + b"\x00" * 10), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r.ok for r in mm.decode_media(df).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_resize_roundtrip(media):
    resized = mm.resize_media(media, 4, 4)
    decoded = mm.decode_media(resized).orderBy("media_id").collect()
    assert all(r.width == 4 and r.height == 4 and r.ok for r in decoded)


def test_frame_sample_fan_out_and_compose(spark):
    vids = spark.createDataFrame(
        [
            (1, mm.encode_fake_video(6, 4, 3, seed=1)),
            (2, mm.encode_fake_video(3, 5, 2, seed=2)),
            (3, b"NOPE"),  # corrupt container -> skipped, not fatal
        ],
        "media_id long, content binary",
    )
    frames = mm.frame_sample(vids, every_nth=2).orderBy("media_id", "frame_no")
    got = [(r.media_id, r.frame_no) for r in frames.collect()]
    assert got == [(1, 0), (1, 2), (1, 4), (2, 0), (2, 2)]
    # sampled frames are standalone images: decode composes unchanged
    decoded = mm.decode_media(frames.withColumn(
        "media_id", F.col("media_id") * 10 + F.col("frame_no"))).collect()
    assert all(r.ok for r in decoded)
    assert {(r.width, r.height) for r in decoded} == {(4, 3), (5, 2)}


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
