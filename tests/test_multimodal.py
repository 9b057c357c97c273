"""Multimodal plumbing tests: binary payload columns + Arrow-batched decode
(stub codec, real schema/partitioning/batch shape — SURVEY.md §2.11 X5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdlt_spark import tables
from sdlt_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.documents_as_media(tables.load(spark, SF, "documents"))


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta = dict(media.select("meta.*").head().asDict())
    assert set(meta) == {"format", "width", "height", "n_bytes"}


def test_decode_features_shape(media):
    feats = mm.decode_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    sample = rows[0]["features"]
    assert len(sample) == mm.FEATURE_DIM
    # deterministic: same payload -> same features
    again = mm.decode_features(media).collect()
    assert {r["media_id"]: r["features"] for r in rows} == {
        r["media_id"]: r["features"] for r in again
    }


def test_decode_features_null_payload(spark):
    df = spark.createDataFrame(
        [(1, None, None)], mm.MEDIA_SCHEMA
    )
    out = mm.decode_features(df).collect()
    assert out[0]["features"] is None


def test_decode_image_stubbed(media):
    with pytest.raises(NotImplementedError):
        mm.decode_image(media)


def test_frame_sample(media):
    frames = mm.frame_sample(media, every_n_bytes=64)
    r = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).head()
    assert r["n"] >= 1
    first = frames.filter(F.col("frame_no") == 0).head()
    assert len(bytes(first["frame"])) <= 64


def test_resize_shrinks_payload_and_meta(spark):
    docs = tables.load(spark, SF, "documents").limit(50)
    media = mm.documents_as_media(docs)
    small = mm.resize(media, factor=4)
    joined = (
        media.select("media_id", F.col("meta.n_bytes").alias("orig"))
        .join(small.select("media_id", F.col("meta.n_bytes").alias("new")), "media_id")
        .collect()
    )
    assert joined
    for r in joined:
        # stride slice keeps ceil(n/4) bytes
        assert r["new"] == (r["orig"] + 3) // 4


def test_resize_output_schema_stable(spark):
    media = mm.documents_as_media(tables.load(spark, SF, "documents").limit(5))
    out = mm.resize(media)
    assert [f.name for f in out.schema.fields] == ["media_id", "payload", "meta"]
    assert out.schema["meta"].dataType == mm.MEDIA_SCHEMA["meta"].dataType
