"""Multimodal plumbing: binary columns + typed metadata + 1:N frame
sampling, with deterministic fake decode kernels (real codecs are not in
this container; the Spark-side schema/batching is what's under test)."""

import pytest
from pyspark.sql import functions as F, types as T

from docetl_spark.functions import multimodal as mm


@pytest.fixture()
def media(spark):
    rows = [
        {"path": "a.jpg", "content": bytes([1, 2, 3, 4])},
        {"path": "b.jpg", "content": bytes([9, 9])},
        {"path": "c.mp4", "content": bytes(range(10))},
    ]
    schema = T.StructType(
        [T.StructField("path", T.StringType()), T.StructField("content", T.BinaryType())]
    )
    return spark.createDataFrame(rows, schema=schema)


def test_decode_image_meta_schema_and_determinism(media):
    out = mm.decode_image_meta(media).collect()
    assert len(out) == 3
    metas = {r["path"]: r["image_meta"].asDict() for r in out}
    assert set(metas["a.jpg"]) == {"width", "height", "format"}
    # deterministic across runs
    out2 = mm.decode_image_meta(media).collect()
    assert {r["path"]: r["image_meta"] for r in out2} == {r["path"]: r["image_meta"] for r in out}


def test_image_features_unit_vectors(media):
    out = mm.image_features(media, dim=8).collect()
    for r in out:
        v = r["features"]
        assert len(v) == 8
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5


def test_frame_sample_one_to_many(media):
    out = mm.frame_sample(media, every_n=10).collect()
    # 1:N - deterministic frame count derived from byte length % 5 + 1
    by_path = {}
    for r in out:
        by_path.setdefault(r["path"], []).append(r["frame_index"])
    assert by_path["a.jpg"] == [0 + 10 * i for i in range(len(by_path["a.jpg"]))]
    assert all(len(v) >= 1 for v in by_path.values())


def test_real_decode_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        mm.decode_image_meta(media, fake=False).collect()


def test_metadata_filter_prunes_without_touching_bytes(media):
    meta = mm.decode_image_meta(media)
    filtered = meta.filter(F.col("image_meta.width") > 0).select("path", "image_meta.width")
    assert filtered.count() == 3
