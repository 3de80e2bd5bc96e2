"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The decode/feature libraries (PIL, ffmpeg, torchaudio, ...) are NOT in
this container, so the decode kernels are stubbed: ``fake=True`` (the
default in tests) produces deterministic synthetic outputs so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
testable; ``fake=False`` raises NotImplementedError at the exact point a
real decoder would plug in.

Pattern: every kernel is a ``mapInPandas`` iterator over Arrow batches,
with media bytes staying in a single binary column (never exploded
row-per-pixel), and metadata in a sibling struct column so filters on
metadata push down without touching bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)


def read_binary_dir(spark, path: str, *, glob: str | None = None) -> DataFrame:
    """Directory of media files -> (path, modificationTime, length,
    content) via Spark's binaryFile source (scales: file listing is
    distributed, contents stream per-partition)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _widen(df: DataFrame) -> DataFrame:
    """Media kernels are Python-bound; widen narrow scan-shaped inputs
    (see operators.semantic.widen_for_model_stage)."""
    from ..operators.semantic import widen_for_model_stage

    return widen_for_model_stage(df)


def _fake_decode(content: bytes) -> dict:
    h = hashlib.md5(content or b"").digest()
    return {"width": 16 + h[0] % 64, "height": 16 + h[1] % 64, "format": "fake"}


def decode_image_meta(df: DataFrame, content_col: str = "content", *, fake: bool = True) -> DataFrame:
    """Attach an image-metadata struct. Real impl would parse headers
    (cheap, no full decode); stubbed deterministically here."""
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField("image_meta", IMAGE_META, True)])

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image decoding requires PIL; not available in this container")
            pdf = pdf.copy()
            pdf["image_meta"] = [_fake_decode(c) for c in pdf[content_col]]
            yield pdf

    return _widen(df).mapInPandas(run, schema=out_schema)


def image_features(df: DataFrame, content_col: str = "content", *, dim: int = 16, fake: bool = True) -> DataFrame:
    """Feature-extraction kernel shape: bytes -> float vector. Stub derives
    a deterministic unit vector from the content hash."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError("feature extraction requires a vision model; stubbed")
            feats = []
            for c in pdf[content_col]:
                seed = int(hashlib.md5(c or b"").hexdigest()[:8], 16)
                v = np.random.RandomState(seed).standard_normal(dim)
                feats.append((v / (np.linalg.norm(v) or 1.0)).astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return _widen(df).mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, content_col: str = "content", *, every_n: int = 30, fake: bool = True) -> DataFrame:
    """Video -> frame rows (1:N explode shape). Stub emits a deterministic
    frame count derived from byte length; real impl would demux."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("frame_index", T.LongType(), True), T.StructField("frame", T.BinaryType(), True)]
    )

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video demux requires ffmpeg; stubbed")
            rows = []
            for rec in pdf.to_dict("records"):
                n_frames = (len(rec[content_col] or b"") % 5) + 1
                for i in range(n_frames):
                    rows.append({**rec, "frame_index": i * every_n, "frame": rec[content_col]})
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    return _widen(df).mapInPandas(run, schema=out_schema)
