"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this container):
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``, which
produces a deterministic fake decode so the Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, size: int = 64) -> DataFrame:
    """Deterministic binary payload per row (stand-in for real image bytes)."""
    return df.withColumn(
        "payload",
        F.to_binary(F.sha2(F.col(id_col).cast("string"), 256), F.lit("hex")),
    ).withColumn(
        "meta",
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit("fake").alias("format"),
        ),
    )


def decode_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    batch_hint: int = 512,
) -> DataFrame:
    """Decode binary payloads and emit fixed-size feature vectors via
    ``mapInPandas`` (Arrow batches; payload bytes never pass through Python
    row-at-a-time).

    Real decode requires PIL/ffmpeg — not in this container. With
    ``fake=True`` a deterministic pseudo-decode (bytes → histogram) keeps the
    distributed plumbing testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "Image/audio decode needs PIL/ffmpeg which are not installed; "
            "pass fake=True for the deterministic test path."
        )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for raw in pdf[payload_col]:
                arr = np.frombuffer(raw or b"", dtype=np.uint8)
                hist = np.bincount(arr % 16, minlength=16).astype("float64")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.
    The actual frame extraction is part of the stubbed decode; the row
    explosion (the Spark-side cost driver) is real."""
    n_frames = F.lit(100)  # stub: constant frame count per asset
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(F.col(id_col), F.explode(idx).alias("frame_idx"))
