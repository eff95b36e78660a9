"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads ride as opaque ``binary`` columns next to
typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The imaging/audio codecs
are NOT installed in this container, so the codec step is stubbed —
either a clearly-marked :class:`NotImplementedError` (strict mode) or a
deterministic fake decoder — while everything Spark-side is real and
tested: schema, batch iteration, partition sizing, UDF signatures.

Scale notes
-----------
- Binary batches are bounded per Arrow chunk via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — decode memory is
  O(batch), not O(partition).
- ``repartition`` before the decode stage spreads large blobs; metadata
  predicates (mime/size) push down to the parquet scan because they are
  plain columns, so a "decode only JPEGs under 1 MB" pipeline never
  reads the other blobs' pages.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_ok", StringType(), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image/jpeg"), F.lit("image/png"), F.lit("audio/wav")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("mime"),
        (F.pmod(F.xxhash64("id"), F.lit(1024)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)) + 16).cast("int").alias("height"),
        F.lit(256).cast("long").alias("n_bytes"),
        F.encode(
            F.concat(F.lit("BLOB:"), F.md5(F.col("id").cast("string")), F.repeat(F.lit("x"), 219)),
            "utf-8",
        ).alias("payload"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """STUB CODEC. A real deployment plugs PIL/ffmpeg here. Deterministic:
    features derive from payload bytes so tests are stable."""
    arr = np.frombuffer(payload[: dim * 4].ljust(dim * 4, b"\0"), dtype=np.uint8)
    return (arr[: dim].astype(np.float32) / 255.0)


def extract_features(
    media: DataFrame, dim: int = 16, strict_codecs: bool = False
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, vectorized).

    strict_codecs=True raises NotImplementedError where the real codec
    would run — the unambiguous marker that this container has no
    imaging libraries; the Spark plumbing around it is production-real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict_codecs:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not installed in this "
                    "environment; plug a real decoder into _fake_decode"
                )
            feats = [
                _fake_decode(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "feature": feats,
                    "decode_ok": ["Y"] * len(pdf),
                }
            )

    pruned = media.select("media_id", "mime", "payload")
    return pruned.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id, frame_idx,
    frame_payload) rows, one per sampled frame. The frame splitter is the
    stub codec (fixed 4 fake frames per payload); the explode + schema
    shape is what a real ffmpeg-backed splitter would produce."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = 4  # stub: real codec asks the container
                for i in range(0, n_frames, every_n):
                    q = len(payload) // n_frames
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(bytes(payload[i * q : (i + 1) * q]))
            yield pd.DataFrame(out)

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_payload", BinaryType(), True),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)
