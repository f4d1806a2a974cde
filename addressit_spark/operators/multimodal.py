"""Multimodal span operators: typed metadata + decode/feature plumbing.

Media spans are opaque references (``media_ref``) with binary payloads at
rest; this module implements the Spark-side plumbing a multimodal training
pipeline needs — schemas, batch shapes, partition behavior — with the codec
step STUBBED: the container has no image/audio libraries, so ``decode``
either raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake payload/feature vector derived from the media_ref hash
(test mode). Swapping in a real codec changes only ``_decode_payload``.

Everything crosses the JVM↔Python boundary as Arrow batches via
``mapInPandas``; payload bytes live in a ``binary`` column.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("pos", IntegerType()),
        StructField("kind", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_DIM = 32

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("pos", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def media_spans(spans: DataFrame) -> DataFrame:
    """Filter the exploded span table down to media spans."""
    return spans.where(F.col("kind") != "text").select(
        "doc_id", "pos", "kind", "media_ref", "offset"
    )


def _fake_bytes(media_ref: str, n: int = 256) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.blake2b(
            b"media|%d|" % i + media_ref.encode(), digest_size=64
        ).digest()
        i += 1
    return out[:n]


def _decode_payload(media_ref: str, kind: str, stub: bool) -> bytes:
    if not stub:
        # real codecs (PIL/ffmpeg/soundfile) are not present in this
        # container; the Spark plumbing around this call is real and tested.
        raise NotImplementedError(
            "media decode requires codec libraries not present in this environment"
        )
    return _fake_bytes(media_ref)


def with_media_meta(spans: DataFrame) -> DataFrame:
    """Typed metadata per media span, derived deterministically (no Python).

    Width/height/duration are hash-derived stand-ins with realistic ranges;
    with a real object store these would come from the manifest. All column
    expressions — stays in whole-stage codegen.
    """
    m = media_spans(spans)
    h = F.abs(F.xxhash64("media_ref"))
    return m.select(
        "doc_id",
        "pos",
        "kind",
        "media_ref",
        F.when(F.col("kind") == "image", (h % 1920 + 64).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("width"),
        F.when(F.col("kind") == "image", (F.abs(F.xxhash64("media_ref", F.lit(1))) % 1080 + 64).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("height"),
        F.when(F.col("kind") != "image", (h % 600_000 + 1000).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("duration_ms"),
        (h % 10_000_000 + 1024).cast("long").alias("n_bytes"),
    )


def decode_and_featurize(spans: DataFrame, stub: bool = True) -> DataFrame:
    """Decode media payloads and extract a feature vector per span.

    The decode step is the stub boundary (see module docstring); the
    feature extractor here is a deterministic byte-histogram projection so
    downstream similarity plumbing (array<float> columns) is exercised with
    real shapes. Arrow-batched; one Python worker per input partition.
    """
    m = media_spans(spans)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            feats = []
            for ref, kind in zip(pdf["media_ref"], pdf["kind"]):
                payload = _decode_payload(ref, kind, stub)
                payloads.append(payload)
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                hist = np.bincount(arr.astype(np.int64) % FEATURE_DIM, minlength=FEATURE_DIM)
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / norm).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pos": pdf["pos"],
                    "media_ref": pdf["media_ref"],
                    "payload": payloads,
                    "feature": feats,
                }
            )

    return m.mapInPandas(kernel, schema=MEDIA_FEATURE_SCHEMA)


def frame_sample_plan(spans: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand video spans into a frame-sampling work list (timestamps).

    Pure plan-side: posexplode over a ``sequence`` of timestamps derived
    from the (hash-derived) duration — the shape a real frame extractor
    would consume, partitionable by doc.
    """
    v = with_media_meta(spans).where(F.col("kind") == "video")
    return v.select(
        "doc_id",
        "pos",
        "media_ref",
        F.posexplode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_idx", "ts_ms"),
    )
