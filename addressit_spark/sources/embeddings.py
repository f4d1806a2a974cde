"""Synthetic clustered embeddings: a deterministic Gaussian mixture.

The driver testdata's ``embeddings`` table is near-uniform on the sphere —
adversarial for ANN (no structure to exploit; see the LSH floor comment in
``__spark_entry__``). Real text/image embeddings are CLUSTERED: vectors
concentrate around semantic modes, which is exactly the structure IVF lists
and LSH buckets exploit. This module synthesizes that shape deterministically
(BLAKE2-seeded Box-Muller — no RNG state, partition-independent) so ANN
recall/scan-fraction floors can be asserted on realistic geometry.

Columns mirror the testdata table: (vec_id: long, embedding: array<float>,
label: int) with ``label`` = the generating mixture component.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

CLUSTERED_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _gauss(key: str, dim: int) -> np.ndarray:
    """``dim`` standard normals from a BLAKE2 stream keyed by ``key``.

    Same uniform→Box-Muller construction as the LSH hyperplanes: fully
    deterministic, no RNG object, so generation is identical at any
    partitioning / cluster size.
    """
    need = dim * 8
    raw = b""
    i = 0
    while len(raw) < need:
        raw += hashlib.blake2b(
            b"gmm|%d|" % i + key.encode(), digest_size=64
        ).digest()
        i += 1
    u = np.frombuffer(raw[:need], dtype=np.uint64).astype(np.float64) / 2.0**64
    u1 = np.clip(u, 1e-12, 1 - 1e-12)
    u2 = np.roll(u1, 1)
    return np.sqrt(-2 * np.log(u1)) * np.cos(2 * math.pi * u2)


def synth_clustered_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 32,
    n_clusters: int = 25,
    sigma: float = 0.05,
    seed: int = 7,
    partitions: int = 0,
) -> DataFrame:
    """Unit vectors drawn around ``n_clusters`` random unit centers.

    ``vec_id i`` belongs to component ``i % n_clusters`` (every prefix of
    size ≥ n_clusters covers all components — handy for query sets) and is
    ``normalize(center + sigma * noise)``, noise keyed per vec_id. Expected
    same-cluster cosine ≈ 1/(1+sigma²·dim); cross-cluster ≈ 0 at this dim.
    Generation is embarrassingly parallel over ``spark.range`` —
    at 10^12 rows this plan still holds (no driver-side data, no shuffle).
    """
    if partitions <= 0:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    centers = []
    for c in range(n_clusters):
        g = _gauss("center|%d|%d" % (seed, c), dim)
        centers.append(g / np.linalg.norm(g))

    ids = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs, labels = [], []
            for vid in pdf["id"]:
                vid = int(vid)
                lab = vid % n_clusters
                v = centers[lab] + sigma * _gauss(
                    "noise|%d|%d" % (seed, vid), dim
                )
                v /= np.linalg.norm(v)
                vecs.append(v.astype(np.float32).tolist())
                labels.append(lab)
            yield pd.DataFrame(
                {"vec_id": pdf["id"], "embedding": vecs, "label": labels}
            )

    return ids.mapInPandas(gen, schema=CLUSTERED_SCHEMA)
