"""Deterministic hash-based sampling and dataset splitting.

At 100 TB, `df.sample()` is unusable for anything that must be reproducible
or consistent across runs/tables: it draws from a per-task RNG whose output
depends on partition layout, so a re-run (or the same key read from another
table) lands in a different sample. The operators here key every decision on
a 60-bit hash of a stable id — the decision for a key is a pure function of
(key, seed), independent of partitioning, cluster size, or row order, and
joinable across tables (sample `documents` and its `embeddings` rows land on
the same side of every split).

Hash = top 15 hex chars of md5(seed || ':' || key) — the repo's portable
60-bit idiom (see operators/dedup.py), reproduced bit-for-bit by any ANSI
engine via ``('0x' || substr(md5(...), 1, 15))::BIGINT``, which is what makes
every operator here value-oracle-able in DuckDB. Rates are converted to
integer thresholds on the 2^60 space in the driver (exact, no float
comparison skew between engines). All pure column expressions: no UDF, no
shuffle — the filter evaluates inside the scan stage's whole-stage codegen
(it is computed from md5, so it is not a parquet-pushable predicate, but it
never forces an exchange and drops rows before any downstream shuffle).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_SPACE = 1 << 60  # 60-bit hash space; thresholds are exact integers


def sample_hash(key: Column, seed: int = 42) -> Column:
    """Portable 60-bit decision hash for ``key`` under ``seed`` (long)."""
    keyed = F.concat(F.lit(f"{seed}:"), key.cast("string"))
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


def rate_threshold(rate: float) -> int:
    """Exact integer keep-threshold on the 2^60 hash space for ``rate``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * SAMPLE_SPACE)


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 42
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, keyed on ``key_col``.

    Same (key, seed) → same decision on any cluster, any partitioning, any
    engine — the property `df.sample()` cannot give at scale.
    """
    return df.where(sample_hash(F.col(key_col), seed) < F.lit(rate_threshold(rate)))


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[Tuple[str, float]],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label (e.g. train/val/test) per key.

    ``weights``: ordered (name, fraction) pairs summing to ≤ 1.0; any
    remainder falls into the LAST named split (so [(train,.8),(val,.1),
    (test,.1)] is exact). Splits are disjoint and exhaustive by
    construction — one hash, cumulative integer thresholds.
    """
    total = sum(w for _, w in weights)
    if not weights or total > 1.0 + 1e-9:
        raise ValueError(f"weights must be non-empty and sum to <= 1: {weights}")
    h = sample_hash(F.col(key_col), seed)
    cum = 0.0
    expr: Optional[Column] = None
    for name, w in weights[:-1]:
        cum += w
        cond = h < F.lit(rate_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(weights[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language mixing rates).

    ``rates`` maps stratum value → keep fraction; strata not listed keep
    ``default_rate``. The per-row threshold comes from a literal map lookup
    (tiny, driver-built), so the whole operator stays one scan-stage
    filter — the standard way to re-weight a 100 TB corpus by language or
    source without a shuffle.
    """
    entries = []
    for k, r in rates.items():
        entries.extend([F.lit(k), F.lit(rate_threshold(r))])
    thr = F.coalesce(
        F.element_at(F.create_map(*entries), F.col(strata_col).cast("string"))
        if entries
        else F.lit(None).cast("long"),
        F.lit(rate_threshold(default_rate)),
    )
    return df.where(sample_hash(F.col(key_col), seed) < thr)
