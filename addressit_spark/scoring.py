"""Pairwise scoring: batched Jaro-Winkler/Levenshtein inside mapInPandas.

The candidate pairs arrive pre-blocked (same street name + locality soundex),
so the discriminative features are locality spelling, house number, unit and
the street-type surface. The composite score is engineered so that
reference-invariant perturbations (abbreviation swaps, dots, case, unit
forms, soundex-stable locality typos — the corpus generator's axes) stay
well above the threshold while same-block distinct entities (different house
number) fall well below it.

All scoring runs as Arrow-batched ``mapInPandas`` — the JVM↔Python transfer
is columnar; the per-pair Jaro-Winkler kernel is pure Python over short
strings (street/locality tokens), the same no-per-row-UDF discipline as the
parse stage. rapidfuzz is used when importable (it is not in this container);
the fallback implements the standard Jaro-Winkler (verified against DuckDB's
``jaro_winkler_similarity`` in tests).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

try:  # pragma: no cover - not present in this container
    from rapidfuzz.distance.JaroWinkler import similarity as _rf_jw

    def jaro_winkler(s1: str, s2: str) -> float:
        return _rf_jw(s1, s2)

except ImportError:

    def jaro_winkler(s1: str, s2: str) -> float:
        """Jaro-Winkler similarity (prefix scale 0.1, max prefix 4, boost
        threshold 0.7 — Winkler's original convention, and what DuckDB's
        ``jaro_winkler_similarity`` implements, which tests use as an oracle).
        """
        len1, len2 = len(s1), len(s2)
        if not len1 or not len2:
            return 0.0
        if s1 == s2:
            return 1.0
        match_window = max(len1, len2) // 2 - 1
        if match_window < 0:
            match_window = 0
        flags1 = [False] * len1
        flags2 = [False] * len2
        matches = 0
        for i, c1 in enumerate(s1):
            lo = max(0, i - match_window)
            hi = min(len2, i + match_window + 1)
            for j in range(lo, hi):
                if not flags2[j] and s2[j] == c1:
                    flags1[i] = True
                    flags2[j] = True
                    matches += 1
                    break
        if matches == 0:
            return 0.0
        transpositions = 0
        j = 0
        for i in range(len1):
            if flags1[i]:
                while not flags2[j]:
                    j += 1
                if s1[i] != s2[j]:
                    transpositions += 1
                j += 1
        transpositions //= 2
        jaro = (
            matches / len1 + matches / len2 + (matches - transpositions) / matches
        ) / 3.0
        if jaro <= 0.7:  # Winkler boost threshold
            return jaro
        prefix = 0
        for c1, c2 in zip(s1[:4], s2[:4]):
            if c1 == c2:
                prefix += 1
            else:
                break
        return jaro + prefix * 0.1 * (1.0 - jaro)


# Composite weights: street surface 0.30, locality 0.35, number 0.25, unit 0.10.
W_STREET, W_LOCALITY, W_NUMBER, W_UNIT = 0.30, 0.35, 0.25, 0.10
DEFAULT_TAU = 0.87


def _unit_sim(u1: Optional[str], u2: Optional[str]) -> float:
    if u1 is None and u2 is None:
        return 1.0
    if u1 is None or u2 is None:
        return 0.5
    return 1.0 if u1 == u2 else 0.0


def score_pair_py(
    street_a: str,
    street_b: str,
    locality_a: str,
    locality_b: str,
    number_a: Optional[str],
    number_b: Optional[str],
    unit_a: Optional[str],
    unit_b: Optional[str],
) -> float:
    """Single-pair composite score — the kernel shared by Spark and tests."""
    s = W_STREET * jaro_winkler(street_a or "", street_b or "")
    s += W_LOCALITY * jaro_winkler(locality_a or "", locality_b or "")
    s += W_NUMBER * (1.0 if (number_a or "") == (number_b or "") else 0.0)
    s += W_UNIT * _unit_sim(unit_a, unit_b)
    return s


SCORED_SCHEMA = StructType(
    [
        StructField("uid_a", StringType()),
        StructField("uid_b", StringType()),
        StructField("block_key", StringType()),
        StructField("score", DoubleType()),
    ]
)


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Arrow-batched scoring of the candidate-pair table → (uid_a, uid_b, score)."""

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            street_a = pdf["street_norm_a"].to_numpy()
            street_b = pdf["street_norm_b"].to_numpy()
            loc_a = pdf["locality_a"].to_numpy()
            loc_b = pdf["locality_b"].to_numpy()
            num_eq = (
                pdf["number_a"].fillna("") == pdf["number_b"].fillna("")
            ).to_numpy()
            unit_a = pdf["unit_a"].to_numpy()
            unit_b = pdf["unit_b"].to_numpy()
            scores = []
            for i in range(len(pdf)):
                s = W_STREET * jaro_winkler(street_a[i] or "", street_b[i] or "")
                s += W_LOCALITY * jaro_winkler(loc_a[i] or "", loc_b[i] or "")
                if num_eq[i]:
                    s += W_NUMBER
                s += W_UNIT * _unit_sim(
                    None if unit_a[i] is None else unit_a[i],
                    None if unit_b[i] is None else unit_b[i],
                )
                scores.append(s)
            yield pd.DataFrame(
                {
                    "uid_a": pdf["uid_a"],
                    "uid_b": pdf["uid_b"],
                    "block_key": pdf["block_key"],
                    "score": scores,
                }
            )

    return pairs.mapInPandas(score_batches, schema=SCORED_SCHEMA)


def match_edges(scored: DataFrame, tau: float = DEFAULT_TAU) -> DataFrame:
    """Threshold scored pairs into the match-edge list."""
    return scored.where(F.col("score") >= tau).select(
        F.col("uid_a").alias("src"), F.col("uid_b").alias("dst")
    )
