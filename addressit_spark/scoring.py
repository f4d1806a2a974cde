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

from typing import Iterator, List, Optional

import numpy as np
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


def _pack_codes(strs: List[str]) -> tuple:
    """Pack a batch of strings into a (N, Lmax) uint32 codepoint matrix.

    One C-level ``encode('utf-32-le')`` for the whole batch; 0 is padding
    (real NULs never occur in address text). Returns (codes, lengths).
    """
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    width = max(int(lens.max()) if n else 0, 1)
    buf = "".join(s.ljust(width, "\0") for s in strs)
    codes = np.frombuffer(buf.encode("utf-32-le"), dtype=np.uint32).reshape(n, width)
    return codes, lens


def jaro_winkler_batch(sa: List[str], sb: List[str]) -> np.ndarray:
    """Vectorized Jaro-Winkler over a batch of string pairs.

    Bit-identical to :func:`jaro_winkler` (same IEEE op order) but the
    O(L²) greedy-matching loops run as numpy ops across the whole batch
    instead of Python char loops per pair — this is the hot kernel behind
    candidate-pairs-scored/sec. L is the max string length in the batch
    (address tokens: ~8-30 chars), so cost is O(L² · N) elementwise ops.
    """
    n = len(sa)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    # chunk so the (N, L) flag/code matrices stay cache-resident; each chunk
    # also gets its own (usually narrower) pad width
    chunk = 16384
    if n > chunk:
        for s in range(0, n, chunk):
            out[s : s + chunk] = jaro_winkler_batch(sa[s : s + chunk], sb[s : s + chunk])
        return out
    a_codes, len1 = _pack_codes(sa)
    b_codes, len2 = _pack_codes(sb)
    l1w, l2w = a_codes.shape[1], b_codes.shape[1]
    lc = min(l1w, l2w)

    equal = (len1 == len2) & (a_codes[:, :lc] == b_codes[:, :lc]).all(axis=1)
    if l1w > lc:
        equal &= (a_codes[:, lc:] == 0).all(axis=1)
    if l2w > lc:
        equal &= (b_codes[:, lc:] == 0).all(axis=1)
    run = (len1 > 0) & (len2 > 0) & ~equal
    if run.any():
        mw = np.maximum(np.maximum(len1, len2) // 2 - 1, 0)
        flags1 = np.zeros((n, l1w), dtype=bool)
        flags2 = np.zeros((n, l2w), dtype=bool)
        for i in range(l1w):
            active = run & (i < len1)
            if not active.any():
                break
            c1 = a_codes[:, i]
            lo = np.maximum(0, i - mw)
            hi = np.minimum(len2, i + mw + 1)
            found = np.zeros(n, dtype=bool)
            for j in range(l2w):
                ok = (
                    active
                    & ~found
                    & (j >= lo)
                    & (j < hi)
                    & ~flags2[:, j]
                    & (b_codes[:, j] == c1)
                )
                if ok.any():
                    flags2[ok, j] = True
                    flags1[ok, i] = True
                    found |= ok
        matches = flags1.sum(axis=1)
        # k-th matched char of each side, in string order (scatter by rank)
        m1 = np.zeros((n, l1w), dtype=np.uint32)
        r, c = np.nonzero(flags1)
        m1[r, (np.cumsum(flags1, axis=1) - 1)[r, c]] = a_codes[r, c]
        m2 = np.zeros((n, l2w), dtype=np.uint32)
        r, c = np.nonzero(flags2)
        m2[r, (np.cumsum(flags2, axis=1) - 1)[r, c]] = b_codes[r, c]
        # matches ≤ min(len1,len2) ≤ lc, and both m-matrices are 0 past the
        # match count, so comparing the first lc columns is exhaustive
        trans = (m1[:, :lc] != m2[:, :lc]).sum(axis=1) // 2
        msafe = np.maximum(matches, 1)
        jaro = (matches / len1 + matches / len2 + (matches - trans) / msafe) / 3.0
        jaro = np.where(matches > 0, jaro, 0.0)
        prefix = np.zeros(n, dtype=np.int64)
        live = np.ones(n, dtype=bool)
        for i in range(min(4, lc)):
            step = live & (i < len1) & (i < len2) & (a_codes[:, i] == b_codes[:, i])
            prefix += step
            live = step
        boosted = jaro + prefix * 0.1 * (1.0 - jaro)
        out[run] = np.where(jaro > 0.7, boosted, jaro)[run]
    out[equal & (len1 > 0)] = 1.0
    return out


def _jw_memo(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Jaro-Winkler over two string Series with symmetric unique-pair dedup.

    Within a candidate-pair batch the same (street_a, street_b) /
    (locality_a, locality_b) string pair recurs across many rows (blocks
    share street names by construction), and JW is symmetric — so compute
    each unordered unique pair once and gather. factorize is O(N) hashing;
    the kernel then runs on U ≪ N rows.
    """
    a = a.fillna("")
    b = b.fillna("")
    swap = a > b
    lo = a.where(~swap, b)
    hi = b.where(~swap, a)
    codes, uniques = pd.factorize(lo + "\x01" + hi, sort=False)
    ua: List[str] = []
    ub: List[str] = []
    for u in uniques:
        x, _, y = u.partition("\x01")
        ua.append(x)
        ub.append(y)
    return jaro_winkler_batch(ua, ub)[codes]


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
            jw_street = _jw_memo(pdf["street_norm_a"], pdf["street_norm_b"])
            jw_loc = _jw_memo(pdf["locality_a"], pdf["locality_b"])
            num_eq = (
                pdf["number_a"].fillna("") == pdf["number_b"].fillna("")
            ).to_numpy()
            a_null = pdf["unit_a"].isna().to_numpy()
            b_null = pdf["unit_b"].isna().to_numpy()
            unit_eq = (pdf["unit_a"].fillna("") == pdf["unit_b"].fillna("")).to_numpy()
            unit_sim = np.where(
                a_null & b_null,
                1.0,
                np.where(a_null | b_null, 0.5, np.where(unit_eq, 1.0, 0.0)),
            )
            # same accumulation order as score_pair_py → bit-identical floats
            scores = W_STREET * jw_street
            scores = scores + W_LOCALITY * jw_loc
            scores = scores + np.where(num_eq, W_NUMBER, 0.0)
            scores = scores + W_UNIT * unit_sim
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
