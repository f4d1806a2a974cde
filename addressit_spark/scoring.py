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

from typing import Iterator, List, Optional, Union

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


def levenshtein(s1: str, s2: str) -> int:
    """Classic unit-cost edit distance — same semantics as Spark's
    ``F.levenshtein`` and DuckDB's ``levenshtein`` (both used as oracles in
    tests), so the JVM and Python scoring paths agree exactly.
    """
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def surface_sim(s1: str, s2: str) -> float:
    """Hybrid string similarity: ``max(JW, 1 − lev/maxlen)``.

    Jaro-Winkler rewards shared prefixes (street/locality names); normalized
    Levenshtein catches the long-shared-suffix shapes JW under-scores. The
    ``max`` blend can only raise same-entity variant scores (recall-safe);
    within a block the street-name part of both surfaces is equal by
    construction, so it cannot manufacture cross-entity similarity the JW
    term didn't already see. Both-empty pairs score 0.0 (the JW convention).
    """
    jw = jaro_winkler(s1, s2)
    m = max(len(s1), len(s2))
    if m == 0:
        return jw
    return max(jw, 1.0 - levenshtein(s1, s2) / m)


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
        # len guards avoid a 0/0 RuntimeWarning; matches==0 whenever a len
        # is 0, so the np.where below already owns those rows' values
        l1safe = np.maximum(len1, 1)
        l2safe = np.maximum(len2, 1)
        jaro = (matches / l1safe + matches / l2safe + (matches - trans) / msafe) / 3.0
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


def _paired_codes(
    lo_codes: np.ndarray, hi_codes: np.ndarray, n_hi: int
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Unique (lo, hi) code tuples + per-row gather index.

    Pairing dictionary codes arithmetically (``lo * n_hi + hi``) instead of
    joining the strings with a separator byte means a surface containing ANY
    byte sequence can never alias into the wrong pair — the round-2 advisor
    found the old ``\\x01``-join could mis-split a surface containing \\x01.
    """
    n_hi = max(n_hi, 1)
    pair = lo_codes.astype(np.int64) * n_hi + hi_codes.astype(np.int64)
    uniq, gather = np.unique(pair, return_inverse=True)
    return uniq // n_hi, uniq % n_hi, gather


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
    lo_codes, lo_uniques = pd.factorize(lo, sort=False)
    hi_codes, hi_uniques = pd.factorize(hi, sort=False)
    ulo, uhi, gather = _paired_codes(lo_codes, hi_codes, len(hi_uniques))
    ua = [lo_uniques[i] for i in ulo]
    ub = [hi_uniques[i] for i in uhi]
    return jaro_winkler_batch(ua, ub)[gather]


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
    s = W_STREET * surface_sim(street_a or "", street_b or "")
    s += W_LOCALITY * surface_sim(locality_a or "", locality_b or "")
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


def _arrow_unique_pairs(col_a, col_b) -> "tuple[List[str], List[str], np.ndarray]":
    """Unique string pairs of two arrow columns + per-row gather index.

    Each column is dictionary-encoded *inside Arrow* separately and the code
    TUPLES are paired arithmetically — only the UNIQUE strings are ever
    materialized as Python objects, and no separator byte exists for a
    surface to alias through. Within a block all pairs share a handful of
    street/locality surfaces, so uniques ≪ rows.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def enc(col):
        e = pc.dictionary_encode(pc.fill_null(col, ""))
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        return (
            e.dictionary.to_pylist(),
            e.indices.to_numpy(zero_copy_only=False),
        )

    da, ia = enc(col_a)
    db, ib = enc(col_b)
    ua_idx, ub_idx, gather = _paired_codes(ia, ib, len(db))
    ua = [da[i] for i in ua_idx]
    ub = [db[i] for i in ub_idx]
    return ua, ub, gather


def _jw_dict_memo(col_a, col_b) -> np.ndarray:
    """Jaro-Winkler over two pyarrow string arrays via dictionary memoization."""
    ua, ub, gather = _arrow_unique_pairs(col_a, col_b)
    return jaro_winkler_batch(ua, ub)[gather]


def _sim_dict_memo(col_a, col_b) -> np.ndarray:
    """Hybrid ``surface_sim`` over two pyarrow string arrays, memoized.

    Same dictionary-encoding trick as :func:`_jw_dict_memo`; the Levenshtein
    term runs scalar over the UNIQUE pairs only (uniques ≪ rows within a
    block), keeping the arrow path bit-identical to the JVM
    ``F.levenshtein``-based factored path.
    """
    ua, ub, gather = _arrow_unique_pairs(col_a, col_b)
    jw = jaro_winkler_batch(ua, ub)
    sims = np.empty(len(ua), dtype=np.float64)
    for i, (x, y) in enumerate(zip(ua, ub)):
        m = max(len(x), len(y))
        # same op order as surface_sim / the JVM column expression
        sims[i] = max(jw[i], 1.0 - levenshtein(x, y) / m) if m else jw[i]
    return sims[gather]


def jw_pairs_table(pairs_of_strings: DataFrame) -> DataFrame:
    """(a, b) string pairs → (a, b, jw) via the vectorized kernel.

    Runs as ``mapInArrow`` over what should be a *small* distinct-pair set;
    the dictionary memo inside makes repeated surfaces free.
    """

    def kernel(batches):
        import pyarrow as pa

        for batch in batches:
            if not batch.num_rows:
                continue
            jw = _jw_dict_memo(batch.column("a"), batch.column("b"))
            yield pa.RecordBatch.from_arrays(
                [batch.column("a"), batch.column("b"), pa.array(jw, type=pa.float64())],
                names=["a", "b", "jw"],
            )

    # AQE coalesces the (small) distinct-pair shuffle to one partition,
    # which would serialize the JW kernel — spread it across the cores.
    spread = pairs_of_strings.repartition(
        pairs_of_strings.sparkSession.sparkContext.defaultParallelism
    )
    return spread.mapInArrow(kernel, schema="a string, b string, jw double")


def _num_eq_col() -> "F.Column":
    # (number_a or "") == (number_b or "") — Python `or` folds None and ''
    return F.coalesce(F.col("number_a"), F.lit("")) == F.coalesce(
        F.col("number_b"), F.lit("")
    )


def _unit_sim_col() -> "F.Column":
    return (
        F.when(F.col("unit_a").isNull() & F.col("unit_b").isNull(), F.lit(1.0))
        .when(F.col("unit_a").isNull() | F.col("unit_b").isNull(), F.lit(0.5))
        .when(F.col("unit_a") == F.col("unit_b"), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )


def score_pairs(pairs: DataFrame, dims_from: Optional[DataFrame] = None) -> DataFrame:
    """Score the candidate-pair table → (uid_a, uid_b, block_key, score).

    **Surface-factored plan** (the 10^12-pair design): the expensive terms
    — Jaro-Winkler on street and locality — depend only on the string pair,
    and blocks repeat a handful of surfaces, so JW is computed once per
    DISTINCT surface pair in a tiny Python job and broadcast-joined back;
    number/unit similarity and the weighted sum are pure JVM expressions.
    The bulk pair table never crosses into Python at all — measured
    memory-bandwidth-bound at ~19M pairs when it did (flat scaling beyond 8
    cores), vs a codegen'd broadcast hash join that scales linearly.

    ``dims_from``: the addresses table (block_key, street_norm, locality);
    when given, surface pairs are derived from per-block surface crosses on
    that (already materialized) table instead of re-deriving the pair join.
    Float semantics are bit-identical to ``score_pair_py`` (same kernel JW
    doubles, same IEEE accumulation order).
    """
    # NULL surfaces must score like '' (matching score_pairs_arrow / the
    # scalar kernel), but NULL equi-join keys never match — coalesce both
    # the pair table's key columns and the surface dims before joining.
    pairs = pairs.withColumns(
        {
            c: F.coalesce(F.col(c), F.lit(""))
            for c in ("street_norm_a", "street_norm_b", "locality_a", "locality_b")
        }
    )
    if dims_from is not None:
        dims_from = dims_from.withColumns(
            {
                c: F.coalesce(F.col(c), F.lit(""))
                for c in ("street_norm", "locality")
            }
        )
        s = dims_from.select("block_key", "street_norm").distinct()
        sd = (
            s.select("block_key", F.col("street_norm").alias("a"))
            .join(s.select("block_key", F.col("street_norm").alias("b")), "block_key")
            .select("a", "b")
            .distinct()
        )
        l = dims_from.select("block_key", "locality").distinct()
        ld = (
            l.select("block_key", F.col("locality").alias("a"))
            .join(l.select("block_key", F.col("locality").alias("b")), "block_key")
            .select("a", "b")
            .distinct()
        )
    else:
        sd = pairs.select(
            F.col("street_norm_a").alias("a"), F.col("street_norm_b").alias("b")
        ).distinct()
        ld = pairs.select(
            F.col("locality_a").alias("a"), F.col("locality_b").alias("b")
        ).distinct()

    def hybrid(jw_tbl: DataFrame) -> DataFrame:
        # surface_sim = max(JW, 1 − lev/maxlen): the Levenshtein term is the
        # built-in F.levenshtein, evaluated JVM-side on the (tiny) distinct
        # surface-pair table — never on the bulk pair rows.
        m = F.greatest(F.length("a"), F.length("b"))
        lev_sim = F.lit(1.0) - F.levenshtein("a", "b") / m
        return jw_tbl.withColumn(
            "sim",
            F.when(m > 0, F.greatest(F.col("jw"), lev_sim)).otherwise(F.col("jw")),
        )

    sj = hybrid(jw_pairs_table(sd)).select(
        F.col("a").alias("street_norm_a"),
        F.col("b").alias("street_norm_b"),
        F.col("sim").alias("_jw_street"),
    )
    lj = hybrid(jw_pairs_table(ld)).select(
        F.col("a").alias("locality_a"),
        F.col("b").alias("locality_b"),
        F.col("sim").alias("_jw_loc"),
    )
    p = pairs.join(F.broadcast(sj), ["street_norm_a", "street_norm_b"]).join(
        F.broadcast(lj), ["locality_a", "locality_b"]
    )
    score = (
        F.lit(W_STREET) * F.col("_jw_street")
        + F.lit(W_LOCALITY) * F.col("_jw_loc")
        + F.when(_num_eq_col(), F.lit(W_NUMBER)).otherwise(F.lit(0.0))
        + F.lit(W_UNIT) * _unit_sim_col()
    )
    return p.select("uid_a", "uid_b", "block_key", score.alias("score"))


def surface_sim_map(
    addresses: DataFrame,
    max_block_size: Optional[int] = None,
    max_block_surfaces: Optional[int] = None,
    surface_salt_threshold: int = 256,
    salt_cap: int = 64,
) -> DataFrame:
    """Combined surface-similarity dim: ``(pair_key, sim)``.

    One row per distinct unordered per-block surface pair (street AND
    locality surfaces in one table — sim depends only on the strings, so
    the union dedups safely), keyed by ``xxhash64(min_id, max_id)`` of the
    two ``xxhash64`` surface ids. Diagonal (equal-surface) rows are dropped
    unless sim ≠ 1.0 (the empty-string surface), so probing consumers can
    resolve equal surfaces with a guaranteed-miss → ``coalesce(sim, 1.0)``.

    ``max_block_size``: blocks with more rows are anti-joined out *before*
    the per-block surface cross. Candidate generation drops those blocks
    anyway (``salted_pair_join``'s cap), so their sim rows are never
    consumed — without the cap one dirty mega-block would still pay
    O(distinct_surfaces²) inside this "tiny" dim stage. A surface pair that
    also co-occurs in a surviving block is still emitted from that block, so
    surviving pairs lose nothing.

    ``max_block_surfaces``: additionally skips the cross for any block whose
    DISTINCT surface count (per street/locality tag) exceeds the cap — the
    skew guard for a block that is under the row cap but degenerate in
    surface variety. Pairs whose sim rows are skipped read the scorer's
    conservative miss default (0.0 for distinct surfaces), so this can only
    lower scores, never merge clusters. ``None`` (both defaults) keeps the
    exact full map.

    ``surface_salt_threshold``/``salt_cap``: the per-block surface cross is
    *triangle-salted* exactly like the candidate pair join — a block×tag with
    ``S`` distinct surfaces spreads its S²/2 similarity pairs over
    ``~(S/threshold)²/2`` reducer cells (capped) instead of landing them all
    behind one ``(block, tag)`` join key. Exactness-preserving: the salted
    pair set provably equals the plain per-block cross (tested), so this
    guard is always on, unlike the opt-in volume caps above.

    This is the pipeline's materializable dim stage: at 10^12 pairs it is
    built once (tiny — bounded by co-occurring distinct surfaces), snapshot
    to the checkpoint store, and broadcast into the scoring pass.
    """
    if max_block_size is not None:
        sizes = addresses.groupBy("block_key").agg(
            F.count(F.lit(1)).alias("_bsize")
        )
        addresses = addresses.join(
            sizes.where(F.col("_bsize") > max_block_size).select("block_key"),
            "block_key",
            "left_anti",
        )
    addresses = addresses.withColumns(
        {c: F.coalesce(F.col(c), F.lit("")) for c in ("street_norm", "locality")}
    )
    # One stacked distinct — (block_key, tag, surface) — feeds both dims'
    # per-block surface tables: the branches share the distinct's shuffle
    # exchange (Catalyst ReusedExchange), so the only full-table data
    # movement in the sim build happens once instead of once per dim.
    stacked = (
        addresses.select(
            "block_key",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("s").alias("t"), F.col("street_norm").alias("v")
                    ),
                    F.struct(F.lit("l").alias("t"), F.col("locality").alias("v")),
                )
            ).alias("x"),
        )
        .select("block_key", F.col("x.t").alias("t"), F.col("x.v").alias("v"))
        .distinct()
    )
    # per-(block, tag) distinct-surface counts drive BOTH the degenerate-
    # block cap and the salt bucket count, so they're computed once
    scounts = stacked.groupBy("block_key", "t").agg(
        F.count(F.lit(1)).alias("_ns")
    )
    if max_block_surfaces is not None:
        scounts = scounts.where(F.col("_ns") <= max_block_surfaces)
    # inner join doubles as the cap filter (scounts rows above the cap are
    # gone, so their block×tag surfaces drop out here)
    salted = (
        stacked.join(scounts, ["block_key", "t"])
        .withColumn(
            "_nb",
            F.least(
                F.ceil(F.col("_ns") / F.lit(surface_salt_threshold)),
                F.lit(salt_cap),
            ).cast("int"),
        )
        .withColumn("_sb", F.pmod(F.xxhash64("v"), F.col("_nb")).cast("int"))
        # tag folded into the 8-byte join key: street and locality crosses
        # ride ONE self-join instead of two unioned ones
        .withColumn("_bk", F.xxhash64("block_key", "t"))
    )
    left = salted.select(
        "_bk",
        F.col("_sb").alias("lo"),
        F.explode(F.sequence(F.col("_sb"), F.col("_nb") - 1)).alias("hi"),
        F.col("v").alias("_va"),
    )
    right = salted.select(
        "_bk",
        F.explode(F.sequence(F.lit(0), F.col("_sb"))).alias("lo"),
        F.col("_sb").alias("hi"),
        F.col("v").alias("_vb"),
    )
    # merge-pinned for the same reason as salted_pair_join: a bad size
    # estimate must never broadcast the replicated side. Cross-bucket pairs
    # meet exactly once (bucket orientation — least/greatest canonicalizes);
    # same-bucket pairs meet twice and keep the string-ordered one, which
    # also keeps the diagonal (a == b) exactly once.
    crossed = (
        left.hint("merge")
        .join(right.hint("merge"), ["_bk", "lo", "hi"])
        .where((F.col("lo") != F.col("hi")) | (F.col("_va") <= F.col("_vb")))
        .select(
            F.least("_va", "_vb").alias("a"),
            F.greatest("_va", "_vb").alias("b"),
        )
        .distinct()
    )
    m = F.greatest(F.length("a"), F.length("b"))
    lev_sim = F.lit(1.0) - F.levenshtein("a", "b") / m
    sim = (
        F.when(m > 0, F.greatest(F.col("jw"), lev_sim))
        .otherwise(F.col("jw"))
    )
    ha, hb = F.xxhash64("a"), F.xxhash64("b")
    return (
        jw_pairs_table(crossed)
        .withColumn("sim", sim)
        .where((F.col("a") != F.col("b")) | (F.col("sim") < 1.0))
        .select(
            F.xxhash64(F.least(ha, hb), F.greatest(ha, hb)).alias("pair_key"),
            "sim",
        )
    )


def score_pairs_fused(
    addresses: DataFrame,
    heavy_threshold: int = 256,
    salt_cap: int = 64,
    max_block_size: int = 100_000,
    sims: Optional[DataFrame] = None,
    max_block_surfaces: "Union[int, None, str]" = "auto",
) -> "tuple[DataFrame, DataFrame]":
    """Blocking + scoring fused, with interned surface ids — the hot path.

    Semantically identical to ``score_pairs(candidate_pairs(addresses)[0],
    dims_from=addresses)`` (bit-identical scores, same pair set — asserted in
    tests), but the 10^12-row salted shuffle carries
    ``(block hash, salt, uid, street_id, locality_id, number_hash,
    unit_hash)`` — every feature an 8-byte ``xxhash64`` instead of a string,
    an 8-byte block hash as the join key, the block-key string carried once
    (left side only) for the output, and the uid strings referenced ONLY by
    output projections (the join's dedup filter compares hashed orders), so
    a consumer that doesn't project them sheds them from the shuffle
    altogether. The Jaro-Winkler/Levenshtein surface-similarity tables are
    computed once per DISTINCT surface pair (strings, tiny; diagonal
    dropped — equal surfaces short-circuit to 1.0 via a left-join miss) and
    broadcast keyed by a single canonical 8-byte pair hash. Cuts the
    expanding join's bytes/row by ~3×, which is the difference between
    memory-bandwidth-bound and CPU-bound on wide executors.

    Surface-id collisions: a 64-bit collision between two distinct surfaces
    *within one block* would make a pair read the wrong similarity row. With
    ~10⁸ distinct surfaces the probability of even one global collision is
    ~3·10⁻⁴, and a collision affects similarity values only (never pair
    identity — uids stay strings), so the expected error mass at any
    realistic scale is zero-ish and bounded.

    ``sims``: a precomputed :func:`surface_sim_map` table (e.g. read back
    from a checkpoint snapshot, or pre-materialized so many scoring passes
    share one build); ``None`` builds it inline in the same plan.

    ``max_block_surfaces``: forwarded to the inline :func:`surface_sim_map`
    build. The default ``"auto"`` resolves to ``heavy_threshold`` — a block
    that is under the row cap but has a degenerate number of DISTINCT
    surfaces (~rows² similarity pairs in the "tiny" dim stage, and a
    broadcast sim table that is no longer tiny) skips its surface cross, and
    its distinct-surface pairs read the conservative miss default (0.0) —
    scores can only go DOWN, never merge clusters. ``None`` disables the cap
    (exact full map); ignored when ``sims`` is precomputed.

    Returns ``(scored, dropped_blocks)``.
    """
    from addressit_spark.blocking import salted_pair_join

    if sims is None:
        if max_block_surfaces == "auto":
            max_block_surfaces = heavy_threshold
        # the same block-size cap candidate generation applies below: sim
        # rows for dropped blocks would never be consumed
        sims = surface_sim_map(
            addresses,
            max_block_size=max_block_size,
            max_block_surfaces=max_block_surfaces,
        )
    sj = sims.select(
        F.col("pair_key").alias("_skey"), F.col("sim").alias("_jw_street")
    )
    lj = sims.select(
        F.col("pair_key").alias("_lkey"), F.col("sim").alias("_jw_loc")
    )

    addresses = addresses.withColumns(
        {
            c: F.coalesce(F.col(c), F.lit(""))
            for c in ("street_norm", "locality")
        }
    )

    # number: NULL ≡ '' for equality, so one hash; unit: NULL is a distinct
    # 3-state case, so a null-preserving hash. 8-byte ints instead of short
    # strings keeps the expanding join's emitted row fixed-width.
    slim = addresses.select(
        "block_key",
        "uid",
        F.xxhash64("street_norm").alias("sid"),
        F.xxhash64("locality").alias("lid"),
        F.xxhash64(F.coalesce("number", F.lit(""))).alias("numh"),
        F.when(F.col("unit").isNotNull(), F.xxhash64("unit")).alias("unith"),
    )
    pairs, dropped = salted_pair_join(
        slim,
        ("sid", "lid", "numh", "unith"),
        heavy_threshold=heavy_threshold,
        salt_cap=salt_cap,
        max_block_size=max_block_size,
        hash_block_key=True,
        orient=False,  # every scoring expression below is symmetric in l/r
    )
    keyed = pairs.withColumns(
        {
            "_skey": F.xxhash64(
                F.least("sid_l", "sid_r"), F.greatest("sid_l", "sid_r")
            ),
            "_lkey": F.xxhash64(
                F.least("lid_l", "lid_r"), F.greatest("lid_l", "lid_r")
            ),
        }
    )
    p = keyed.join(F.broadcast(sj), "_skey", "left").join(
        F.broadcast(lj), "_lkey", "left"
    )
    unit_sim = (
        F.when(F.col("unith_l").isNull() & F.col("unith_r").isNull(), F.lit(1.0))
        .when(F.col("unith_l").isNull() | F.col("unith_r").isNull(), F.lit(0.5))
        .when(F.col("unith_l") == F.col("unith_r"), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )

    # Sim-map miss policy: equal interned ids mean equal surfaces — the dim
    # intentionally omits that diagonal, so a miss resolves to 1.0 (the
    # empty-string pair, whose true sim is 0.0, IS in the map and wins the
    # coalesce). For DISTINCT ids a miss means the pair's surfaces never
    # co-occurred in a surviving block (block-hash collision merging two
    # blocks, or a stale precomputed ``sims`` snapshot) — that must default
    # LOW: defaulting to 1.0 would score unrelated pairs as perfect street +
    # locality matches and let connected components merge their clusters.
    def sim_or_default(id_l: str, id_r: str, sim: "F.Column") -> "F.Column":
        return F.when(
            F.col(id_l) == F.col(id_r), F.coalesce(sim, F.lit(1.0))
        ).otherwise(F.coalesce(sim, F.lit(0.0)))

    score = (
        F.lit(W_STREET) * sim_or_default("sid_l", "sid_r", F.col("_jw_street"))
        + F.lit(W_LOCALITY) * sim_or_default("lid_l", "lid_r", F.col("_jw_loc"))
        + F.when(F.col("numh_l") == F.col("numh_r"), F.lit(W_NUMBER)).otherwise(
            F.lit(0.0)
        )
        + F.lit(W_UNIT) * unit_sim
    )
    return p.select("uid_a", "uid_b", "block_key", score.alias("score")), dropped


def score_pairs_arrow(pairs: DataFrame) -> DataFrame:
    """Direct Arrow-batched scoring (every pair row through Python).

    Kept as the fallback/verification path: ``mapInArrow`` with the
    dictionary memo — correct at any scale but moves the whole pair table
    across the JVM↔Python boundary; use :func:`score_pairs` in pipelines.
    """

    def score_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            jw_street = _sim_dict_memo(
                batch.column("street_norm_a"), batch.column("street_norm_b")
            )
            jw_loc = _sim_dict_memo(
                batch.column("locality_a"), batch.column("locality_b")
            )
            num_a = pc.fill_null(batch.column("number_a"), "")
            num_b = pc.fill_null(batch.column("number_b"), "")
            num_eq = pc.equal(num_a, num_b).to_numpy(zero_copy_only=False)
            unit_a = batch.column("unit_a")
            unit_b = batch.column("unit_b")
            a_null = pc.is_null(unit_a).to_numpy(zero_copy_only=False)
            b_null = pc.is_null(unit_b).to_numpy(zero_copy_only=False)
            unit_eq = pc.equal(
                pc.fill_null(unit_a, ""), pc.fill_null(unit_b, "")
            ).to_numpy(zero_copy_only=False)
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
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("uid_a"),
                    batch.column("uid_b"),
                    batch.column("block_key"),
                    pa.array(scores, type=pa.float64()),
                ],
                names=["uid_a", "uid_b", "block_key", "score"],
            )

    return pairs.mapInArrow(score_batches, schema=SCORED_SCHEMA)


def match_edges(scored: DataFrame, tau: float = DEFAULT_TAU) -> DataFrame:
    """Threshold scored pairs into the match-edge list."""
    return scored.where(F.col("score") >= tau).select(
        F.col("uid_a").alias("src"), F.col("uid_b").alias("dst")
    )
