"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale posture per operator:

* **exact** — one hash-groupBy shuffle; the canonical first pass at 100 TB.
* **n-gram Jaccard** — exact set similarity via distinct-shingle explode +
  shingle equi-join; cost ∝ Σ (docs per shingle)²; correct but quadratic on
  stop-shingles, so it is the *verifier* for candidates, not the discovery
  path at scale.
* **MinHash+LSH** — the discovery path: k permutation min-hashes per doc
  (all JVM-side agg expressions), banded into b buckets; docs sharing a band
  bucket become candidates; estimated Jaccard = fraction of agreeing
  minhashes (zip_with, JVM). One explode-shuffle + one band-join shuffle,
  both on hashed (uniform) keys — no skew amplification.
* **SimHash** — 64-bit weighted-bit signature per doc (numpy kernel inside
  mapInPandas, Arrow-batched); near-dups = Hamming ≤ d via pigeonhole band
  join on 4×16-bit chunks.

MinHash permutations use (aᵢ·h + bᵢ) mod p with p = 2³¹−1 (Mersenne) and
aᵢ,bᵢ < p derived from a seeded BLAKE2 stream — products stay < 2⁶² so ANSI
arithmetic cannot overflow.
"""

from __future__ import annotations

import hashlib
import logging
import re
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from addressit_spark.operators.text import tokens_col
from addressit_spark.util import ensure_parallelism, reuse


def _pin(df: DataFrame, pin_smj: bool) -> DataFrame:
    """Optionally pin a join side to sort-merge.

    The table-sized self-joins below default to ``hint("merge")`` because a
    checkpointed source can carry a tiny size estimate and flip the planner
    to broadcasting a whole table side — fatal at scale. ``pin_smj=False``
    removes the pins for provably-small inputs, letting AQE pick broadcast.
    Measured at sf0.1 (see BENCH/BASELINE.md "SMJ pin cost"): the pins cost
    roughly nothing on ngram/minhash and a modest constant on simhash at
    toy scale; identical output rows either way.
    """
    return df.hint("merge") if pin_smj else df

_MERSENNE_P = (1 << 31) - 1


def _perm_params(k: int, seed: int) -> List[tuple]:
    out = []
    for i in range(k):
        raw = hashlib.blake2b(b"minhash|%d|%d" % (seed, i), digest_size=16).digest()
        a = int.from_bytes(raw[:8], "big") % (_MERSENNE_P - 1) + 1
        b = int.from_bytes(raw[8:], "big") % _MERSENNE_P
        out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact duplicates → (text_hash, n_copies, min_doc_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_copies") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each exact-duplicate group."""
    ranked = df.withColumn("_h", F.md5(F.col(text_col))).withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_h").orderBy(id_col))
    )
    return ranked.where(F.col("_rn") == 1).drop("_h", "_rn")


def choose_survivors(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "canonical_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware survivor per dup cluster → (doc_id, survivor_id, keep).

    The min-id labeling the CC kernel emits (``dedup_keep_policy``) is the
    canonical *identity*; a training pipeline usually wants to KEEP the
    best-quality member of each cluster instead (longest / highest
    quality-score document), which this selects. Deterministic under
    parallelism: argmax of ``score_col`` with ties broken toward the
    smallest ``id_col`` (any orderable type — the CC kernel's uid strings
    included). ``scores`` rows missing for a clustered doc score as NULL
    and lose to any scored sibling; an all-NULL cluster falls back to its
    min-id member (``max`` ignores NULLs, and the null-safe filter then
    admits exactly the unscored members).

    Aggregation-only dataflow — no window sort, so a 10^9-member dup
    cluster never has to sort inside one task. The executed plan (pinned
    in ``tests/test_plans.py``) is skew-friendly twice over: both argmax
    aggregations run map-side partials (one row per cluster per partition
    reaches each exchange), and Catalyst folds the ``eqNullSafe`` argmax
    filter INTO the best-score join's keys — a hot cluster's members are
    matched on (score, cluster), not fanned through a single
    cluster-keyed partition. The post-filter ``groupBy(cluster)`` then
    pays one more (tiny: argmax members only) exchange.
    """
    joined = clusters.select(id_col, cluster_col).join(
        scores.select(id_col, score_col), id_col, "left"
    )
    best_score = joined.groupBy(cluster_col).agg(
        F.max(score_col).alias("_best_s")
    )
    survivors = (
        joined.join(best_score, cluster_col)
        # null-safe: in an all-NULL cluster _best_s is NULL and this
        # admits every (unscored) member; otherwise only argmax members
        .where(F.col(score_col).eqNullSafe(F.col("_best_s")))
        .groupBy(cluster_col)
        .agg(F.min(id_col).alias("survivor_id"))
    )
    return (
        clusters.select(id_col, cluster_col)
        .join(survivors, cluster_col)
        .select(
            F.col(id_col),
            F.col("survivor_id"),
            (F.col(id_col) == F.col("survivor_id")).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Word n-gram shingles + exact Jaccard
# ---------------------------------------------------------------------------


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (empty-safe)."""
    toks = tokens_col(text)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_shingles(text, n: int):
    """Distinct word n-gram shingles — same semantics as shingles_col.

    Tokenizes on the ASCII whitespace class Java's ``\\s`` matches (not
    Python ``str.split()``'s full Unicode whitespace), so shingle sets agree
    with the ``shingles_col`` column twin / the SQL oracle even on texts
    containing NBSP or other Unicode spaces.
    """
    if text is None:
        return []
    toks = [t for t in _ASCII_WS.split(text) if t]
    if len(toks) < n:
        return []
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def shingle_table(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle, set_size) — one row per distinct shingle per doc.

    The shingle set is built in an Arrow-batched pandas UDF, not with
    ``transform``/``slice`` column expressions: Spark's higher-order
    functions evaluate *interpreted* (outside codegen). Measured on the
    sf0.1 documents table (5k docs, local[8], interleaved best-of-3):
    HOF explode path 643 µs/doc vs 160 µs/doc through the pandas UDF —
    a consistent ~4× in favour of the Python kernel, which at 100 TB is
    the difference between a day and half a week. The UDF output is a
    materialized attribute, so the size/explode projections above it
    cannot re-evaluate the generator expression.
    """
    narrow = ensure_parallelism(df.select(id_col, text_col))

    @pandas_udf(ArrayType(StringType()))
    def sh_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield texts.map(lambda t: _py_shingles(t, n))

    w = narrow.select(
        F.col(id_col).alias("doc_id"), sh_udf(F.col(text_col)).alias("sh")
    )
    return w.select(
        "doc_id", F.size("sh").alias("set_size"), F.explode("sh").alias("shingle")
    )


def _log_dropped_shingles(obs: "Observation", max_shingle_df: int) -> None:
    """Log the observed dropped-shingle count once the plan first executes.

    ``Observation.get`` blocks until the first action touches the observed
    subtree, so the wait lives on a daemon thread: construction stays
    job-free, the metric costs nothing extra (CollectMetrics rides the
    anti-join's own pass), and a plan that is built but never executed
    simply never logs.
    """
    import threading

    def _wait_and_log() -> None:
        try:
            n = obs.get["n_dropped_shingles"]
        except Exception:  # session torn down before any action — nothing to log
            return
        logging.getLogger(__name__).warning(
            "ngram_jaccard_pairs: dropped %d distinct shingles with df > %d "
            "before the similarity self-join", n, max_shingle_df,
        )

    threading.Thread(target=_wait_and_log, daemon=True).start()


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: Optional[int] = None,
    pin_smj: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs with J ≥ min_jaccard.

    |A∩B| from the shingle equi-join, |A∪B| = |A|+|B|−|A∩B|. Canonical
    (a < b) pair order.

    ``max_shingle_df`` bounds the quadratic blowup on stop-shingles: the
    self-join cost is Σ df(shingle)², so one shingle appearing in 10⁶ docs
    alone yields 10¹² candidate rows. When set, shingles with document
    frequency > ``max_shingle_df`` are removed from the shingle space
    *before* the join — from both the intersection AND the set sizes, i.e.
    the result is the exact Jaccard over the filtered shingle vocabulary
    (stop-word-removal semantics, not a silently biased |A∩B|). The number
    of distinct dropped shingles is logged (no silent caps) via a
    ``DataFrame.observe`` metric on the hot-shingle subtree — collected for
    free by the first action on the result, never by a dedicated job.
    Construction is fully LAZY: the shared-subtree checkpoints are
    ``eager=False``, so building this DataFrame launches no Spark jobs
    (asserted in tests). ``None`` (the default) keeps the fully exact
    semantics for oracle comparison.
    """
    # materialize once (lazily) — both self-join branches read the same
    # blocks once the first action runs; construction stays job-free.
    s = reuse(shingle_table(df, n, text_col, id_col), eager=False)
    if max_shingle_df is not None:
        from pyspark.sql import Observation

        dfreq = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        obs = Observation()
        # the hot list is consumed exactly once (the anti-join build side),
        # so no checkpoint; the CollectMetrics node rides the same pass and
        # counts the distinct dropped shingles as a side effect.
        hot = (
            dfreq.where(F.col("_df") > max_shingle_df)
            .select("shingle")
            .observe(obs, F.count(F.lit(1)).alias("n_dropped_shingles"))
        )
        _log_dropped_shingles(obs, max_shingle_df)
        kept = s.join(hot, "shingle", "left_anti")
        # set sizes must reflect the filtered vocabulary
        sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
        s = kept.select("doc_id", "shingle").join(sizes, "doc_id")
    a = s.select(
        F.col("doc_id").alias("id_a"), F.col("set_size").alias("size_a"), "shingle"
    )
    b = s.select(
        F.col("doc_id").alias("id_b"), F.col("set_size").alias("size_b"), "shingle"
    )
    # both sides are the (huge at scale) shingle table — pin the scale-safe
    # strategy by default; see _pin for the escape hatch
    inter = (
        _pin(a, pin_smj).join(_pin(b, pin_smj), "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
            6,
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= min_jaccard)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    k: int = 64,
    n: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, sig: array<long>[k]) minhash signatures, all JVM-side.

    Shingle → xxhash64 → k affine permutations mod 2³¹−1 → per-doc min of
    each permutation (k partial-aggregating min() exprs — map-side combine).

    ``portable=True`` swaps the shingle hash for the top-60-bits of md5
    (``conv(substr(md5, 1, 15), 16, 10)``), which any ANSI engine can
    reproduce — it is how the oracle-backed ``minhash_dups_md5`` query gets
    bit-identical signatures out of DuckDB. xxhash64 stays the default:
    one codegen'd instruction stream vs md5's full digest per shingle.
    """
    params = _perm_params(k, seed)
    s = shingle_table(df, n, text_col, id_col)
    if portable:
        raw = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    else:
        raw = F.xxhash64("shingle")
    h = F.pmod(raw, F.lit(_MERSENNE_P)).alias("h")
    hashed = s.select("doc_id", h)
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P))).alias(
                "m%d" % i
            )
            for i, (a, b) in enumerate(params)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col("m%d" % i) for i in range(k)]).alias("sig")
    )


def minhash_dup_pairs(
    df: DataFrame,
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    min_est_jaccard: float = 0.5,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    pin_smj: bool = True,
    portable: bool = False,
) -> DataFrame:
    """LSH-banded near-dup pairs with estimated Jaccard ≥ threshold.

    b bands × r = k/b rows; P(candidate) = 1−(1−J^r)^b. The band-bucket join
    carries ONLY (doc_id, band, bucket) — the k-long signatures stay behind
    in the signature table (the band ride would otherwise shuffle two ~0.5 KB
    arrays per candidate row, ×bands per doc). Candidate ids are deduped
    across bands, then both signatures are joined back from the (materialized)
    signature table for full-signature verification (zip_with sum).

    ``portable=True`` makes the whole pipeline ANSI-reproducible (the
    oracle-verified twin): md5-derived shingle hashes, and the band bucket
    is the raw ``","``-joined value string instead of its xxhash64 — no
    engine-specific hash anywhere, at the cost of ~4× wider bucket keys in
    the band shuffle. Production keeps the 8-byte hashed bucket.
    """
    assert k % bands == 0
    r = k // bands
    sigs = reuse(minhash_signatures(df, k, n, seed, text_col, id_col, portable))

    def _bucket(i: int) -> Column:
        joined = F.concat_ws(
            ",", *[F.col("sig")[i * r + j].cast("string") for j in range(r)]
        )
        return joined if portable else F.xxhash64(joined)

    # sig feeds the band-hash expressions but is projected OUT of the output
    banded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[_bucket(i) for i in range(bands)])).alias(
            "band", "bucket"
        ),
    )
    a = banded.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    cand = (
        _pin(a, pin_smj).join(_pin(b, pin_smj), ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # signature join-back: one row per distinct candidate pair per side —
    # strictly fewer sig bytes moved than the old per-band, pre-dedup ride
    cand = cand.join(
        _pin(sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")), pin_smj),
        "id_a",
    ).join(
        _pin(sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")), pin_smj),
        "id_b",
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(k))
    return cand.select(
        "id_a", "id_b", F.round(est, 6).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= min_est_jaccard)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash", LongType())]
)


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc — numpy kernel over Arrow batches.

    Token hashes via BLAKE2 (stable across processes); each token votes ±1
    per bit; sign of the vote sum forms the signature.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(64, dtype=np.uint64)
        # token → 64-bit hash, shared across batches per worker; bounded so
        # a high-cardinality vocabulary (10^12-doc inputs) cannot grow a
        # worker-lifetime dict without limit — past the cap, misses are
        # simply recomputed (the memo is an optimization, not state)
        memo: dict = {}
        memo_cap = 1_000_000
        for pdf in batches:
            n_rows = len(pdf)
            texts = pdf[text_col].fillna("").str.lower().str.split()
            lengths = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_rows)
            flat = [t for toks in texts for t in toks]
            votes = np.zeros((n_rows, 64), dtype=np.int64)
            if flat:
                uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
                hs = np.empty(len(uniq), dtype=np.uint64)
                for i, t in enumerate(uniq):
                    v = memo.get(t)
                    if v is None:
                        v = int.from_bytes(
                            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                        )
                        if len(memo) < memo_cap:
                            memo[t] = v
                    hs[i] = v
                # each token occurrence votes ±1 per bit; scatter-add by row
                pm = (
                    ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64) * 2
                    - 1
                )
                row_idx = np.repeat(np.arange(n_rows), lengths)
                np.add.at(votes, row_idx, pm[inv])
            sig = ((votes > 0).astype(np.uint64) << bits[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame({"doc_id": pdf[id_col], "simhash": sig.view(np.int64)})

    narrow = ensure_parallelism(df.select(id_col, text_col))
    return narrow.mapInPandas(kernel, schema=_SIMHASH_SCHEMA)


_PORTABLE_SIMHASH_BITS = 60


def simhash_table_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit ANSI-reproducible SimHash — pure column expressions, no UDF.

    Token hash = top 15 hex chars of md5 (60 bits, signed-long-safe), which
    DuckDB reproduces via ``('0x' || substr(md5(tok), 1, 15))::BIGINT`` — so
    the oracle can replay the signature bit-for-bit. The vote stage is one
    groupBy with 60 partially-aggregating ``sum(±1)`` exprs (map-side
    combine; same shuffle shape as the minhash signature stage), entirely
    inside codegen — at scale this is *cheaper* than the BLAKE2 kernel,
    which pays an Arrow round-trip. The production ``simhash_table`` keeps
    64 bits; docs with zero tokens are absent here (explode drops them)
    rather than signature-0.
    """
    toks = df.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    hs = toks.select(id_col, h.alias("h"))
    votes = hs.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias("v%d" % i)
            for i in range(_PORTABLE_SIMHASH_BITS)
        ]
    )
    sig = None
    for i in range(_PORTABLE_SIMHASH_BITS):
        bit = F.when(F.col("v%d" % i) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return votes.select(id_col, sig.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    pin_smj: bool = True,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs at Hamming ≤ max_hamming via pigeonhole band join.

    The 64-bit signature is split into ``max_hamming + 1`` bands: any pair
    within the radius agrees on ≥ 1 full band (pigeonhole — the classic
    Charikar construction), so the band-bucket equi-join finds EVERY such
    pair; candidates are then verified exactly with ``bit_count``. Smaller
    radius → fewer, wider bands → fewer bucket collisions; the caller's
    radius controls the recall/cost trade directly.

    The pigeonhole argument needs ``max_hamming + 1`` bands of ≥ 1 bit each,
    so the supported radius range is 0..15 (16 bands × 4 bits over 64 bits);
    larger radii would silently lose the recall guarantee, so they raise.

    ``portable=True`` swaps in the 60-bit md5 signature
    (``simhash_table_portable``) so the whole query — signature, bands,
    verified Hamming — replays in an ANSI oracle.
    """
    if not 0 <= max_hamming <= 15:
        raise ValueError(
            "max_hamming must be in [0, 15]: the 64-bit pigeonhole construction "
            "needs max_hamming+1 non-empty bands (got %d)" % max_hamming
        )
    n_bands = max_hamming + 1
    nbits = _PORTABLE_SIMHASH_BITS if portable else 64
    # split the bits as evenly as possible (e.g. 64 / 7 bands → 10,9,9,9,9,9,9)
    widths = [
        nbits // n_bands + (1 if i < nbits % n_bands else 0) for i in range(n_bands)
    ]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    table = simhash_table_portable if portable else simhash_table
    sh = reuse(table(df, text_col, id_col))
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), offsets[i]).bitwiseAND(
                        F.lit((1 << widths[i]) - 1)
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "chunk"
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "chunk"
    )
    cand = (
        _pin(a, pin_smj).join(_pin(b, pin_smj), ["band", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
