"""Blocking: normalized address keys + skew-proof candidate-pair generation.

Blocking key = (normalized street-name token(s), soundex(locality)) — the
street name comes out of the parse stage; the locality is the first region
(the reference pushes non-street tokens into ``regions``,
/root/reference/address.js:277-287).

Pair generation uses a *triangle-salted* self-join so one dense urban block
key cannot pin a single reducer at 10^12-doc scale:

* every span in a block of size ``c`` gets a bucket ``b ∈ [0, S)`` with
  ``S = ceil(c / heavy_threshold)`` (S=1 for light blocks — one code path);
* a row emits LEFT join keys ``(block, b, j)`` for ``j ∈ [b, S)`` and RIGHT
  join keys ``(block, i, b)`` for ``i ∈ [0, b]``;
* joining LEFT×RIGHT on ``(block, lo, hi)`` meets every unordered pair of
  spans exactly once per bucket pair — cross-bucket pairs once by
  construction, same-bucket pairs deduped by the ``uid_l < uid_r`` rule.

The salted pair set provably equals the unsalted self-join pair set (tested
at small scale), while the shuffle key ``(block, lo, hi)`` spreads a block of
c rows over ~S(S+1)/2 reducers. Replication cost is S+1 rows per input row,
bounded by ``salt_cap``. Blocks above ``max_block_size`` are *dropped with a
logged metric* (no silent caps): at 10^12 docs a million-row block means a
degenerate key, not signal.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def address_table(parsed_spans: DataFrame) -> DataFrame:
    """Project parsed text spans to the normalized address-feature table.

    Keeps only spans that produced both a street and a locality — the
    minimum signal the blocking key needs. ``uid`` is a stable span identity
    (doc_id#pos) used for pair ordering and cluster node identity.
    """
    a = parsed_spans.where(
        (F.col("kind") == "text")
        & F.col("address.street").isNotNull()
        & (F.col("address.street") != "")
        & (F.size("address.regions") > 0)
    )
    street_norm = F.upper(F.col("address.street"))
    toks = F.split(street_norm, " ")
    n = F.size(toks)
    return a.select(
        F.concat_ws("#", "doc_id", "pos").alias("uid"),
        "doc_id",
        "pos",
        street_norm.alias("street_norm"),
        # street name = all tokens but the trailing street type; single-token
        # streets (e.g. BROADWAY, reNoStreet at parsers/en.js:84) keep the token.
        F.when(n > 1, F.concat_ws(" ", F.slice(toks, 1, n - 1)))
        .otherwise(F.element_at(toks, 1))
        .alias("street_name"),
        F.element_at(toks, -1).alias("street_type"),
        F.col("address.number").alias("number"),
        F.col("address.unit").alias("unit"),
        F.upper(F.element_at("address.regions", 1)).alias("locality"),
    ).withColumn(
        "block_key",
        F.concat_ws("|", F.col("street_name"), F.soundex(F.col("locality"))),
    )


PAIR_FEATURES = ["street_norm", "street_name", "number", "unit", "locality"]


def block_stats(addresses: DataFrame) -> DataFrame:
    """Block-size histogram — the skew diagnostic (and an oracle-checkable agg)."""
    return (
        addresses.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("block_size"))
        .groupBy("block_size")
        .agg(F.count(F.lit(1)).alias("n_blocks"))
        .orderBy("block_size")
    )


def salted_pair_join(
    addresses: DataFrame,
    features: Tuple[str, ...],
    heavy_threshold: int = 256,
    salt_cap: int = 64,
    max_block_size: int = 100_000,
    hash_block_key: bool = False,
    orient: bool = True,
) -> Tuple[DataFrame, DataFrame]:
    """The triangle-salted within-block self-join core.

    ``features`` is the per-side payload carried through the shuffle — every
    byte of it is paid once per replicated row, so callers should project the
    MINIMUM set their consumer reads (the fused scorer carries interned int
    surface ids; the compositional :func:`candidate_pairs` carries the full
    string feature set for inspectability).

    ``hash_block_key=True`` joins on ``xxhash64(block_key)`` (8 bytes)
    instead of the block-key string; the string is still carried once, on the
    left side only, for the output. A 64-bit block-hash collision merges two
    blocks' candidate spaces — at 10⁹ distinct blocks the expected number of
    colliding block *pairs* is ~0.03, and the consequence is a few extra
    scored pairs, not lost pairs. Those cross-block pairs score LOW because
    the fused scorer defaults a sim-map miss on distinct surfaces to 0.0
    (``scoring.score_pairs_fused``'s miss policy) — so the collision trade
    is extra work, never wrongly merged clusters.

    The same-bucket dedup filter compares an 8-byte ``xxhash64(uid)`` order
    first and falls back to the uid strings only on a hash tie (probability
    ~n_same_bucket_pairs/2⁶⁴), so no distinct-uid pair can ever be silently
    dropped while the comparison cost stays on the 8-byte ints. The uid
    columns are referenced by the tie branch, so they ride the shuffle even
    for consumers that don't project them — the strings are needed for the
    canonical ``uid_a``/``uid_b`` output anyway.

    ``orient=False`` skips the per-feature canonical-orientation ``when``s
    and emits raw ``_l``/``_r`` feature columns — correct whenever the
    consumer's scoring expressions are symmetric in the two sides (the fused
    scorer's are); ``uid_a``/``uid_b`` remain canonically ordered either way.

    Returns ``(pairs, dropped_blocks)``: canonical (uid_a < uid_b) pairs with
    each feature suffixed ``_a``/``_b`` (or ``_l``/``_r`` unoriented), plus
    the oversized-block metrics table (no silent caps).
    """
    sizes = addresses.groupBy("block_key").agg(F.count(F.lit(1)).alias("block_size"))

    dropped = sizes.where(F.col("block_size") > max_block_size)

    addr = (
        addresses.join(sizes.where(F.col("block_size") <= max_block_size), "block_key")
        .withColumn(
            "n_buckets",
            F.least(
                F.ceil(F.col("block_size") / F.lit(heavy_threshold)),
                F.lit(salt_cap),
            ).cast("int"),
        )
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("uid"), F.col("n_buckets")).cast("int"),
        )
    )
    if hash_block_key:
        addr = addr.withColumn("_bk", F.xxhash64("block_key"))
        join_key = "_bk"
        left_extra = ["block_key"]  # carried once, left side only
    else:
        join_key = "block_key"
        left_extra = []

    addr = addr.withColumn("_uord", F.xxhash64("uid"))
    feat = ["uid", "_uord"] + list(features)

    left = addr.select(
        join_key,
        *left_extra,
        F.col("bucket").alias("lo"),
        F.explode(F.sequence(F.col("bucket"), F.col("n_buckets") - 1)).alias("hi"),
        *[F.col(c).alias(c + "_l") for c in feat],
    )
    right = addr.select(
        join_key,
        F.explode(F.sequence(F.lit(0), F.col("bucket"))).alias("lo"),
        F.col("bucket").alias("hi"),
        *[F.col(c).alias(c + "_r") for c in feat],
    )

    # Pin the self-join to sort-merge: both sides are the replicated table
    # (10^12-row scale — never broadcastable), but a checkpointed/parquet
    # source can carry a tiny size ESTIMATE, and the planner then broadcasts
    # the whole replicated side — a ~GB HashedRelation built serially per
    # executor that neither scales nor survives real data volumes. The hint
    # makes the physical strategy deterministic at every scale.
    joined = left.hint("merge").join(right.hint("merge"), [join_key, "lo", "hi"])
    filtered = joined.where(
        # cross-bucket pairs meet exactly once (lower bucket always on the
        # left); same-bucket pairs need a total order to dedup + drop selfs —
        # the 8-byte hashed order, so the filter almost never touches the
        # strings. A hash TIE between two distinct uids would silently drop
        # that pair, so ties fall back to the uid string order — the string
        # comparison only evaluates on ties (~n/2^64 of rows), keeping the
        # shuffle-pruning benefit while closing the silent-loss hole.
        (F.col("lo") != F.col("hi"))
        | (F.col("_uord_l") < F.col("_uord_r"))
        | (
            (F.col("_uord_l") == F.col("_uord_r"))
            & (F.col("uid_l") < F.col("uid_r"))
        )
    )
    if orient:
        feature_cols = [
            F.when(F.col("uid_l") < F.col("uid_r"), F.col(c + "_l"))
            .otherwise(F.col(c + "_r"))
            .alias(c + "_a")
            for c in features
        ] + [
            F.when(F.col("uid_l") < F.col("uid_r"), F.col(c + "_r"))
            .otherwise(F.col(c + "_l"))
            .alias(c + "_b")
            for c in features
        ]
    else:
        feature_cols = [F.col(c + "_l") for c in features] + [
            F.col(c + "_r") for c in features
        ]
    pairs = filtered.select(
        "block_key",
        # canonical pair order regardless of which side a uid landed on
        F.least("uid_l", "uid_r").alias("uid_a"),
        F.greatest("uid_l", "uid_r").alias("uid_b"),
        *feature_cols,
    )
    return pairs, dropped


def candidate_pairs(
    addresses: DataFrame,
    heavy_threshold: int = 256,
    salt_cap: int = 64,
    max_block_size: int = 100_000,
) -> Tuple[DataFrame, DataFrame]:
    """Generate within-block candidate pairs, skew-salted.

    Returns ``(pairs, dropped_blocks)`` where ``pairs`` carries the full
    string features of both sides (suffixed ``_a``/``_b``) and
    ``dropped_blocks`` is the metrics table of oversized blocks excluded
    from matching. For the 10^12-pair hot path prefer
    :func:`addressit_spark.scoring.score_pairs_fused`, which shuffles
    interned int surface ids instead of these strings.
    """
    return salted_pair_join(
        addresses,
        tuple(PAIR_FEATURES),
        heavy_threshold=heavy_threshold,
        salt_cap=salt_cap,
        max_block_size=max_block_size,
    )


def candidate_pairs_unsalted(addresses: DataFrame) -> DataFrame:
    """Reference pair generation: plain block self-join (oracle for tests).

    Semantically identical to :func:`candidate_pairs`; quadratically skewed
    on dense keys, so only used to verify the salted path at small scale.
    """
    feat = ["uid"] + PAIR_FEATURES
    l = addresses.select(
        "block_key", *[F.col(c).alias(c + "_a") for c in feat]
    )
    r = addresses.select(
        "block_key", *[F.col(c).alias(c + "_b") for c in feat]
    )
    return l.join(r, "block_key").where(F.col("uid_a") < F.col("uid_b"))
