"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query set
  against the full vector table; dot products via ``zip_with``/``aggregate``
  (JVM, codegen — no Python in the loop); per-query top-k via window rank.
  The correctness baseline, and the right plan whenever |queries| is small.
* ``lsh_topk`` — the scale path: random-hyperplane LSH signatures bucket the
  vectors; each query probes only its own bucket(s) (multi-probe over the
  nearest band variants), turning O(|Q|·N) into O(|Q|·N/2^bits) with recall
  traded by number of probes/tables. Hyperplanes derive from a seeded BLAKE2
  stream → deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Optional

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from addressit_spark.util import ensure_parallelism, reuse


# The broadcast-query operators (brute_force_topk, lsh_topk) are documented
# for the small-|Q| regime; past this bound a caller gets a clear error
# pointing at the scale path instead of a driver OOM from the broadcast.
DEFAULT_MAX_QUERY_ROWS = 100_000


def _check_query_bound(queries: DataFrame, max_query_rows, op: str) -> None:
    """Fail fast when the broadcast query side exceeds its contract.

    Cost: one CollectLimit job bounded at ``max_query_rows + 1`` rows —
    negligible next to the broadcast it guards. ``None`` disables (caller
    explicitly accepts the driver-memory risk).
    """
    if max_query_rows is None:
        return
    n = queries.limit(max_query_rows + 1).count()
    if n > max_query_rows:
        raise ValueError(
            f"{op}: query side exceeds {max_query_rows} rows; this operator "
            "BROADCASTS the queries and is only for small query sets. For "
            "large |queries| use ivf_topk (probes inverted lists, no query "
            "broadcast), or pass max_query_rows=None/higher to accept the "
            "driver-memory cost explicitly."
        )


def _norm_col(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def _dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a: Column, b: Column) -> Column:
    return F.round(_dot_col(a, b) / (_norm_col(a) * _norm_col(b)), 6)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: Optional[int] = DEFAULT_MAX_QUERY_ROWS,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    ``queries`` must be small (it is broadcast); ``max_query_rows`` enforces
    that contract with a clear error instead of a driver OOM. Self-matches
    excluded. Deterministic tie-break on neighbor id.
    """
    _check_query_bound(queries, max_query_rows, "brute_force_topk")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    base = ensure_parallelism(embeddings.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        base.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("qvec"), F.col("nvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> List[List[float]]:
    """Deterministic unit hyperplanes from a BLAKE2-seeded Gaussian stream."""
    raw = b""
    i = 0
    need = dim * bits * 8
    while len(raw) < need:
        raw += hashlib.blake2b(b"lsh|%d|%d" % (seed, i), digest_size=64).digest()
        i += 1
    ints = np.frombuffer(raw[:need], dtype=np.uint64).astype(np.float64)
    u = (ints / 2.0**64).reshape(bits, dim)
    # Box-Muller on consecutive uniforms (pair within each row, wrap-safe)
    u1 = np.clip(u, 1e-12, 1 - 1e-12)
    u2 = np.roll(u1, 1, axis=1)
    g = np.sqrt(-2 * np.log(u1)) * np.cos(2 * math.pi * u2)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in g]


def _plane_dots_col(vec: Column, planes: List[List[float]]) -> Column:
    """array<double> of vec·plane_i — shared by signature and probe margins."""
    return F.array(
        *[_dot_col(vec, F.array(*[F.lit(p) for p in plane])) for plane in planes]
    )


def _sig_from_dots(dots: Column, bits: int) -> Column:
    """Pack sign(dot_i) into a long bucket id (plane i → bit bits-1-i)."""
    sig = F.lit(0).cast("long")
    for i in range(bits):
        b = F.when(F.element_at(dots, i + 1) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig * 2 + b
    return sig


def lsh_signature_col(vec: Column, planes: List[List[float]]) -> Column:
    """Pack sign(vec·plane_i) into a long bucket id — pure column exprs.

    Built directly from per-plane dot products (NOT via ``_plane_dots_col``
    + ``_sig_from_dots``): an array-expression reference is re-evaluated per
    ``element_at``, which costs O(bits²·dim) per row on the TABLE side —
    measured 1.6× on the near-dup self-join at bits=12. The array form is
    only used on the (tiny) query side where the margins are needed anyway.
    """
    bits = [
        F.when(
            _dot_col(vec, F.array(*[F.lit(p) for p in plane])) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    sig = F.lit(0).cast("long")
    for b in bits:
        sig = sig * 2 + b
    return sig


def _probe_buckets_col(dots: Column, bits: int, probes: int) -> Column:
    """Margin-aware multi-probe bucket list (Lv et al., multi-probe LSH).

    The buckets most likely to hold a query's true neighbors are the ones
    reached by flipping the hyperplane bits with the SMALLEST |vec·plane|
    margin — a near-zero dot means the neighbor plausibly falls on the other
    side. Variants are ordered by perturbation likelihood: the query's own
    bucket, then single flips of the smallest-margin planes, then the
    two-smallest-margins pair combined with each next margin. All pure
    column expressions evaluated on the (small) query side only.
    """
    order = F.transform(
        F.array_sort(
            F.zip_with(
                dots,
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("i")),
            )
        ),
        lambda s: s.getField("i"),
    )

    def bitmask(idx: Column) -> Column:
        # shiftleft() needs a literal shift count, so the plane-index →
        # bit-mask map is a CASE over the (≤ bits) possible indices
        expr = F.when(idx == 0, F.lit(1 << (bits - 1)).cast("long"))
        for i in range(1, bits):
            expr = expr.when(idx == i, F.lit(1 << (bits - 1 - i)).cast("long"))
        return expr.otherwise(F.lit(0).cast("long"))

    sig = _sig_from_dots(dots, bits)
    variants = [sig]
    n_single = min(probes - 1, bits)
    for j in range(n_single):
        variants.append(sig.bitwiseXOR(bitmask(F.element_at(order, j + 1))))
    # deeper perturbations: pair the smallest margin with each next one
    n_pairs = min(max(probes - 1 - n_single, 0), bits - 1)
    for j in range(1, n_pairs + 1):
        variants.append(
            sig.bitwiseXOR(bitmask(F.element_at(order, 1))).bitwiseXOR(
                bitmask(F.element_at(order, j + 1))
            )
        )
    return F.array_distinct(F.array(*variants))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: Optional[int] = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
    tables: int = 1,
    max_query_rows: Optional[int] = DEFAULT_MAX_QUERY_ROWS,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane bucketing.

    With ``probes > 1`` each query additionally probes the buckets its true
    neighbors are most likely to have landed in — the ones reached by
    flipping the hyperplanes with the smallest |vec·plane| margin
    (margin-aware multi-probe LSH), trading compute for recall without more
    tables. ``tables > 1`` unions candidates from independent hyperplane
    sets (classic L-table LSH): recall compounds as 1-(1-r)^L while the
    scanned fraction grows only linearly. Candidate fraction ≈
    tables × probes / 2^bits of the base table. The query side is broadcast
    (small-|Q| regime, enforced by ``max_query_rows``); for large query
    sets use :func:`ivf_topk`.
    """
    _check_query_bound(queries, max_query_rows, "lsh_topk")
    base, qprobe = _lsh_base_and_probes(
        embeddings, queries, bits, dim, seed, probes, tables, id_col, vec_col
    )

    scored = (
        base.join(F.broadcast(qprobe), ["t", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("qvec"), F.col("nvec")).alias("cos_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _lsh_base_and_probes(
    embeddings: DataFrame,
    queries: DataFrame,
    bits: int,
    dim: Optional[int],
    seed: int,
    probes: int,
    tables: int,
    id_col: str,
    vec_col: str,
):
    """The shared LSH candidate-generation halves: (base, qprobe).

    ``base`` = (neighbor_id, nvec, t, bucket) — one row per vector per
    table; ``qprobe`` = (query_id, qvec, t, bucket) — one row per query per
    probed bucket. Used by :func:`lsh_topk` (joins then scores) and
    :func:`lsh_scan_stats` (joins without vectors to count the scanned set),
    so the quality metric measures exactly the production candidate plan.
    """
    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    all_planes = [_hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)]

    # base side: one (table, bucket) row per vector per table — a single
    # widened scan, exploded JVM-side; the join key is (t, bucket)
    base = ensure_parallelism(embeddings.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_signature_col(F.col(vec_col), all_planes[t]).alias(
                            "bucket"
                        ),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select("neighbor_id", "nvec", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))

    # query side: margin-aware probe buckets per table (tiny — broadcast).
    # NOTE the factory: a two-parameter lambda passed to F.transform is
    # called as (element, INDEX) — a default-arg closure over `t` would be
    # silently rebound to the array index.
    def _tag_table(tt: int):
        return lambda b: F.struct(F.lit(tt).alias("t"), b.alias("bucket"))

    qprobe = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            F.flatten(
                F.array(
                    *[
                        F.transform(
                            _probe_buckets_col(
                                _plane_dots_col(F.col(vec_col), all_planes[t]),
                                bits,
                                probes,
                            ),
                            _tag_table(t),
                        )
                        for t in range(tables)
                    ]
                )
            )
        ).alias("tb"),
    ).select("query_id", "qvec", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))

    return base, qprobe


def _scan_stats(
    cand_base: DataFrame, cand_probe: DataFrame, join_keys, embeddings, queries
) -> DataFrame:
    """Single-row (n_queries, n_base, n_candidates, scan_fraction).

    ``n_candidates`` counts DISTINCT (query, neighbor) pairs whose exact
    distance the approximate method would compute; ``scan_fraction`` is that
    against the |Q|·(N-1) brute-force pair count — the driver-visible
    evidence that the method scans a bounded slice, not the whole table.
    """
    # no forced broadcast: ivf_scan_stats inherits ivf_topk's large-|Q|
    # posture (a forced broadcast of 10^8 probe rows would OOM the driver);
    # AQE broadcasts a genuinely small probe side at runtime
    n_cand = (
        cand_base.join(cand_probe, join_keys)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_candidates"))
        .withColumn("_j", F.lit(1))
    )
    totals = (
        embeddings.agg(F.count(F.lit(1)).alias("n_base"))
        .withColumn("_j", F.lit(1))
        .join(
            queries.agg(F.count(F.lit(1)).alias("n_queries")).withColumn(
                "_j", F.lit(1)
            ),
            "_j",
        )
    )
    return n_cand.join(totals, "_j").select(
        "n_queries",
        "n_base",
        "n_candidates",
        (
            F.col("n_candidates")
            / (F.col("n_queries") * (F.col("n_base") - 1))
        ).alias("scan_fraction"),
    )


def lsh_scan_stats(
    embeddings: DataFrame,
    queries: DataFrame,
    bits: int = 8,
    dim: Optional[int] = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
    tables: int = 1,
) -> DataFrame:
    """Scanned-candidate stats for :func:`lsh_topk` at the same parameters.

    Rebuilds the identical deterministic bucket/probe tables (same BLAKE2
    hyperplanes) and counts the distinct candidate pairs WITHOUT computing
    cosines — so asserting ``scan_fraction ≤ bound`` measures the actual
    production candidate plan, not a proxy.
    """
    base, qprobe = _lsh_base_and_probes(
        embeddings, queries, bits, dim, seed, probes, tables, id_col, vec_col
    )
    return _scan_stats(
        base.select("neighbor_id", "t", "bucket"),
        qprobe.select("query_id", "t", "bucket"),
        ["t", "bucket"],
        embeddings,
        queries,
    )


def _centroid_assign(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, top: int = 1
) -> DataFrame:
    """Assign each vector to its ``top`` nearest centroids (cosine).

    Broadcast cross-join against the (tiny) centroid table + window argmin —
    the standard IVF build/probe primitive; cost is |vectors| × k rows of
    pure JVM arithmetic.
    """
    scored = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(centroids))
    scored = scored.select(
        "vid",
        "vec",
        "cid",
        cosine_col(F.col("vec"), F.col("centroid")).alias("csim"),
    )
    w = Window.partitionBy("vid").orderBy(F.col("csim").desc(), F.col("cid"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= top)
        .select("vid", "vec", "cid", "crank")
    )


def ivf_build(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: (cid, centroid) after Lloyd steps.

    Seeds are the ``n_centroids`` lowest-id vectors (deterministic across
    runs/cluster sizes — no RNG), refined by ``iters`` Lloyd iterations done
    entirely with DataFrame ops: assign (broadcast argmin) → element-wise
    mean via posexplode + groupBy(cid, dim) — no driver-side math.
    """
    base = ensure_parallelism(embeddings.select(id_col, vec_col))
    # cid derives from id_col order directly — monotonically_increasing_id
    # depends on physical partition layout and would make the "deterministic
    # across runs/cluster sizes" seeding claim fragile
    cent = (
        base.orderBy(id_col)
        .limit(n_centroids)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cid"),
            F.col(vec_col).alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = _centroid_assign(base, cent, id_col, vec_col, top=1)
        dims = assigned.select("cid", F.posexplode("vec").alias("dim", "x"))
        means = (
            dims.groupBy("cid", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s.getField("m").cast("float"),
                ).alias("centroid")
            )
        )
        cent = means.localCheckpoint(eager=True)
    return cent


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize, probe ``nprobe`` lists.

    The scale path for large |queries|: each query scans only the ~nprobe/k
    fraction of vectors in its probed inverted lists instead of the full
    table. Returns (query_id, neighbor_id, cos_sim, rank).
    """
    lists, probes = _ivf_lists_and_probes(
        embeddings, queries, n_centroids, nprobe, iters, id_col, vec_col
    )
    # no broadcast hint on the probe side: ivf_topk is the large-|Q| path,
    # and a forced broadcast of 10^8 probe rows would OOM the driver. AQE
    # still broadcasts a genuinely small probe table at runtime.
    scored = (
        lists.join(probes, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("qvec"), F.col("nvec")).alias("cos_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _ivf_lists_and_probes(
    embeddings: DataFrame,
    queries: DataFrame,
    n_centroids: int,
    nprobe: int,
    iters: int,
    id_col: str,
    vec_col: str,
):
    """The shared IVF candidate-generation halves: (lists, probes).

    ``lists`` = (neighbor_id, nvec, cid) — each base vector in its nearest
    list; ``probes`` = (query_id, qvec, cid) — each query × its ``nprobe``
    nearest lists. Used by :func:`ivf_topk` and :func:`ivf_scan_stats` so
    both see the identical deterministic quantizer.
    """
    cent = ivf_build(embeddings, n_centroids, iters, id_col, vec_col)
    lists = _centroid_assign(embeddings, cent, id_col, vec_col, top=1).select(
        F.col("vid").alias("neighbor_id"), F.col("vec").alias("nvec"), "cid"
    )
    probes = _centroid_assign(queries, cent, id_col, vec_col, top=nprobe).select(
        F.col("vid").alias("query_id"), F.col("vec").alias("qvec"), "cid"
    )
    return lists, probes


def ivf_scan_stats(
    embeddings: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scanned-candidate stats for :func:`ivf_topk` at the same parameters.

    Same contract as :func:`lsh_scan_stats`: counts the distinct candidate
    pairs the probed inverted lists would score, without the cosine math.
    """
    lists, probes = _ivf_lists_and_probes(
        embeddings, queries, n_centroids, nprobe, iters, id_col, vec_col
    )
    return _scan_stats(
        lists.select("neighbor_id", "cid"),
        probes.select("query_id", "cid"),
        ["cid"],
        embeddings,
        queries,
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    min_cos: float = 0.95,
    bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join.

    Vectors with cos ≥ min_cos almost always share a bucket at modest
    ``bits``; candidates are verified with the exact cosine. The bucket
    self-join shuffles on uniform hashed keys — no skew amplification.
    """
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    planes = _hyperplanes(int(first["d"]), bits, seed)
    # signatures cost bits×dim mults per row — materialize once for both
    # self-join branches, on a widened scan
    sig = reuse(
        ensure_parallelism(embeddings.select(id_col, vec_col)).select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            lsh_signature_col(F.col(vec_col), planes).alias("bucket"),
        )
    )
    a = sig.select(F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
    b = sig.select(F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
    # hint('merge'): self-join of the full signature table — pin sort-merge
    # so stale checkpoint stats can never broadcast a table-sized side
    return (
        a.hint("merge").join(b.hint("merge"), "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_col(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min_cos)
        .distinct()
    )
