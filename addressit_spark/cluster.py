"""Transitive clustering: large-star/small-star connected components.

Pure DataFrame implementation (joins + aggregations only — no GraphX, no
``collect_list`` of neighborhoods, so a single giant component cannot OOM
one task) of the alternating large-star/small-star algorithm of Kiveris et
al., "Connected Components in MapReduce and Beyond" — O(log² n) rounds, in
practice 2-4 for blocking-derived near-clique graphs.

* large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
* small-star(u): over Γ≤(u) = {v ∈ Γ(u): v ≤ u}: m = min(Γ≤(u) ∪ {u});
  emit (v, m) for v ∈ Γ≤(u) ∪ {u}, v ≠ m

Each round materializes via ``localCheckpoint`` to truncate lineage (the
iterative self-join would otherwise stack an exponential plan), and
convergence is a count+checksum fixpoint over the canonicalized edge set —
two cheap aggregations per round, no driver-side graph state.

Node ids are kept as orderable strings (span uids) for exactness; at
10^12-node scale swap in a join-assigned long id (``monotonically_increasing_id``
over the node table) — xxhash64 ids risk ~n²/2^65 collisions, which at that
scale is tens of thousands of wrongly merged clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (small, large) order, no self-loops."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = und.groupBy("src").agg(F.min("dst").alias("min_nbr"))
    mins = mins.select(
        "src", F.least("min_nbr", F.col("src")).alias("m")
    )
    return (
        und.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    small = und.where(F.col("dst") <= F.col("src"))
    mins = small.groupBy("src").agg(F.min("dst").alias("m"))
    emitted = small.join(mins, "src").select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return emitted.union(self_edges).where(F.col("src") != F.col("dst"))


def _fingerprint(edges: DataFrame):
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38) accumulator: immune to ANSI long-overflow at any scale
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("checksum"),
    ).collect()[0]
    return (row["n"], row["checksum"])


def connected_components(edges: DataFrame, max_rounds: int = 25) -> DataFrame:
    """(src, dst) edge list → (uid, component) with component = min uid.

    Nodes that appear in no edge are absent; callers union isolated nodes
    with ``component = uid`` (see pipeline).
    """
    cur = _canonical(edges).localCheckpoint(eager=True)
    prev_fp = _fingerprint(cur)
    for _ in range(max_rounds):
        cur = _canonical(_small_star(_large_star(cur))).localCheckpoint(eager=True)
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    # Fixpoint is a star forest rooted at each component's min; in canonical
    # (src < dst) order the root is src: members point at src, roots at self.
    members = cur.select(F.col("dst").alias("uid"), F.col("src").alias("component")).union(
        cur.select(F.col("src").alias("uid"), F.col("src").alias("component"))
    )
    return members.groupBy("uid").agg(F.min("component").alias("component"))


def cluster_members(components: DataFrame, all_nodes: DataFrame) -> DataFrame:
    """Attach isolated nodes (uid with no match edge) as singleton clusters."""
    return (
        all_nodes.select("uid")
        .join(components, "uid", "left")
        .select(
            "uid",
            F.coalesce("component", F.col("uid")).alias("component"),
        )
    )
