"""Quality evaluation: pairwise F1 on labeled same-block pairs.

The BASELINE metric: two spans are *predicted* matched iff they land in the
same cluster component; *labeled* matched iff they belong to the same
synthetic entity. F1 is computed over candidate pairs that share a blocking
key (the metric's stated universe), fully distributed — one join per side
plus a single aggregate, no driver-side pair materialization.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bcubed(clusters: DataFrame, truth: DataFrame) -> Dict[str, float]:
    """B-cubed precision/recall/F1 of the clustering vs entity ground truth.

    The standard per-item ER metric (Bagga & Baldwin): for each span i,
    P_i = |C(i) ∩ L(i)| / |C(i)| and R_i = |C(i) ∩ L(i)| / |L(i)| where
    C(i) is i's predicted cluster and L(i) its true entity; scores are the
    means over all spans. Unlike pairwise F1 it weights every span equally
    instead of every pair (one giant wrong cluster can dominate pairwise
    counts quadratically), so the two together bound over- and
    under-merging from both directions.

    Fully distributed in three aggregates over (component, entity) overlap
    cells: Σ_i P_i = Σ_cells o²/|C| and Σ_i R_i = Σ_cells o²/|L| — no
    per-item loop, no driver-side data beyond the final scalars.

    ``clusters``: (uid, component) — pass ``cluster_members`` output so
    singleton spans count. ``truth``: corpus.truth_view columns.
    """
    t = truth.select(
        F.concat_ws("#", "doc_id", "address_pos").alias("uid"), "entity_id"
    )
    m = clusters.select("uid", "component").join(t, "uid")
    cells = m.groupBy("component", "entity_id").agg(
        F.count(F.lit(1)).alias("o")
    )
    csize = m.groupBy("component").agg(F.count(F.lit(1)).alias("cs"))
    esize = m.groupBy("entity_id").agg(F.count(F.lit(1)).alias("es"))
    row = (
        cells.join(csize, "component")
        .join(esize, "entity_id")
        .agg(
            F.sum(F.col("o") * F.col("o") / F.col("cs")).alias("sp"),
            F.sum(F.col("o") * F.col("o") / F.col("es")).alias("sr"),
            F.sum("o").alias("n"),
        )
        .collect()[0]
    )
    n = row["n"] or 0
    if n == 0:
        # an empty clusters⋈truth join means a broken pipeline (no clusters,
        # or a uid-format drift between the two sides) — report 0, never a
        # vacuous perfect score that would mask exactly the failure this
        # metric exists to catch
        return {"n": 0, "precision": 0.0, "recall": 0.0, "f1": 0.0}
    precision = row["sp"] / n
    recall = row["sr"] / n
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"n": n, "precision": precision, "recall": recall, "f1": f1}


def labeled_pairs(pairs: DataFrame, truth: DataFrame) -> DataFrame:
    """Attach ground-truth entity ids to both sides of the candidate pairs.

    ``truth`` columns: doc_id, address_pos, entity_id (corpus.truth_view).
    """
    t = truth.select(
        F.concat_ws("#", "doc_id", "address_pos").alias("uid"),
        "entity_id",
    )
    return (
        pairs.select("uid_a", "uid_b", "block_key")
        .join(t.select(F.col("uid").alias("uid_a"), F.col("entity_id").alias("entity_a")), "uid_a")
        .join(t.select(F.col("uid").alias("uid_b"), F.col("entity_id").alias("entity_b")), "uid_b")
        .withColumn("is_match", F.col("entity_a") == F.col("entity_b"))
    )


def pairwise_f1(labeled: DataFrame, clusters: DataFrame) -> Dict[str, float]:
    """Pairwise precision/recall/F1 of cluster labels on the labeled pairs."""
    c = clusters.select("uid", "component")
    j = (
        labeled.join(
            c.select(F.col("uid").alias("uid_a"), F.col("component").alias("comp_a")),
            "uid_a",
        )
        .join(
            c.select(F.col("uid").alias("uid_b"), F.col("component").alias("comp_b")),
            "uid_b",
        )
        .withColumn("pred", F.col("comp_a") == F.col("comp_b"))
    )
    agg = j.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
