"""Physical-plan helpers shared by operators.

Two recurring local-mode-vs-cluster hazards:

* A small parquet input arrives as 1-2 partitions (``maxPartitionBytes``
  bins the whole file into one split), serializing every downstream pandas
  UDF / explode on one core while 31 idle. ``ensure_parallelism`` widens
  only when the scan is narrower than the session's parallelism — at real
  scale (file splits ≥ cores) it is a no-op, so it never adds a shuffle to
  the 100 TB plan.
* A self-join recomputes its (expensive) common subtree once per branch —
  Catalyst reuses *exchanges*, not arbitrary subplans, so a pandas-UDF or
  64-agg signature stage above the join runs twice. ``reuse`` pins the
  subtree with an eager ``localCheckpoint`` (block-manager storage, lineage
  truncated) so each branch reads the materialized result. This is the same
  mechanism the CC iteration uses between rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition only if the plan is narrower than the cores."""
    if df.isStreaming:  # micro-batch sizing is the stream scheduler's job
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def reuse(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize once (localCheckpoint) for multi-branch reuse.

    ``eager=False`` keeps construction job-free: the checkpoint materializes
    inside the first action instead (the RDD is persisted, so concurrent
    branch tasks on one partition compute it once — block-level locking —
    with a bounded, rare 2× worst case across executors on a real cluster).
    Builders that are called at plan-construction time should prefer it so
    building a DataFrame never launches Spark jobs.
    """
    return df.localCheckpoint(eager=eager)
