"""SparkSession factory with the engine's standard tuning.

Centralizes the configs that matter at scale so every entry point (tests,
bench, driver contract) runs the same engine profile:

* AQE on (runtime coalesce + skew-join splitting) — the blocking self-join
  skews on dense urban keys, and AQE splits those partitions at runtime.
* Arrow exchange on, with a bounded batch size so Python workers keep a
  steady memory footprint regardless of input scale.
* Shuffle partitions default to 4× cores (overridable) — small enough for
  local runs, and the explicit ``repartition`` calls in the pipeline are the
  real scale lever on a cluster.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    master: Optional[str] = None,
    app_name: str = "addressit_spark",
    shuffle_partitions: Optional[int] = None,
    driver_memory: str = "8g",
) -> SparkSession:
    cores = default_parallelism()
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        # ≥ 4× cores so stragglers rebalance; AQE coalesces the excess.
        shuffle_partitions = max(4 * cores, 16)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
