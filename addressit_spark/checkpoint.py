"""Per-stage snapshot tables: resume + per-partition lineage metrics.

Every pipeline stage can materialize to a deterministic parquet path
(``<dir>/<stage>``). On re-entry, a stage whose snapshot exists (parquet
``_SUCCESS`` marker) is read back instead of recomputed — the batch analogue
of the north_rule's "resumes from per-partition snapshot checkpoints".
Alongside each snapshot a ``_metrics.json`` records row count, partition
row histogram (per-partition lineage), and the stage's input fingerprint so
a resumed run can prove it is continuing the same inputs.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _success_marker(path: str) -> str:
    return os.path.join(path, "_SUCCESS")


def stage_metrics(df: DataFrame) -> Dict[str, object]:
    """Row count + per-partition row histogram, computed in one pass."""
    per_part = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    rows = sum(r["rows"] for r in per_part)
    return {
        "rows": rows,
        "partitions": len(per_part),
        "partition_rows": {str(r["partition"]): r["rows"] for r in per_part},
    }


class StageStore:
    """Snapshot/resume manager for one pipeline run directory."""

    def __init__(self, spark: SparkSession, base_dir: Optional[str], resume: bool = True):
        self.spark = spark
        self.base_dir = base_dir
        self.resume = resume
        self.lineage: Dict[str, Dict[str, object]] = {}

    def run(
        self,
        stage: str,
        fn: Callable[[], DataFrame],
        input_fingerprint: str = "",
        materialize: bool = True,
    ) -> DataFrame:
        """Compute-or-reload one stage; record lineage metrics either way.

        ``materialize=False`` marks a high-volume pass-through stage (e.g.
        the 10^12-scale candidate-pair table): it is fused into its consumer
        instead of being pinned — when a snapshot dir is set it is still
        written, because snapshots are the resume contract.
        """
        import time

        if self.base_dir is None:
            if not materialize:
                df = fn()
                self.lineage[stage] = {"resumed": False, "materialized": False}
                return df
            # Pin with an eager localCheckpoint so downstream self-joins
            # (pair generation, CC) read materialized blocks instead of
            # re-running the parse/score subtree per branch.
            t0 = time.monotonic()
            df = fn().localCheckpoint(eager=True)
            self.lineage[stage] = {
                "resumed": False,
                "materialized": "localCheckpoint",
                # eager checkpoint = the stage genuinely executed here, so
                # this is real per-stage wall time (bench attribution reads
                # it; fused materialize=False stages bill to their consumer)
                "wall_sec": round(time.monotonic() - t0, 3),
            }
            return df

        path = os.path.join(self.base_dir, stage)
        meta_path = os.path.join(self.base_dir, stage + "_metrics.json")
        if self.resume and os.path.exists(_success_marker(path)):
            meta = {}
            if os.path.exists(meta_path):
                with open(meta_path) as fh:
                    meta = json.load(fh)
            # resume only a snapshot proven to be THIS computation: the
            # recorded fingerprint (input identity + stage parameters, per
            # run_pipeline) must match. A mismatched snapshot — same dir,
            # different data or e.g. a different max_block_size — would
            # silently poison every downstream stage (a stale sim map
            # zeroes similarities under the distinct-id miss policy), so
            # it is recomputed and overwritten instead. Snapshots written
            # before fingerprints were recorded have no claim to verify
            # and resume as before.
            recorded = meta.get("input_fingerprint")
            if recorded is None or recorded == input_fingerprint:
                df = self.spark.read.parquet(path)
                meta["resumed"] = True
                self.lineage[stage] = meta
                return df

        t0 = time.monotonic()
        df = fn()
        df.write.mode("overwrite").parquet(path)
        wall = round(time.monotonic() - t0, 3)
        out = self.spark.read.parquet(path)
        meta = stage_metrics(out)
        meta.update(
            {
                "stage": stage,
                "input_fingerprint": input_fingerprint,
                "resumed": False,
                "wall_sec": wall,
            }
        )
        with open(meta_path, "w") as fh:
            json.dump(meta, fh, indent=1, sort_keys=True)
        self.lineage[stage] = meta
        return out

    def write_lineage(self) -> None:
        if self.base_dir is None:
            return
        with open(os.path.join(self.base_dir, "lineage.json"), "w") as fh:
            json.dump(self.lineage, fh, indent=1, sort_keys=True, default=str)
