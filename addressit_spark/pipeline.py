"""End-to-end ER pipeline: parse → block → score → cluster, with checkpoints.

The north_rule dataflow over the input_hint table shape::

    documents(doc_id, spans[]) ──posexplode──► spans
      ──pandas_udf parse──► address structs          (Arrow batch boundary)
      ──normalize──► blocking keys (street name + soundex(locality))
      ──triangle-salted self-join──► candidate pairs  (skew-proof shuffle)
      ──mapInPandas Jaro-Winkler──► scored edges ≥ τ
      ──large-star/small-star CC──► clusters          (localCheckpoint rounds)

Shuffle inventory (what the plan pays at 10^12 docs): 1 for block sizes,
1 for the salted pair join, 1 per CC round (log-bounded), 1 for the final
label agg. Parse and scoring are shuffle-free map stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from addressit_spark.blocking import address_table, candidate_pairs
from addressit_spark.cluster import cluster_members, connected_components
from addressit_spark.checkpoint import StageStore
from addressit_spark.parse_stage import parse_spans
from addressit_spark.scoring import DEFAULT_TAU, match_edges, score_pairs


@dataclass
class PipelineResult:
    addresses: DataFrame
    pairs: DataFrame
    scored: DataFrame
    edges: DataFrame
    clusters: DataFrame
    dropped_blocks: DataFrame
    lineage: Dict[str, Dict[str, object]] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    locale: str = "en-US",
    tau: float = DEFAULT_TAU,
    heavy_threshold: int = 64,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    input_fingerprint: str = "",
) -> PipelineResult:
    """Run the full ER pipeline; snapshot each stage when checkpoint_dir set."""
    store = StageStore(spark, checkpoint_dir, resume=resume)

    addresses = store.run(
        "addresses",
        lambda: address_table(parse_spans(documents, locale)),
        input_fingerprint,
    )

    pairs_holder: Dict[str, DataFrame] = {}

    def _pairs() -> DataFrame:
        p, dropped = candidate_pairs(addresses, heavy_threshold=heavy_threshold)
        pairs_holder["dropped"] = dropped
        return p

    # pairs/scored are the 10^12-scale volumes: fused into the scoring pass
    # (never pinned) unless a snapshot dir makes them resume points.
    pairs = store.run("pairs", _pairs, input_fingerprint, materialize=False)
    dropped = pairs_holder.get("dropped")
    if dropped is None:
        # resumed run: recompute the (tiny) dropped-block metric table
        from addressit_spark.blocking import candidate_pairs as _cp

        _, dropped = _cp(addresses, heavy_threshold=heavy_threshold)

    scored = store.run(
        "scored",
        lambda: score_pairs(pairs, dims_from=addresses),
        input_fingerprint,
        materialize=False,
    )
    edges = store.run("edges", lambda: match_edges(scored, tau), input_fingerprint)
    clusters = store.run(
        "clusters",
        lambda: cluster_members(connected_components(edges), addresses),
        input_fingerprint,
    )
    store.write_lineage()

    return PipelineResult(
        addresses=addresses,
        pairs=pairs,
        scored=scored,
        edges=edges,
        clusters=clusters,
        dropped_blocks=dropped,
        lineage=store.lineage,
    )
