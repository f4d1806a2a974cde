"""End-to-end ER pipeline: parse → block → score → cluster, with checkpoints.

The north_rule dataflow over the input_hint table shape::

    documents(doc_id, spans[]) ──posexplode──► spans
      ──pandas_udf parse──► address structs          (Arrow batch boundary)
      ──normalize──► blocking keys (street name + soundex(locality))
      ──triangle-salted slim self-join──► scored pairs ≥ τ
        (interned int surface ids in the shuffle; Jaro-Winkler/Levenshtein
         computed once per distinct surface pair, broadcast back)
      ──large-star/small-star CC──► clusters          (localCheckpoint rounds)

Shuffle inventory (what the plan pays at 10^12 docs): 1 for block sizes,
1 for the salted pair join (slim int payloads), 1 per CC round
(log-bounded), 1 for the final label agg. Parse and scoring are
shuffle-free map stages; the surface-sim dims are tiny broadcasts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from addressit_spark.blocking import address_table
from addressit_spark.cluster import cluster_members, connected_components
from addressit_spark.checkpoint import StageStore
from addressit_spark.parse_stage import parse_spans
from addressit_spark.scoring import (
    DEFAULT_TAU,
    match_edges,
    score_pairs_fused,
    surface_sim_map,
)


@dataclass
class PipelineResult:
    addresses: DataFrame
    pairs: DataFrame
    scored: DataFrame
    edges: DataFrame
    clusters: DataFrame
    dropped_blocks: DataFrame
    lineage: Dict[str, Dict[str, object]] = field(default_factory=dict)
    pair_count_obs: Optional[Observation] = None

    def candidate_pair_count(self) -> int:
        """Match-count metric without a second pass over the pair volume.

        Preference order: the snapshot lineage row count (pairs stage was
        written to parquet), then the ``Observation`` collected on the same
        execution that materialized the edges stage, then — only if the
        fused plan never executed in this process (fully resumed run with
        no pairs snapshot metrics) — an explicit ``count()``. At 10^12
        pairs the first two are free; the fallback is a full pass and only
        exists for resumed runs whose snapshots predate lineage metrics.
        """
        rows = self.lineage.get("pairs", {}).get("rows")
        if isinstance(rows, int):
            return rows
        if self.pair_count_obs is not None and not self.lineage.get(
            "edges", {}
        ).get("resumed", False):
            return int(self.pair_count_obs.get["n_pairs"])
        return self.pairs.count()


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    locale: str = "en-US",
    tau: float = DEFAULT_TAU,
    heavy_threshold: int = 256,
    max_block_size: int = 100_000,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    input_fingerprint: str = "",
    max_block_surfaces: "int | None | str" = "auto",
) -> PipelineResult:
    """Run the full ER pipeline; snapshot each stage when checkpoint_dir set.

    ``max_block_surfaces`` (default ``"auto"`` → ``heavy_threshold``) caps the
    per-block DISTINCT surface count fed to the sim-dim cross: a degenerate
    block under the row cap can't blow up the dim stage or the broadcast sim
    table, and its skipped pairs score via the conservative miss-low default.
    """
    if max_block_surfaces == "auto":
        max_block_surfaces = heavy_threshold
    store = StageStore(spark, checkpoint_dir, resume=resume)

    def _fp(**params: object) -> str:
        # stage fingerprint = input identity + the parameters that stage's
        # output depends on, so changing e.g. max_block_size between resumed
        # runs recomputes the affected snapshots instead of silently reusing
        # tables built under the old parameters (StageStore verifies this
        # on resume).
        return input_fingerprint + "|" + ",".join(
            "%s=%r" % kv for kv in sorted(params.items())
        )

    addresses = store.run(
        "addresses",
        lambda: address_table(parse_spans(documents, locale)),
        _fp(locale=locale),
    )

    # the (tiny) surface-similarity dim is its own snapshot stage: built
    # once, resumed from parquet, broadcast into every scoring pass. The
    # same block-size cap candidate generation applies is passed here —
    # blocks it drops never consume their sim rows, and without the cap one
    # dirty mega-block would pay O(distinct_surfaces²) in this stage.
    sim_dims = store.run(
        "sim_dims",
        lambda: surface_sim_map(
            addresses,
            max_block_size=max_block_size,
            max_block_surfaces=max_block_surfaces,
        ),
        _fp(
            locale=locale,
            max_block_size=max_block_size,
            max_block_surfaces=max_block_surfaces,
        ),
    )

    dropped_holder: Dict[str, DataFrame] = {}
    obs_holder: Dict[str, Observation] = {}

    def _scored() -> DataFrame:
        # blocking + scoring fused: the 10^12-row salted shuffle carries
        # interned int surface ids, never the feature strings
        sc, dropped = score_pairs_fused(
            addresses,
            heavy_threshold=heavy_threshold,
            max_block_size=max_block_size,
            sims=sim_dims,
        )
        dropped_holder["dropped"] = dropped
        # candidate-pair count rides the first execution of this plan (the
        # edges materialization) as a CollectMetrics node — the match-count
        # metric never costs a second pass over the pair volume
        obs = Observation()
        obs_holder["pairs"] = obs
        return sc.observe(obs, F.count(F.lit(1)).alias("n_pairs"))

    score_fp = _fp(
        locale=locale,
        heavy_threshold=heavy_threshold,
        max_block_size=max_block_size,
        max_block_surfaces=max_block_surfaces,
    )
    # pairs/scored are the 10^12-scale volumes: fused into the scoring pass
    # (never pinned) unless a snapshot dir makes them resume points.
    scored = store.run("scored", _scored, score_fp, materialize=False)
    dropped = dropped_holder.get("dropped")
    if dropped is None:
        # resumed run: recompute the (tiny) dropped-block metric table with
        # the same cap scoring used, or the metric misreports what was kept
        from addressit_spark.blocking import candidate_pairs as _cp

        _, dropped = _cp(
            addresses,
            heavy_threshold=heavy_threshold,
            max_block_size=max_block_size,
        )

    # the candidate-pair view (evaluation universe) is a projection of the
    # scored stage — same fused plan, no second pair generation
    pairs = store.run(
        "pairs",
        lambda: scored.select("uid_a", "uid_b", "block_key"),
        score_fp,
        materialize=False,
    )
    edges = store.run(
        "edges", lambda: match_edges(scored, tau), _fp(
            locale=locale,
            heavy_threshold=heavy_threshold,
            max_block_size=max_block_size,
            max_block_surfaces=max_block_surfaces,
            tau=tau,
        )
    )
    clusters = store.run(
        "clusters",
        lambda: cluster_members(connected_components(edges), addresses),
        _fp(
            locale=locale,
            heavy_threshold=heavy_threshold,
            max_block_size=max_block_size,
            max_block_surfaces=max_block_surfaces,
            tau=tau,
        ),
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
        pair_count_obs=obs_holder.get("pairs"),
    )
