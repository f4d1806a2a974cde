"""Structured Streaming surface: incremental parse, dedup, block stats.

The reference is purely synchronous batch (no streaming anywhere), so this
module is the Spark-native *extension* a continuously-ingesting address
pipeline needs: the same parse pandas UDF runs unchanged inside micro-batches
(``parse_spans`` is stream-safe), late data is bounded with watermarks, and
state is handled by the engine:

* ``streaming_exact_dedup`` — watermark + ``dropDuplicates`` keyed on the
  normalized text hash: engine-managed dedup state, expired by the watermark
  (bounded memory at unbounded input).
* ``streaming_block_stats`` — watermarked sliding-window counts per blocking
  key: the skew diagnostic as a live metric.
* ``running_block_counts`` — custom stateful operator via
  ``applyInPandasWithState``: a running per-block span count + last-seen
  timestamp, with explicit state timeout — the
  pattern for any bespoke incremental ER state (e.g. per-block centroids).

All operators take an ``ingest_ts`` timestamp column (event time). Tests
drive them with ``trigger(availableNow=True)`` against parquet directories
and compare to the batch answers — streaming/batch parity is the invariant.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from addressit_spark.parse_stage import DOCUMENTS_SCHEMA, parse_spans

# documents(doc_id, spans) + event-time ingest_ts
STREAM_SCHEMA = StructType(
    list(DOCUMENTS_SCHEMA.fields) + [StructField("ingest_ts", TimestampType())]
)


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a documents parquet directory (input_hint shape + ts)."""
    return spark.readStream.schema(STREAM_SCHEMA).parquet(path)


def streaming_parse(documents: DataFrame, locale: str = "en-US") -> DataFrame:
    """The batch parse stage, unchanged, inside micro-batches."""
    return parse_spans(documents, locale)


def streaming_exact_dedup(
    documents: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Exact text dedup with engine-managed, watermark-expired state.

    Keyed on md5 of the concatenated text spans; duplicates arriving within
    the watermark horizon are dropped. Uses ``dropDuplicatesWithinWatermark``
    so the engine evicts per-key state once the key's event time falls behind
    the watermark — plain ``dropDuplicates`` on a non-event-time subset never
    evicts, which would grow state unboundedly on an unbounded stream.
    """
    keyed = documents.withColumn(
        "text_hash",
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.filter("spans", lambda s: s.getField("kind") == "text"),
                    lambda s: s.getField("text"),
                ),
            )
        ),
    )
    return keyed.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )


def streaming_block_stats(
    documents: DataFrame,
    locale: str = "en-US",
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed block-key counts: the skew diagnostic as a live stream."""
    addrs = _addresses_with_ts(streaming_parse(documents, locale))
    return (
        addrs.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("win"), "block_key")
        .agg(F.count(F.lit(1)).alias("block_size"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "block_key",
            "block_size",
        )
    )


def streaming_session_stats(
    documents: DataFrame,
    locale: str = "en-US",
    gap: str = "45500 milliseconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-block ingest sessions via engine-managed ``session_window`` state.

    The streaming twin of the batch ``operators.temporal.sessionize``:
    gap-based sessions of parse activity per blocking key, with merge logic
    and state eviction handled by the engine (windows close once the
    watermark passes their gap horizon — bounded state on an unbounded
    stream). Boundary semantics differ from the batch operator by the
    half-open window convention: ``session_window`` merges events strictly
    closer than ``gap``, the batch sessionizer also merges at exactly
    ``gap`` — pick a gap between the data's timestamp quanta (e.g. a
    fractional-second gap on whole-second data) and the two agree exactly
    (asserted in tests). ``session_end`` is last event + gap (the engine's
    convention), so batch parity compares starts/counts.
    """
    addrs = _addresses_with_ts(streaming_parse(documents, locale))
    return (
        addrs.withWatermark("ingest_ts", watermark)
        .groupBy(F.session_window("ingest_ts", gap).alias("sw"), "block_key")
        .agg(F.count(F.lit(1)).alias("n_spans"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "block_key",
            "n_spans",
        )
    )


def _addresses_with_ts(parsed_spans: DataFrame) -> DataFrame:
    """address_table projection that keeps the event-time column."""
    a = parsed_spans.where(
        (F.col("kind") == "text")
        & F.col("address.street").isNotNull()
        & (F.col("address.street") != "")
        & (F.size("address.regions") > 0)
    )
    street_norm = F.upper(F.col("address.street"))
    toks = F.split(street_norm, " ")
    n = F.size(toks)
    street_name = (
        F.when(n > 1, F.concat_ws(" ", F.slice(toks, 1, n - 1)))
        .otherwise(F.element_at(toks, 1))
    )
    locality = F.upper(F.element_at("address.regions", 1))
    return a.select(
        F.concat_ws("#", "doc_id", "pos").alias("uid"),
        "ingest_ts",
        F.concat_ws("|", street_name, F.soundex(locality)).alias("block_key"),
    )


_RUNNING_SCHEMA = StructType(
    [
        StructField("block_key", StringType()),
        StructField("running_count", LongType()),
        StructField("last_seen", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("count", LongType())])


def running_block_counts(
    documents: DataFrame,
    locale: str = "en-US",
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful operator: running span count per blocking key.

    ``applyInPandasWithState`` with processing-time timeout — the skeleton
    for bespoke incremental ER state. Emits one row per (block, micro-batch)
    with the cumulative count.
    """
    addrs = _addresses_with_ts(streaming_parse(documents, locale))

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_new = 0
        last = None
        for pdf in pdfs:
            n_new += len(pdf)
            m = pdf["ingest_ts"].max()
            last = m if last is None else max(last, m)
        (prev,) = state.get if state.exists else (0,)
        total = prev + n_new
        state.update((total,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"block_key": [key[0]], "running_count": [total], "last_seen": [last]}
        )

    return addrs.groupBy("block_key").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def incremental_er(
    documents_stream: DataFrame,
    snapshot_addresses: DataFrame,
    state_dir: str,
    edges_dir: str,
    checkpoint_dir: str,
    locale: str = "en-US",
    tau: Optional[float] = None,
    heavy_threshold: int = 256,
    max_block_size: int = 100_000,
    clusters_dir: Optional[str] = None,
    snapshot_labels: Optional[DataFrame] = None,
):
    """Streaming ER: each micro-batch runs the UNCHANGED batch kernels
    (``parse_spans`` → ``address_table`` → ``score_pairs_fused`` →
    ``match_edges``) against the accumulated address state via
    ``foreachBatch``.

    ``state_dir`` is seeded with a static snapshot of the existing address
    table and grows by each batch's new addresses; a batch scores the
    self-join of (its new addresses ∪ the accumulated addresses in blocks
    the batch touches) and keeps only edges involving ≥1 new span — so
    every cross-batch pair is scored exactly once, when its later member
    arrives. Match edges append to ``edges_dir``.

    Exact-parity invariant (asserted in tests): for any split of a corpus
    into snapshot + stream batches,
    ``full_batch_edges == snapshot_self_edges ∪ appended_edges``. Identical
    scores too — the fused scorer's similarity values depend only on the
    surface pair, never on the scoring universe. One documented exception:
    a block that crosses ``max_block_size`` mid-stream. The batch run drops
    the whole oversized block (with metrics); the streaming run has already
    committed edges for the block's under-cap prefix and cannot retract
    them, so streamed output keeps a *prefix* of that block's edges. Parity
    is exact whenever no accumulated block exceeds the cap (the tested
    regime, and the intended one — oversized blocks are dirty-data fallout
    either way).

    Restart-safe by construction: every write — the ``batch_id=-1``
    snapshot seed included — lands in its own partition via dynamic
    partition overwrite, so a restart re-seeds only the ``-1`` partition
    (idempotently; accumulated batches are never truncated, and a crash
    mid-seed self-heals) and an at-least-once replay of batch N overwrites
    its own partition instead of appending duplicates — edges, state, and
    labels stay exactly-once without an external transaction log. (On Iceberg the same property comes from REPLACE
    PARTITIONS semantics.)

    At 10^12-doc scale ``state_dir`` is the same partitioned store the batch
    pipeline checkpoints to (Iceberg in production — append = snapshot
    commit); the per-batch read prunes to touched blocks only, so batch cost
    scales with batch size × block density, not corpus size.

    ``clusters_dir`` (optional) additionally maintains LIVE cluster labels:
    after each batch's edges commit, :func:`~addressit_spark.cluster.
    incremental_components` folds them into the previous batch's labeling
    via the contracted graph (prior clusters as stars ∪ new edges) — the
    per-batch clustering cost is O(nodes-with-edges + batch edges), never a
    recluster of the full edge log, and the result equals a batch CC over
    all edges so far (asserted in tests). Labels land in a ``batch_id=N``
    partition (same idempotent dynamic-overwrite scheme as edges/state;
    ``batch_id=-1`` seeds from ``snapshot_labels``); the current labeling is
    the max-``batch_id`` partition. Pass ``snapshot_labels`` (the snapshot's
    own CC output) so cross-batch merges connect into snapshot-internal
    clusters — without it, labels cover only stream-edge-connected nodes.

    Returns the started ``StreamingQuery``; callers own ``awaitTermination``.
    """
    from addressit_spark.blocking import address_table
    from addressit_spark.scoring import DEFAULT_TAU, match_edges, score_pairs_fused

    eff_tau = DEFAULT_TAU if tau is None else tau

    # seed the batch_id=-1 partition by DYNAMIC overwrite, not
    # mode("ignore"): ignore skips on bare directory existence, so a crash
    # mid-seed would leave a partial partition that a restart silently
    # accepts forever. Dynamic overwrite only ever touches the -1 partition
    # (accumulated batches are untouched on restart) and rewriting the
    # deterministic seed is idempotent — a partial seed self-heals.
    def _seed(df: DataFrame, path: str) -> None:
        (
            df.withColumn("batch_id", F.lit(-1).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    _seed(snapshot_addresses, state_dir)
    if clusters_dir is not None and snapshot_labels is not None:
        _seed(snapshot_labels.select("uid", "component"), clusters_dir)

    def _write_batch(df: DataFrame, path: str, batch_id: int) -> None:
        # dynamic overwrite of exactly this batch's partition: idempotent
        # under Structured Streaming's at-least-once foreachBatch replay
        (
            df.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    def process(batch_docs: DataFrame, batch_id: int) -> None:
        spark = batch_docs.sparkSession
        new_addrs = address_table(
            parse_spans(batch_docs.drop("ingest_ts"), locale)
        ).localCheckpoint(eager=True)
        if new_addrs.limit(1).count() == 0:
            return
        accumulated = spark.read.parquet(state_dir).where(
            F.col("batch_id") < batch_id
        )
        touched = accumulated.join(
            new_addrs.select("block_key").distinct(), "block_key", "left_semi"
        )
        universe = new_addrs.unionByName(touched.select(*new_addrs.columns))
        scored, _ = score_pairs_fused(
            universe, heavy_threshold=heavy_threshold, max_block_size=max_block_size
        )
        edges = match_edges(scored, eff_tau)
        new_uids = new_addrs.select(F.col("uid").alias("_nu"))
        inc = (
            edges.join(new_uids, edges.src == F.col("_nu"), "left_semi")
            .unionByName(edges.join(new_uids, edges.dst == F.col("_nu"), "left_semi"))
            .distinct()
        )
        # order matters: commit this batch's edges BEFORE growing the state,
        # so a replay after a crash between the writes re-reads the same
        # accumulated set it scored against (the batch_id filter above also
        # shields a replayed batch from its own half-written state rows).
        # inc is pinned first: the edges write, the clustering fold, and
        # its eager internal checkpoints would otherwise each re-execute
        # the whole accumulated-state scoring DAG.
        inc = inc.localCheckpoint(eager=True)
        _write_batch(inc, edges_dir, batch_id)
        if clusters_dir is not None:
            from pyspark.errors import AnalysisException

            from addressit_spark.cluster import incremental_components

            # previous labeling = the max-batch_id partition below this
            # batch; inputs are all < batch_id so a replayed batch folds the
            # same prior labels — the labels write stays idempotent. ONLY a
            # missing/empty directory (cold start without snapshot_labels)
            # may downgrade to an empty prior; any other failure must
            # propagate so the stream retries the batch — swallowing a
            # transient read error here would silently rebuild the labeling
            # from this batch alone.
            try:
                prior = spark.read.parquet(clusters_dir).where(
                    F.col("batch_id") < batch_id
                )
            except AnalysisException:  # PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA
                prior = None
            last = (
                prior.agg(F.max("batch_id")).collect()[0][0]
                if prior is not None
                else None
            )
            if last is None:
                prev_labels = spark.createDataFrame(
                    [], "uid string, component string"
                )
            else:
                prev_labels = prior.where(F.col("batch_id") == last).select(
                    "uid", "component"
                )
            _write_batch(
                incremental_components(prev_labels, inc), clusters_dir, batch_id
            )
            # each partition is a FULL labeling — partitions in (last,
            # batch_id) are superseded the instant this batch's commits, so
            # prune them: the directory holds the seed, at most the prior
            # fold, and the current one, instead of one full copy per
            # micro-batch. Replay safety: a replayed batch N only ever
            # reads max(batch_id < N), which pruning never removes.
            if last is not None and last >= 0:
                jvm = spark._jvm
                hpath = jvm.org.apache.hadoop.fs.Path(clusters_dir)
                fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
                for st in fs.listStatus(hpath):
                    name = st.getPath().getName()
                    if name.startswith("batch_id="):
                        bid = int(name.split("=", 1)[1])
                        if 0 <= bid < last:
                            fs.delete(st.getPath(), True)
        _write_batch(new_addrs, state_dir, batch_id)

    return (
        documents_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
