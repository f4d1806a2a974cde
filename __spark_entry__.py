"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full ER pipeline (parse → block → score →
cluster) on the synthesized interleaved-documents corpus + a parse pass over
the driver's flat documents table at sf0.001.

``queries()`` — one entry per implemented operator family (SURVEY.md §2 +
the training-data operator suite); each callable takes (spark, sf_dir).

``oracle_sql()`` — DuckDB-runnable ANSI SQL for every SQL-expressible query
(same aliases, same rounding). Non-SQL-expressible ops (pandas-UDF parse,
LSH/minhash/simhash with engine-specific hashes, the iterative ER pipeline)
are rows-only by design.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from addressit_spark.blocking import address_table, block_stats
from addressit_spark.cluster import connected_components
from addressit_spark.evaluation import bcubed, labeled_pairs, pairwise_f1
from addressit_spark.operators.dedup import (
    _perm_params,
    choose_survivors,
    exact_dup_groups,
    minhash_dup_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from addressit_spark.operators.multimodal import (
    decode_and_featurize,
    extract_frames,
    frame_sample_plan,
    resize_images,
    with_media_meta,
)
from addressit_spark.operators.sample import (
    assign_split,
    rate_threshold,
    stratified_hash_sample,
)
from addressit_spark.operators.similarity import (
    brute_force_topk,
    cosine_col,
    embedding_near_dup_pairs,
    ivf_scan_stats,
    ivf_topk,
    lsh_scan_stats,
    lsh_topk,
)
from addressit_spark.sources.embeddings import synth_clustered_embeddings
from addressit_spark.sources.labeled_dups import synth_labeled_dup_corpus
from addressit_spark.util import reuse
from addressit_spark.operators.profile import profile
from addressit_spark.operators.temporal import asof_join, session_stats
from addressit_spark.operators.text import (
    _LANG_PROFILES,
    BPE_TOKEN_PATTERN,
    STOPWORDS,
    fingerprint,
    tfidf_top_terms,
    with_bpe_token_count,
    with_lang_id,
    with_token_stats,
    quality_score,
)
from addressit_spark.parse_stage import (
    format_address_col,
    make_parse_udf,
    normalize_documents,
    parse_spans,
)
from addressit_spark.pipeline import run_pipeline
from addressit_spark.sources.corpus import documents_view, synth_corpus, truth_view

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# deterministic corpus size per scale factor (entities)
_ENTITIES_BY_SF = {"sf0.001": 400, "sf0.01": 1500, "sf0.1": 8000}


def _entities_for(sf_dir: str) -> int:
    return _ENTITIES_BY_SF.get(os.path.basename(sf_dir.rstrip("/")), 1000)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, name + ".parquet"))


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ER pipeline on the interleaved corpus + sf0.001 parse pass."""
    docs_flat = _t(spark, DEFAULT_SF_DIR, "documents")
    parsed_flat = parse_spans(docs_flat)
    n_docs = docs_flat.count()
    n_parsed = parsed_flat.where(F.col("address").isNotNull()).count()

    corpus = synth_corpus(spark, _entities_for(DEFAULT_SF_DIR), seed=42)
    res = run_pipeline(spark, documents_view(corpus))
    f1 = pairwise_f1(labeled_pairs(res.pairs, truth_view(corpus)), res.clusters)
    b3 = bcubed(res.clusters, truth_view(corpus))

    rows = [
        ("sf0001_documents_rows", float(n_docs)),
        ("sf0001_parsed_spans", float(n_parsed)),
        ("er_address_spans", float(res.addresses.count())),
        ("er_candidate_pairs", float(res.pairs.count())),
        ("er_match_edges", float(res.edges.count())),
        ("er_clusters", float(res.clusters.select("component").distinct().count())),
        ("er_pairwise_f1", float(f1["f1"])),
        ("er_pairwise_precision", float(f1["precision"])),
        ("er_pairwise_recall", float(f1["recall"])),
        ("er_bcubed_f1", float(b3["f1"])),
        ("er_bcubed_precision", float(b3["precision"])),
        ("er_bcubed_recall", float(b3["recall"])),
    ]
    return spark.createDataFrame(rows, "metric string, value double")


# ---------------------------------------------------------------------------
# SQL-oracle-checked queries
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 45)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
        .orderBy("r_name", "n_name")
    )


def q_events_user_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 4).alias("top_value"),
        )
        .orderBy("user_id")
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join — the resume-subtraction primitive (SURVEY §2.9 semi/anti)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region → nation → total) over order revenue."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


def q_events_order_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event ← the user's most recent order at-or-before it.

    The single-shuffle tagged-union as-of operator (operators/temporal.py) —
    no range-join explosion. Event times are shifted back 26 years so they
    interleave with the order-date era (events are January-only, so the
    calendar shift is identical in Spark and DuckDB). The oracle replays it
    with DuckDB's native ``ASOF LEFT JOIN``; the right side is deduped to
    max o_orderkey per (custkey, orderdate) in BOTH engines — the operator's
    ``tiebreak`` picks exactly that row, while DuckDB ASOF would tie-break
    arbitrarily.
    """
    e = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") < 50)
        .withColumn("ets", F.col("ts") - F.expr("INTERVAL 26 YEARS"))
    )
    o = _t(spark, sf_dir, "orders")
    j = asof_join(
        e,
        o,
        [("user_id", "o_custkey")],
        "ets",
        "o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round("o_totalprice", 2).alias("last_totalprice"),
    ).orderBy("event_id")


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (2h) of the event stream, per-session rollup."""
    s = session_stats(
        _t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        7200.0,
        value_col="value",
        order_tiebreak="event_id",
    )
    return s.select(
        "user_id",
        "session_seq",
        "n_events",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.round("duration_s", 4).alias("duration_s"),
        "sum_value",
    ).orderBy("user_id", "session_seq")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_user_event_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed set ops: UNION / INTERSECT / EXCEPT over user cohorts.

    Purchasers vs error-encounterers — the three set operators each run as
    a hash aggregate/join on the (already tiny, pre-distinct'd) key sets,
    tagged and stacked into one result so a single oracle covers all three.
    """
    e = _t(spark, sf_dir, "events")
    purch = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    err = e.where(F.col("event_type") == "error").select("user_id").distinct()
    tagged = [
        purch.union(err).distinct().select(F.lit("any").alias("tag"), "user_id"),
        purch.intersect(err).select(F.lit("both").alias("tag"), "user_id"),
        purch.subtract(err).select(F.lit("purchase_only").alias("tag"), "user_id"),
    ]
    out = tagged[0].unionByName(tagged[1]).unionByName(tagged[2])
    return out.orderBy("tag", "user_id")


def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix.

    Explicit pivot values keep the plan single-pass (no distinct-values
    pre-scan) — the form that scales; absent combos are coalesced to 0 to
    match the SQL conditional-aggregation oracle.
    """
    e = _t(spark, sf_dir, "events")
    p = e.groupBy("user_id").pivot("event_type", _EVENT_TYPES).agg(
        F.count(F.lit(1))
    )
    return p.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    ).orderBy("user_id")


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction: schema-projected ``from_json`` (JVM-side,
    no UDF), aggregated per event type — the semi-structured-column idiom."""
    e = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k LONG").getField("k")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("n_null"),
        )
        .orderBy("event_type")
    )


def q_events_in_order_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events landing inside the 7-day window after each of
    the same user's orders.

    Equi-key (user) + range predicate — Catalyst plans the equality as the
    join key and evaluates the BETWEEN as a join condition, so the expansion
    is bounded by true matches (no cross product). Events are shifted into
    the order-date era as in ``events_order_asof``.
    """
    e = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") < 30)
        .withColumn("ets", F.col("ts") - F.expr("INTERVAL 26 YEARS"))
    )
    o = _t(spark, sf_dir, "orders")
    j = e.join(
        o,
        (e.user_id == o.o_custkey)
        & (e.ets >= o.o_orderdate)
        & (e.ets < F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")),
    )
    return (
        j.groupBy("o_orderkey", "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("o_orderkey")
    )


def q_events_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the pivoted per-user type counts back to long form —
    wide→long reshaping without touching the raw table again."""
    p = q_events_type_pivot(spark, sf_dir)
    return (
        p.unpivot(
            "user_id",
            [f"n_{t}" for t in _EVENT_TYPES],
            "event_type",
            "n_events",
        )
        .where(F.col("n_events") > 0)
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .orderBy("user_id", "event_type")
    )


def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table — the pre-ingest validation
    pass (counts, nulls, distincts, lexical bounds) in one scan."""
    d = _t(spark, sf_dir, "documents")
    return profile(d, ["doc_id", "lang", "source", "n_chars"]).orderBy("column")


def q_events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3σ outliers per event type via window stats — anomaly triage over the
    event stream, single shuffle on the type key."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    mean = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    return (
        e.withColumn("_thr", mean + 3 * sd)
        .where(F.col("value") > F.col("_thr"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round("_thr", 4).alias("threshold"),
        )
        .orderBy("event_id")
    )


def q_doc_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles of document length per language.

    ``F.percentile`` (exact, JVM-side) ≡ DuckDB ``quantile_cont`` — both
    compute lower + α·(upper − lower) on the sorted values.
    """
    d = _t(spark, sf_dir, "documents")
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.round(F.percentile("n_chars", p), 4).alias(name)
                for name, p in qs.items()
            ],
        )
        .orderBy("lang")
    )


def q_doc_len_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch twin of ``doc_len_quantiles`` (rows-only: the
    Greenwald-Khanna approximation is engine-specific).

    At 100 TB the exact percentile's per-group sort is replaced by a
    bounded-size mergeable sketch (map-side partials); accuracy vs the
    exact twin is asserted in tests.
    """
    d = _t(spark, sf_dir, "documents")
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.percentile_approx("n_chars", p, 10_000).alias(name)
                for name, p in qs.items()
            ],
        )
        .orderBy("lang")
    )


def q_doc_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct content counts per source — the oracle twin of the
    HLL sketch query ``doc_distinct_approx``."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_distinct"),
        )
        .orderBy("source")
    )


def q_doc_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-content sketch per source (rows-only: the estimate is
    engine-specific).

    At 100 TB this replaces the exact count's full shuffle of every distinct
    hash with fixed-size mergeable sketches (map-side partials, bytes per
    group ~1.5 KB at rsd=2%); accuracy is checked against the exact twin in
    tests.
    """
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct(F.md5("text"), rsd=0.02).alias(
                "n_distinct_approx"
            ),
        )
        .orderBy("source")
    )


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_token_stats(_t(spark, sf_dir, "documents"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").alias("total_tokens"),
            F.round(F.avg("token_count"), 4).alias("avg_tokens"),
            F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
        )
        .orderBy("lang")
    )


def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language BPE-ish token budget (the training-data sizing query)."""
    d = with_bpe_token_count(_t(spark, sf_dir, "documents"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bpe_token_count").alias("total_bpe_tokens"),
            F.round(F.avg("bpe_token_count"), 4).alias("avg_bpe_tokens"),
        )
        .orderBy("lang")
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = quality_score(_t(spark, sf_dir, "documents"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.sum(
                F.when(F.col("quality_score") >= 0.99, 1).otherwise(0)
            ).alias("n_high_quality"),
        )
        .orderBy("source")
    )


def q_lang_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single scan: the grand total comes from an unpartitioned window over the
    # (tiny, already-aggregated) per-lang counts, not a second driver count()
    d = _t(spark, sf_dir, "documents")
    agg = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        agg.withColumn("share", F.round(F.col("n_docs") / total, 6))
        .orderBy("lang")
    )


def q_exact_dup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dup_groups(_t(spark, sf_dir, "documents")).orderBy("text_hash")


def q_exact_dup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the first-8-token prefix (head containment)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
    prefix = F.concat_ws(" ", F.slice(toks, 1, 8))
    keyed = d.select(F.md5(prefix).alias("prefix_hash"), "doc_id")
    return (
        keyed.groupBy("prefix_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_copies") > 1)
        .orderBy("prefix_hash")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, min_jaccard=0.2
    ).orderBy("id_a", "id_b")


def q_ngram_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup document clusters: Jaccard pair graph → large-star/small-star CC.

    Oracles the flagship iterative connected-components kernel itself
    (cluster.py) against a DuckDB recursive-CTE transitive closure — the
    edge set is the same SQL-expressible n-gram Jaccard graph as
    ``ngram_jaccard``, so every divergence in the CC fixpoint (labeling,
    star-contraction, long-id relabel pass) shows up as a value-hash miss.
    """
    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, min_jaccard=0.2
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return (
        connected_components(edges)
        .select(F.col("uid").alias("doc_id"), F.col("component").alias("cluster_id"))
        .orderBy("doc_id")
    )


def q_doc_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table, top 25 — the n-gram statistics pass a
    tokenizer-training pipeline runs over the corpus. Pure array exprs
    (no UDF): adjacent-token pairs via a sequence transform, exploded and
    counted; ties broken lexically for determinism."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "__toks",
        F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != ""),
    )
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.expr(
            "transform(sequence(1, size(__toks)-1),"
            " i -> concat(element_at(__toks, i), ' ', element_at(__toks, i+1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # distributed top-k (TakeOrderedAndProject) over the full count table —
    # a global row_number window here would sort every distinct bigram in
    # ONE task; the rank window below runs on the surviving 25 rows only
    top = counted.orderBy(F.col("n").desc(), "bigram").limit(25)
    w = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "bigram", "n")
        .orderBy("rank")
    )


def q_doc_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf, deterministic ties)."""
    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3).orderBy(
        "doc_id", "rank"
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: near-dup fingerprints straddling splits.

    Composes ``assign_split`` with the content fingerprints — a group whose
    normalized 64-char prefix hash appears in more than one split is
    training data leaking into eval. The decontamination primitive every
    training pipeline runs before a split ships.
    """
    d = assign_split(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        [("train", 0.8), ("val", 0.1), ("test", 0.1)],
        seed=42,
    )
    return (
        fingerprint(d)
        .groupBy("fp_prefix")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("example_id"),
        )
        .where(F.col("n_splits") > 1)
        .orderBy("fp_prefix")
    )


def q_doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (hash-keyed on doc_id)."""
    d = _t(spark, sf_dir, "documents")
    s = assign_split(
        d, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], seed=42
    )
    return (
        s.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic corpus re-weighting (en 50%, zh 25%, rest 10%)."""
    d = _t(spark, sf_dir, "documents")
    s = stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.5, "zh": 0.25}, default_rate=0.1, seed=7
    )
    return s.select("doc_id", "lang").orderBy("doc_id")


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries_df, k=10).orderBy("query_id", "rank")


def q_embedding_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cos ≥ 0.99) via full pair scan."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.99)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# rows-only queries (not ANSI-SQL-expressible: pandas-UDF kernels, LSH with
# engine-specific hashes, iterative CC)
# ---------------------------------------------------------------------------


def q_parse_udf_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from addressit_spark.parity_cases import ALL_REFERENCE_CASES

    inputs = sorted({t for t, loc, _ in ALL_REFERENCE_CASES if loc == "en-US"})
    df = spark.createDataFrame([(t,) for t in inputs], ["input"])
    a = df.select("input", make_parse_udf("en-US")(F.col("input")).alias("a"))
    return a.select(
        "input", "a.unit", "a.number", "a.street", "a.state", "a.postalcode",
        # O17 toString, driver-visible: the JVM column twin of
        # kernel.to_string (/root/reference/address.js:313-328); twin≡kernel
        # equality is golden-tested in tests/test_parse_stage.py
        format_address_col(F.col("a")).alias("formatted"),
    ).orderBy("input")


def q_er_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER pipeline stats: cluster-size histogram UNION block-size histogram.

    One driver row covers both iterative-CC output shape and the blocking
    skew diagnostic (both are (bucket, n) histograms, tagged by ``stat``).
    The block histogram reuses the pipeline's own parsed address stage —
    no second parse pass.
    """
    corpus = synth_corpus(spark, _entities_for(sf_dir), seed=42)
    res = run_pipeline(spark, documents_view(corpus))
    clusters = (
        res.clusters.groupBy("component")
        .agg(F.count(F.lit(1)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("cluster_size").alias("stat"), "bucket", "n")
    )
    blocks = block_stats(res.addresses).select(
        F.lit("block_size").alias("stat"),
        F.col("block_size").alias("bucket"),
        F.col("n_blocks").alias("n"),
    )
    return clusters.unionByName(blocks).orderBy("stat", "bucket")


def q_er_block_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = synth_corpus(spark, _entities_for(sf_dir), seed=42)
    addrs = address_table(parse_spans(documents_view(corpus)))
    return block_stats(addrs)


def q_minhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_dup_pairs(
        _t(spark, sf_dir, "documents"), k=64, bands=16, n=3, min_est_jaccard=0.4
    ).orderBy("id_a", "id_b")


def q_minhash_dups_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verifiable minhash LSH twin: md5 shingle hash, value-string buckets.

    Same banded algorithm as ``minhash_dups`` with every engine-specific hash
    swapped for ANSI-reproducible pieces, so DuckDB replays it bit-for-bit
    (signatures, candidate set, and estimates all oracle-checked).
    """
    return minhash_dup_pairs(
        _t(spark, sf_dir, "documents"),
        k=16,
        bands=4,
        n=3,
        min_est_jaccard=0.5,
        portable=True,
    ).orderBy("id_a", "id_b")


def q_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_dup_pairs(_t(spark, sf_dir, "documents"), max_hamming=6).orderBy(
        "id_a", "id_b"
    )


def q_simhash_dups_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verifiable simhash twin: 60-bit md5 token hash, no UDF anywhere."""
    return simhash_dup_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3, portable=True
    ).orderBy("id_a", "id_b")


def q_dedup_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consensus near-dup decisions: how many independent detectors agree.

    A production dedup stage rarely trusts one signal; this emits, per
    candidate pair, which of the three portable detectors (n-gram Jaccard,
    banded MinHash, SimHash) flagged it and the agreement count — the
    evidence table a keep/drop policy thresholds on. Reuses the three
    oracle-backed driver queries VERBATIM (identical parameters), so the
    DuckDB oracle composes their oracle bodies the same way and the whole
    composition is value-checked end-to-end.
    """
    parts = [
        q_ngram_jaccard(spark, sf_dir)
        .select("id_a", "id_b")
        .withColumn("src", F.lit("ngram")),
        q_minhash_dups_md5(spark, sf_dir)
        .select("id_a", "id_b")
        .withColumn("src", F.lit("minhash")),
        q_simhash_dups_md5(spark, sf_dir)
        .select("id_a", "id_b")
        .withColumn("src", F.lit("simhash")),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_signals"),
            F.max(F.when(F.col("src") == "ngram", 1).otherwise(0))
            .cast("long")
            .alias("has_ngram"),
            F.max(F.when(F.col("src") == "minhash", 1).otherwise(0))
            .cast("long")
            .alias("has_minhash"),
            F.max(F.when(F.col("src") == "simhash", 1).otherwise(0))
            .cast("long")
            .alias("has_simhash"),
        )
        .orderBy("id_a", "id_b")
    )


# ANN parameters shared by the rows-only top-k queries and the ann_recall
# floor check. The synthetic embeddings are near-uniform random (top-10
# neighbors at cos ≈ 0.2-0.5) — the adversarial case for hyperplane LSH, so
# decent recall requires probing a large fraction at toy scale (~half the
# table here); on clustered real embeddings the same margin-aware multi-probe
# + multi-table machinery reaches high recall at small fractions. The floors
# are regression contracts on deterministic data, not absolute quality claims.
LSH_PARAMS = dict(k=10, bits=6, probes=10, tables=3)
IVF_PARAMS = dict(k=10, n_centroids=16, nprobe=6)
ANN_RECALL_FLOORS = {"ivf": 0.8, "lsh": 0.6}

# Clustered (realistic) ANN contract: on a deterministic Gaussian-mixture
# table (the shape of real text/image embeddings — see sources/embeddings),
# both methods must reach recall@10 ≥ 0.9 while scanning ≤ 10% of the
# brute-force pair count. Measured at these params: IVF recall 1.00 @ 8.0%
# scanned, LSH 0.96 @ 6.5% — the multi-probe/IVF machinery earning its keep
# on data with structure, vs the near-uniform floors above.
CLUSTERED_EMB = dict(n=2000, dim=32, n_clusters=25, sigma=0.05, seed=7)
CLUSTERED_LSH = dict(k=10, bits=8, probes=4, tables=2)
CLUSTERED_IVF = dict(k=10, n_centroids=25, nprobe=2)
CLUSTERED_RECALL_FLOOR = 0.9
CLUSTERED_SCAN_CAP = 0.10


def q_ann_recall_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality on realistic clustered vectors: recall AND scan bounds.

    The testdata embeddings are near-uniform (adversarial; see the floor
    comment above). This query runs the SAME lsh_topk/ivf_topk kernels over
    a deterministic Gaussian-mixture table and asserts the production
    claim: recall@10 ≥ 0.9 against the exact twin while the candidate scan
    stays ≤ 10% of brute force (scan fraction measured by
    ``{lsh,ivf}_scan_stats`` over the identical bucket/probe plans). The
    oracle states the booleans literally — recall or scan regressions flip
    a driver value.
    """
    emb = reuse(synth_clustered_embeddings(spark, **CLUSTERED_EMB))
    queries_df = emb.where(F.col("vec_id") < CLUSTERED_EMB["n_clusters"])
    exact = brute_force_topk(emb, queries_df, k=10).select(
        "query_id", "neighbor_id"
    )
    totals = exact.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.countDistinct("query_id").alias("n_queries"),
    ).withColumn("_j", F.lit(1))
    parts = []
    for method, approx, stats in (
        (
            "ivf",
            ivf_topk(emb, queries_df, **CLUSTERED_IVF),
            ivf_scan_stats(
                emb,
                queries_df,
                n_centroids=CLUSTERED_IVF["n_centroids"],
                nprobe=CLUSTERED_IVF["nprobe"],
            ),
        ),
        (
            "lsh",
            lsh_topk(emb, queries_df, **CLUSTERED_LSH),
            lsh_scan_stats(
                emb,
                queries_df,
                bits=CLUSTERED_LSH["bits"],
                probes=CLUSTERED_LSH["probes"],
                tables=CLUSTERED_LSH["tables"],
            ),
        ),
    ):
        hits = (
            approx.select("query_id", "neighbor_id")
            .distinct()
            .join(exact, ["query_id", "neighbor_id"], "left_semi")
        )
        parts.append(
            hits.agg(F.count(F.lit(1)).alias("n_hits"))
            .withColumn("_j", F.lit(1))
            .join(totals, "_j")
            .join(
                stats.select("scan_fraction").withColumn("_j", F.lit(1)), "_j"
            )
            .select(
                F.lit(method).alias("method"),
                F.lit(10).alias("k"),
                F.col("n_queries"),
                (
                    F.col("n_hits") / F.col("n_exact")
                    >= F.lit(CLUSTERED_RECALL_FLOOR)
                ).alias("passes_floor"),
                (F.col("scan_fraction") <= F.lit(CLUSTERED_SCAN_CAP)).alias(
                    "scan_bounded"
                ),
                (F.col("n_hits") <= F.col("n_exact")).alias("hits_bounded"),
            )
        )
    return parts[0].unionByName(parts[1]).orderBy("method")


# Labeled dedup-quality contract (sources/labeled_dups): every detector runs
# at its production parameters (the ones the oracle-backed driver queries
# use) over a deterministic labeled corpus of base docs + 1-3-token-edit
# variants. Floors sit under the measured operating points — ngram 1.00/1.00,
# minhash 1.00/0.92, simhash 1.00/0.54 (hamming ≤ 3 is a high-precision
# low-recall point by design), consensus(≥2 votes) 1.00/0.95 — so they are
# regression contracts, not aspirations. simhash_r8 is the same detector with
# the radius knob opened to hamming ≤ 8 (9 pigeonhole bands of ~7 bits):
# measured 1.00/0.98 here, demonstrating the radius→recall trade the
# simhash_dup_pairs docstring describes; it does NOT vote in the consensus,
# which stays at production parameters. n_true_pairs is pinned: a generator
# drift also flips the driver value.
DUP_QUALITY_GROUPS = 150
DUP_QUALITY_SEED = 13
DUP_QUALITY_TRUE_PAIRS = 186
DUP_QUALITY_FLOORS = {
    # detector: (precision floor, recall floor)
    "consensus": (0.99, 0.90),
    "minhash": (0.99, 0.85),
    "ngram": (0.99, 0.95),
    "simhash": (0.99, 0.45),
    "simhash_r8": (0.99, 0.90),
}


def q_dedup_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection quality vs ground truth: precision/recall floor booleans.

    The consensus chain is value-correct by oracle; this query checks it
    DETECTS: each portable detector (production parameters) runs over the
    labeled near-dup corpus, and precision/recall against the within-group
    truth pairs must clear `DUP_QUALITY_FLOORS`. The oracle states the
    booleans and the pinned truth-pair count literally.
    """
    docs = reuse(
        synth_labeled_dup_corpus(spark, DUP_QUALITY_GROUPS, seed=DUP_QUALITY_SEED)
    )
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("group_id").alias("g"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("group_id").alias("g"))
    truth = reuse(
        ta.join(tb, "g").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    )
    preds = {
        "ngram": ngram_jaccard_pairs(docs, n=3, min_jaccard=0.2),
        "minhash": minhash_dup_pairs(
            docs, k=16, bands=4, n=3, min_est_jaccard=0.5, portable=True
        ),
        "simhash": simhash_dup_pairs(docs, max_hamming=3, portable=True),
    }
    tagged = None
    for name, p in preds.items():
        p = p.select("id_a", "id_b").withColumn("src", F.lit(name))
        tagged = p if tagged is None else tagged.unionByName(p)
    preds["consensus"] = (
        tagged.groupBy("id_a", "id_b")
        .agg(F.countDistinct("src").alias("n_votes"))
        .where(F.col("n_votes") >= 2)
    )
    # added after the consensus union on purpose: the relaxed radius is a
    # graded operating point, not a production voter
    preds["simhash_r8"] = simhash_dup_pairs(docs, max_hamming=8, portable=True)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_true_pairs")).withColumn(
        "_j", F.lit(1)
    )
    parts = []
    for name, p in preds.items():
        p = reuse(p.select("id_a", "id_b").distinct())
        counts = (
            p.agg(F.count(F.lit(1)).alias("n_pred"))
            .withColumn("_j", F.lit(1))
            .join(
                p.join(truth, ["id_a", "id_b"], "left_semi")
                .agg(F.count(F.lit(1)).alias("n_tp"))
                .withColumn("_j", F.lit(1)),
                "_j",
            )
            .join(n_truth, "_j")
        )
        p_floor, r_floor = DUP_QUALITY_FLOORS[name]
        parts.append(
            counts.select(
                F.lit(name).alias("detector"),
                F.col("n_true_pairs"),
                (
                    F.col("n_tp") / F.greatest(F.col("n_pred"), F.lit(1))
                    >= F.lit(p_floor)
                ).alias("precision_ok"),
                (F.col("n_tp") / F.col("n_true_pairs") >= F.lit(r_floor)).alias(
                    "recall_ok"
                ),
                # two-sided sanity (the ann_recall pattern): TP can exceed
                # neither side — an inflated count flips a value
                (
                    (F.col("n_tp") <= F.col("n_pred"))
                    & (F.col("n_tp") <= F.col("n_true_pairs"))
                ).alias("tp_bounded"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("detector")


def q_dedup_keep_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION: per clustered doc, its canonical survivor.

    Pairs with ≥2 detector votes (`dedup_consensus`) become edges; the
    flagship large-star/small-star CC kernel clusters them; the min-id
    labeling IS the canonical choice (component == min uid after the
    relabel pass), so each clustered doc gets ``canonical_id`` and a
    ``keep`` flag — the table a training pipeline anti-joins against the
    corpus. Both survivor policies run_dedup.py ships are emitted and
    value-checked: the min-id canonical (``keep``) and the quality-aware
    ``choose_survivors`` argmax (``quality_survivor_id``/``keep_quality``).
    Oracled end-to-end: consensus composition + recursive-CTE transitive
    closure + an SQL replay of the argmax-with-min-id-ties selection over
    the (independently green) doc_quality score expression.
    """
    pairs = q_dedup_consensus(spark, sf_dir).where(F.col("n_signals") >= 2)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    clusters = connected_components(edges).select(
        F.col("uid").alias("doc_id"), F.col("component").alias("canonical_id")
    )
    # quality-aware alternative survivor (choose_survivors), value-oracled:
    # argmax quality_score per cluster, ties -> min doc_id — the policy
    # run_dedup.py ships; the oracle replays the same argmax in SQL over
    # the doc_quality oracle's (green) per-doc score expression
    scores = quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.col("quality_score").alias("score")
    )
    qs = choose_survivors(clusters, scores).select(
        "doc_id", F.col("survivor_id").alias("quality_survivor_id")
    )
    return (
        clusters.join(qs, "doc_id")
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
            "quality_survivor_id",
            (F.col("doc_id") == F.col("quality_survivor_id")).alias(
                "keep_quality"
            ),
        )
        .orderBy("doc_id")
    )


def q_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone artifact: the post-dedup training-corpus manifest.

    Drops every non-canonical duplicate (``dedup_keep_policy``, keep=false),
    assigns the survivors their deterministic train/val/test split, and
    reports docs + whitespace-token totals per (split, lang) — the manifest
    a training run consumes. Every stage reuses an oracle-green building
    block (consensus detectors → CC keep policy → hash split → token
    counts), and the DuckDB oracle composes the same pieces, so the whole
    end-to-end dataflow is value-checked as one query.

    Driver-contract composition note: the three composed queries
    (``dedup_consensus`` → ``dedup_keep_policy`` → this) each rebuild their
    detector subtrees when the driver evaluates them independently — three
    CC fixpoints across the trio (``reuse()`` pins the shingle tables only
    WITHIN a query). That is the price of each entry being independently
    oracle-checkable; a production pipeline materializes the consensus
    table once and feeds both downstream stages from it.
    """
    d = _t(spark, sf_dir, "documents")
    dropped = (
        q_dedup_keep_policy(spark, sf_dir).where(~F.col("keep")).select("doc_id")
    )
    kept = with_token_stats(d.join(dropped, "doc_id", "left_anti"))
    s = assign_split(
        kept, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], seed=42
    )
    return (
        s.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    return lsh_topk(emb, queries_df, **LSH_PARAMS).orderBy("query_id", "rank")


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (rows-only: centroid refinement is engine-iterative)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    return ivf_topk(emb, queries_df, **IVF_PARAMS).orderBy("query_id", "rank")


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible ANN quality: recall@k floors vs the exact twin.

    For each approximate method, recall@10 is genuinely computed against
    ``brute_force_topk`` (the oracle-green exact twin) on the same query
    set, and the row carries ``passes_floor = recall ≥ floor``. The oracle
    states the expected booleans literally, so a recall regression below
    the floor surfaces as a value-hash mismatch in CORRECTNESS — not just
    in unit tests. Floors per ``ANN_RECALL_FLOORS`` (see the comment there
    for why LSH's floor is 0.6 on these near-uniform synthetic vectors).
    """
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries_df, k=10).select(
        "query_id", "neighbor_id"
    )
    totals = exact.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.countDistinct("query_id").alias("n_queries"),
    ).withColumn("_j", F.lit(1))
    parts = []
    for method, approx in (
        ("ivf", ivf_topk(emb, queries_df, **IVF_PARAMS)),
        ("lsh", lsh_topk(emb, queries_df, **LSH_PARAMS)),
    ):
        # defensive distinct: the top-k kernels dedup internally, but an
        # inflated-recall bug (duplicate (query, neighbor) rows counted
        # twice) must flip a driver value, not pass silently
        hits = (
            approx.select("query_id", "neighbor_id")
            .distinct()
            .join(exact, ["query_id", "neighbor_id"], "left_semi")
        )
        parts.append(
            hits.agg(F.count(F.lit(1)).alias("n_hits"))
            # constant-key equi-join of two single-row aggregates (plans as
            # a broadcast hash join, never a cartesian product)
            .withColumn("_j", F.lit(1))
            .join(totals, "_j")
            .select(
                F.lit(method).alias("method"),
                F.lit(10).alias("k"),
                F.col("n_queries"),
                (
                    F.col("n_hits") / F.col("n_exact")
                    >= F.lit(ANN_RECALL_FLOORS[method])
                ).alias("passes_floor"),
                # two-sided sanity: recall can never exceed 1 — an
                # inflated n_hits turns this false and the hash red
                (F.col("n_hits") <= F.col("n_exact")).alias("hits_bounded"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("method")


def q_minhash_engine_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-hash minhash ≡ portable-md5 minhash, as a driver value check.

    Both banded MinHash variants (xxhash64 signatures at k=64/b=16 vs the
    DuckDB-replayable md5 twin at k=16/b=4) must surface the same
    duplicate-pair set on the deterministic corpus — each verifies its
    banding candidates against the estimate threshold independently, so
    set equality is the cross-engine consistency contract. The query emits
    the symmetric difference tagged by side; the oracle expects it EMPTY,
    so any drift between the twins turns the driver row red.
    """
    docs = _t(spark, sf_dir, "documents")
    a = minhash_dup_pairs(docs, k=64, bands=16, n=3, min_est_jaccard=0.4).select(
        "id_a", "id_b"
    )
    b = minhash_dup_pairs(
        docs, k=16, bands=4, n=3, min_est_jaccard=0.5, portable=True
    ).select("id_a", "id_b")
    return (
        a.subtract(b)
        .withColumn("only_in", F.lit("engine"))
        .unionByName(b.subtract(a).withColumn("only_in", F.lit("portable")))
        .orderBy("only_in", "id_a", "id_b")
    )


def q_embedding_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), min_cos=0.99, bits=10
    ).orderBy("id_a", "id_b")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints — md5-based, so oracle-checkable in DuckDB."""
    d = fingerprint(_t(spark, sf_dir, "documents"))
    return d.select("doc_id", "fp64", "fp_prefix", "fp_suffix").orderBy("doc_id")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_lang_id(_t(spark, sf_dir, "documents"))
    return (
        d.groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_pred")
    )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail stage (rows-only: payload bytes are engine-produced).

    Resizes every image raster to 16x12 via nearest-neighbor resampling and
    aggregates by source dimensions; out_bytes is the length of the
    re-encoded container (P6: 13-byte header + 16*12*3 raster = 589; PNG:
    deflate-dependent), so a codec regression shows up as a value change,
    not just a count. Half the image refs are PNG, so the compressed codec
    is exercised in the driver-visible path, not only in unit goldens.
    """
    corpus = synth_corpus(spark, min(_entities_for(sf_dir), 500), seed=42)
    spans = normalize_documents(documents_view(corpus))
    return (
        resize_images(spans, target_w=16, target_h=12)
        .groupBy("src_width", "src_height", "width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.max(F.length("payload")).alias("out_bytes"),
        )
        .orderBy("src_width", "src_height")
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real frame extraction (rows-only: frames are engine-decoded bytes).

    Decodes the sampled YUV frames of every video span and aggregates per
    clip geometry; luma_sum makes the decoded pixel values part of the
    driver-visible result, so a codec regression changes a value.
    """
    corpus = synth_corpus(spark, min(_entities_for(sf_dir), 500), seed=42)
    spans = normalize_documents(documents_view(corpus))
    return (
        extract_frames(spans, every_ms=100)
        # sum an INTEGER centiluma per row: float summation order is
        # partition-dependent, so summing doubles then rounding could
        # flip a digit across parallelism/AQE settings; integer sums are
        # exact and order-independent
        .withColumn("centiluma", F.round(F.col("luma_mean") * 100).cast("long"))
        .groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            (F.sum("centiluma") / F.lit(100.0)).alias("luma_sum"),
        )
        .orderBy("width", "height")
    )


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = synth_corpus(spark, _entities_for(sf_dir), seed=42)
    spans = normalize_documents(documents_view(corpus))
    return (
        with_media_meta(spans)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        )
        .orderBy("kind")
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = synth_corpus(spark, min(_entities_for(sf_dir), 500), seed=42)
    spans = normalize_documents(documents_view(corpus))
    feats = decode_and_featurize(spans)
    return feats.select(
        "doc_id",
        "pos",
        F.size("feature").alias("feature_dim"),
        F.round(
            F.aggregate("feature", F.lit(0.0), lambda a, x: a + x.cast("double")), 4
        ).alias("feature_sum"),
    ).orderBy("doc_id", "pos")


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = synth_corpus(spark, min(_entities_for(sf_dir), 500), seed=42)
    spans = normalize_documents(documents_view(corpus))
    return (
        # videos are short clips (parsed y4m duration ≤ ~1.2s) — sample at
        # 100ms so the work list genuinely fans out per span
        frame_sample_plan(spans, every_ms=100)
        .groupBy("doc_id", "pos")
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .orderBy("doc_id", "pos")
    )


# ---------------------------------------------------------------------------
# merged rows-only queries — the driver's correctness harness records only
# the first 50 registry entries, so the rows-only twins are consolidated
# (family/detector/method tag column + a normalized value) to keep EVERY
# registered query inside the driver's window while still exercising every
# engine path. The per-family functions above stay importable (unit tests
# and bench time them individually via BENCH_ONLY_QUERIES).
# ---------------------------------------------------------------------------


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ∪ IVF approximate top-k, tagged by method (rows-only: both rely
    on engine-specific hashing/iteration; their recall floors are the
    oracle-backed ``ann_recall`` / ``ann_recall_clustered`` rows)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    parts = [
        lsh_topk(emb, queries_df, **LSH_PARAMS).select(
            F.lit("lsh").alias("method"), "query_id", "rank", "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
        ),
        ivf_topk(emb, queries_df, **IVF_PARAMS).select(
            F.lit("ivf").alias("method"), "query_id", "rank", "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
        ),
    ]
    return parts[0].unionByName(parts[1]).orderBy("method", "query_id", "rank")


def q_dedup_engine_twins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-hash near-dup detectors, tagged by detector (rows-only: the
    xxhash64 signatures and hyperplane buckets are engine-specific; each has
    an oracle-green portable/exact twin — minhash_dups_md5, simhash_dups_md5,
    embedding_dup_exact — and minhash_engine_parity value-locks the first)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    parts = [
        minhash_dup_pairs(docs, k=64, bands=16, n=3, min_est_jaccard=0.4).select(
            F.lit("minhash").alias("detector"),
            F.col("id_a").cast("string").alias("id_a"),
            F.col("id_b").cast("string").alias("id_b"),
            F.col("est_jaccard").cast("double").alias("score"),
        ),
        simhash_dup_pairs(docs, max_hamming=6).select(
            F.lit("simhash").alias("detector"),
            F.col("id_a").cast("string").alias("id_a"),
            F.col("id_b").cast("string").alias("id_b"),
            F.col("hamming").cast("double").alias("score"),
        ),
        embedding_near_dup_pairs(emb, min_cos=0.99, bits=10).select(
            F.lit("embedding_lsh").alias("detector"),
            F.col("id_a").cast("string").alias("id_a"),
            F.col("id_b").cast("string").alias("id_b"),
            F.round("cos_sim", 6).cast("double").alias("score"),
        ),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.orderBy("detector", "id_a", "id_b")


def q_doc_sketches_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK quantile + HLL distinct sketches, long format (rows-only: both
    estimates are engine-specific; accuracy vs the oracle-green exact twins
    doc_len_quantiles / doc_distinct_exact is asserted in tests)."""
    d = _t(spark, sf_dir, "documents")
    qa = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.percentile_approx("n_chars", p, 10_000).alias(name)
            for name, p in {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}.items()
        ],
    )
    quant = qa.selectExpr(
        "'gk_quantiles' AS sketch",
        "lang AS key",
        "stack(5, 'n_docs', cast(n_docs AS double), 'p25', cast(p25 AS double), "
        "'p50', cast(p50 AS double), 'p75', cast(p75 AS double), "
        "'p95', cast(p95 AS double)) AS (metric, value)",
    )
    hll = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct(F.md5("text"), rsd=0.02).alias("n_distinct"),
        )
        .selectExpr(
            "'hll_distinct' AS sketch",
            "source AS key",
            "stack(2, 'n_docs', cast(n_docs AS double), "
            "'n_distinct_approx', cast(n_distinct AS double)) AS (metric, value)",
        )
    )
    return quant.unionByName(hll).orderBy("sketch", "key", "metric")


def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole multimodal suite in one long-format row set (rows-only:
    payload bytes are engine-produced): header parse (meta), full
    decode+featurize, nearest-neighbor resize re-encoded to valid P6, real
    Y4M frame decode with exact integer luma sums, and the plan-side frame
    work list. One corpus synthesis + span normalization feeds all five
    families; values stay driver-visible so a codec regression changes a
    value, not just a count.
    """
    corpus = synth_corpus(spark, min(_entities_for(sf_dir), 500), seed=42)
    spans = normalize_documents(documents_view(corpus))
    key = lambda *cols: F.concat_ws(":", *cols)  # noqa: E731

    meta = (
        with_media_meta(spans)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        )
        .selectExpr(
            "'meta' AS family", "kind AS key",
            "stack(2, 'n_spans', cast(n_spans AS double), "
            "'avg_bytes', avg_bytes) AS (metric, value)",
        )
    )
    feats = decode_and_featurize(spans).select(
        F.lit("features").alias("family"),
        key("doc_id", "pos").alias("key"),
        F.size("feature").cast("double").alias("feature_dim"),
        F.round(
            F.aggregate("feature", F.lit(0.0), lambda a, x: a + x.cast("double")), 4
        ).alias("feature_sum"),
    ).selectExpr(
        "family", "key",
        "stack(2, 'feature_dim', feature_dim, 'feature_sum', feature_sum) "
        "AS (metric, value)",
    )
    resize = (
        resize_images(spans, target_w=16, target_h=12)
        .groupBy("src_width", "src_height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.max(F.length("payload")).alias("out_bytes"),
        )
        .select(
            F.lit("resize").alias("family"),
            key("src_width", "src_height").alias("key"),
            F.col("n_images").cast("double"),
            F.col("out_bytes").cast("double"),
        )
        .selectExpr(
            "family", "key",
            "stack(2, 'n_images', n_images, 'out_bytes', out_bytes) "
            "AS (metric, value)",
        )
    )
    frames = (
        extract_frames(spans, every_ms=100)
        # exact integer centiluma per row → order-independent sum
        .withColumn("centiluma", F.round(F.col("luma_mean") * 100).cast("long"))
        .groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            (F.sum("centiluma") / F.lit(100.0)).alias("luma_sum"),
        )
        .select(
            F.lit("frames").alias("family"),
            key("width", "height").alias("key"),
            F.col("n_frames").cast("double"),
            F.col("luma_sum"),
        )
        .selectExpr(
            "family", "key",
            "stack(2, 'n_frames', n_frames, 'luma_sum', luma_sum) "
            "AS (metric, value)",
        )
    )
    plan = (
        frame_sample_plan(spans, every_ms=100)
        .groupBy("doc_id", "pos")
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .select(
            F.lit("frame_plan").alias("family"),
            key("doc_id", "pos").alias("key"),
            F.lit("n_frames").alias("metric"),
            F.col("n_frames").cast("double").alias("value"),
        )
    )
    out = meta
    for p in (feats, resize, frames, plan):
        out = out.unionByName(p)
    return out.orderBy("family", "key", "metric")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational core (SQL oracles)
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "regional_revenue": q_regional_revenue,
        "events_user_top": q_events_user_top,
        "events_hourly": q_events_hourly,
        "customers_without_orders": q_customers_without_orders,
        "revenue_rollup": q_revenue_rollup,
        # temporal (SQL oracles — DuckDB native ASOF JOIN / window replay)
        "events_order_asof": q_events_order_asof,
        "user_sessions": q_user_sessions,
        "events_type_pivot": q_events_type_pivot,
        "user_event_setops": q_user_event_setops,
        "events_json_props": q_events_json_props,
        "events_value_outliers": q_events_value_outliers,
        "doc_profile": q_doc_profile,
        "events_in_order_week": q_events_in_order_week,
        "events_type_unpivot": q_events_type_unpivot,
        # quantiles / distinct sketches
        "doc_len_quantiles": q_doc_len_quantiles,
        "doc_distinct_exact": q_doc_distinct_exact,
        # text analysis (SQL oracles)
        "doc_token_stats": q_doc_token_stats,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "doc_quality": q_doc_quality,
        "lang_share": q_lang_share,
        "doc_tfidf_terms": q_doc_tfidf_terms,
        "doc_top_bigrams": q_doc_top_bigrams,
        # dedup (SQL oracles where portable)
        "exact_dup_full": q_exact_dup_full,
        "exact_dup_prefix": q_exact_dup_prefix,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_dup_clusters": q_ngram_dup_clusters,
        # sampling / dataset splitting (SQL oracles)
        "doc_split_counts": q_doc_split_counts,
        "doc_stratified_sample": q_doc_stratified_sample,
        "split_leakage": q_split_leakage,
        "minhash_dups_md5": q_minhash_dups_md5,
        "simhash_dups_md5": q_simhash_dups_md5,
        "dedup_consensus": q_dedup_consensus,
        "dedup_keep_policy": q_dedup_keep_policy,
        "corpus_manifest": q_corpus_manifest,
        # similarity (SQL oracles)
        "embedding_topk": q_embedding_topk,
        "embedding_dup_exact": q_embedding_dup_exact,
        # ANN/dedup quality contracts (SQL oracles state the expected
        # outcome; the Spark side genuinely computes recall / set parity)
        "ann_recall": q_ann_recall,
        "ann_recall_clustered": q_ann_recall_clustered,
        "dedup_quality": q_dedup_quality,
        "minhash_engine_parity": q_minhash_engine_parity,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        # rows-only (registered LAST: the driver's correctness harness
        # records the first 50 entries, so every oracle-backed query comes
        # first and the registry total stays ≤50 — the rows-only engine
        # twins are consolidated into tagged unions, see the merged-query
        # section above): pandas-UDF kernels / engine-hash LSH / iterative CC
        "parse_udf_fields": q_parse_udf_fields,
        "er_cluster_sizes": q_er_cluster_sizes,
        "dedup_engine_twins": q_dedup_engine_twins,
        "ann_topk": q_ann_topk,
        "doc_sketches_approx": q_doc_sketches_approx,
        "media_pipeline": q_media_pipeline,
    }


# Retired registry names, kept callable for bench.py's cross-round timed sets
# and ad-hoc use — identical computations to what BENCH_r01..r04 timed.
BENCH_ONLY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "er_block_histogram": q_er_block_histogram,
    "minhash_dups": q_minhash_dups,
    "simhash_dups": q_simhash_dups,
    "lsh_topk": q_lsh_topk,
    "ivf_topk": q_ivf_topk,
    "embedding_dup_lsh": q_embedding_dup_lsh,
    "media_meta": q_media_meta,
    "media_resize": q_media_resize,
    "media_frames": q_media_frames,
    "media_features": q_media_features,
    "frame_sample": q_frame_sample,
}


# ---------------------------------------------------------------------------
# DuckDB oracles — identical aliases, identical rounding
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join("'%s'" % w for w in STOPWORDS)

_TOKENS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')"

# the same seeded affine-permutation constants the Spark portable-minhash
# query uses (k=16, seed=42), inlined as a VALUES list for the oracle
_MINHASH_PERM_VALUES = ", ".join(
    "(%d, %d, %d)" % (i, a, b) for i, (a, b) in enumerate(_perm_params(16, 42))
)


def _lang_score_sql(grams: list) -> str:
    """Non-overlapping gram-count sum, SQL edition of ``Series.str.count``.

    ``str.count``/``str.replace`` both consume matches left-to-right without
    overlap, so ``(len(s) - len(replace(s, g, ''))) // len(g)`` is the exact
    same count. Generated from the same ``_LANG_PROFILES`` dict the Spark
    kernel reads, so the two can't drift.
    """
    return " + ".join(
        "(length(low) - length(replace(low, '%s', ''))) // %d" % (g, len(g))
        for g in grams
    )


# Shared oracle fragments. The unit tests (tests/test_operators.py) import
# these same strings for their per-doc DuckDB parity checks, so the tests
# always validate the fragment the driver oracle actually runs — a private
# copy in the test could silently drift from it.

# per-doc n/n_cjk/per-language scores over `documents(doc_id, text)`
_LANG_SCORES_CTE = f"""
            WITH s AS (
              SELECT doc_id, coalesce(text, '') AS t, lower(coalesce(text, '')) AS low
              FROM documents),
            sc AS (
              SELECT doc_id, length(t) AS n,
                     len(regexp_extract_all(t, '[一-鿿]')) AS n_cjk,
                     {_lang_score_sql(_LANG_PROFILES["en"])} AS s_en,
                     {_lang_score_sql(_LANG_PROFILES["de"])} AS s_de,
                     {_lang_score_sql(_LANG_PROFILES["es"])} AS s_es,
                     {_lang_score_sql(_LANG_PROFILES["fr"])} AS s_fr
              FROM s)"""

# first-wins argmax over the profile order (en, de, es, fr), CJK and
# empty-text overrides — the exact tie-break ladder of _lang_id_kernel
_LANG_PRED_CASE = """CASE WHEN n = 0 THEN 'und'
                          WHEN n_cjk > n * 0.2 THEN 'zh'
                          WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                          WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                          WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                          WHEN s_es >= s_fr THEN 'es'
                          ELSE 'fr' END"""

# (doc_id, i, m): portable-minhash signature rows over `documents`
_MINHASH_SIG_CTES = f"""toks AS (
              SELECT doc_id, {_TOKENS} AS tt FROM documents),
            sh AS (
              SELECT doc_id, unnest(shset) AS shingle FROM (
                SELECT doc_id,
                       list_distinct([array_to_string(tt[i:i+2], ' ')
                                      for i in range(1, greatest(len(tt)-2, 0)+1)]) AS shset
                FROM toks)),
            perms(i, a, b) AS (VALUES {_MINHASH_PERM_VALUES}),
            sig AS (
              SELECT doc_id, i,
                     min((a * (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) + b)
                         % 2147483647) AS m
              FROM sh CROSS JOIN perms GROUP BY doc_id, i)"""

# (doc_id, simhash): portable 60-bit simhash signatures over `documents`
_SIMHASH_SIG_CTES = r"""toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                        t -> t != '')) AS tok
              FROM documents),
            h AS (
              SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
            votes AS (
              SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM h CROSS JOIN range(60) t(i) GROUP BY doc_id, i),
            sig AS (
              SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS simhash
              FROM votes GROUP BY doc_id)"""


def oracle_sql() -> dict[str, str]:
    oracles = {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_quantity < 45
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c_custkey, c_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "regional_revenue": """
            SELECT r_name, n_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(DISTINCT c_custkey) AS n_customers
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
            ORDER BY r_name, n_name
        """,
        "events_user_top": """
            SELECT user_id, event_id, event_type,
                   round(value, 4) AS top_value
            FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
              FROM events) t
            WHERE rn = 1
            ORDER BY user_id
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
            ORDER BY hour, event_type
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_nationkey
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey
        """,
        "revenue_rollup": """
            SELECT r_name, n_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
        """,
        "events_order_asof": """
            WITH e AS (
              SELECT event_id, user_id, ts - INTERVAL 26 YEAR AS ets
              FROM events WHERE user_id < 50),
            r AS (
              SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                        ORDER BY o_orderkey DESC) AS rn
              FROM orders),
            rd AS (SELECT * FROM r WHERE rn = 1)
            SELECT e.event_id, e.user_id,
                   rd.o_orderkey AS last_orderkey,
                   round(rd.o_totalprice, 2) AS last_totalprice
            FROM e ASOF LEFT JOIN rd
              ON e.user_id = rd.o_custkey AND e.ets >= rd.o_orderdate
            ORDER BY e.event_id
        """,
        "user_sessions": """
            WITH o AS (
              SELECT user_id, ts, value,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
                     event_id
              FROM events),
            s AS (
              SELECT user_id, ts, value,
                     sum(CASE WHEN prev IS NULL
                              OR epoch(ts) - epoch(prev) > 7200 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM o)
            SELECT user_id,
                   CAST(session_seq AS BIGINT) AS session_seq,
                   count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                   round(max(epoch(ts)) - min(epoch(ts)), 4) AS duration_s,
                   round(sum(value), 4) AS sum_value
            FROM s GROUP BY user_id, session_seq
            ORDER BY user_id, session_seq
        """,
        "events_type_pivot": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS n_click,
                   count(*) FILTER (WHERE event_type = 'error') AS n_error,
                   count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "events_in_order_week": """
            WITH e AS (
              SELECT user_id, value, ts - INTERVAL 26 YEAR AS ets
              FROM events WHERE user_id < 30)
            SELECT o_orderkey, o_custkey,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM e JOIN orders
              ON e.user_id = o_custkey
             AND e.ets >= o_orderdate
             AND e.ets < o_orderdate + INTERVAL 7 DAY
            GROUP BY o_orderkey, o_custkey
            ORDER BY o_orderkey
        """,
        "events_type_unpivot": """
            WITH p AS (
              SELECT user_id,
                     count(*) FILTER (WHERE event_type = 'click') AS n_click,
                     count(*) FILTER (WHERE event_type = 'error') AS n_error,
                     count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                     count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                     count(*) FILTER (WHERE event_type = 'view') AS n_view
              FROM events GROUP BY user_id),
            u AS (
              SELECT user_id, 'click' AS event_type, n_click AS n_events FROM p
              UNION ALL SELECT user_id, 'error', n_error FROM p
              UNION ALL SELECT user_id, 'purchase', n_purchase FROM p
              UNION ALL SELECT user_id, 'signup', n_signup FROM p
              UNION ALL SELECT user_id, 'view', n_view FROM p)
            SELECT user_id, event_type, n_events FROM u
            WHERE n_events > 0 ORDER BY user_id, event_type
        """,
        "doc_profile": """
            SELECT 'doc_id' AS "column", count(*) AS n,
                   CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                   count(DISTINCT doc_id) AS n_distinct,
                   CAST(min(doc_id) AS VARCHAR) AS min_val,
                   CAST(max(doc_id) AS VARCHAR) AS max_val
            FROM documents
            UNION ALL
            SELECT 'lang', count(*),
                   CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT lang), min(lang), max(lang)
            FROM documents
            UNION ALL
            SELECT 'source', count(*),
                   CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT source), min(source), max(source)
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(*),
                   CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT n_chars),
                   CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
            FROM documents
            ORDER BY "column"
        """,
        "events_value_outliers": """
            SELECT event_id, event_type,
                   round(value, 4) AS value,
                   round(thr, 4) AS threshold
            FROM (
              SELECT event_id, event_type, value,
                     avg(value) OVER (PARTITION BY event_type)
                       + 3 * stddev_samp(value) OVER (PARTITION BY event_type) AS thr
              FROM events)
            WHERE value > thr
            ORDER BY event_id
        """,
        "events_json_props": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   round(avg(k), 4) AS avg_k,
                   CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
            FROM (SELECT event_type,
                         -- TRY_CAST + json_valid mirror from_json's
                         -- null-on-bad-input semantics: malformed JSON or a
                         -- non-integer k must diverge visibly (NULL vs value),
                         -- never crash the oracle
                         CASE WHEN json_valid(props)
                              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                         END AS k
                  FROM events)
            GROUP BY event_type ORDER BY event_type
        """,
        "user_event_setops": """
            WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
                 x AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
            SELECT 'any' AS tag, user_id FROM (SELECT user_id FROM p UNION SELECT user_id FROM x)
            UNION ALL
            SELECT 'both' AS tag, user_id FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM x)
            UNION ALL
            SELECT 'purchase_only' AS tag, user_id FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM x)
            ORDER BY tag, user_id
        """,
        "doc_len_quantiles": """
            SELECT lang, count(*) AS n_docs,
                   round(quantile_cont(n_chars, 0.25), 4) AS p25,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50,
                   round(quantile_cont(n_chars, 0.75), 4) AS p75,
                   round(quantile_cont(n_chars, 0.95), 4) AS p95
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "doc_distinct_exact": """
            SELECT source, count(*) AS n_docs,
                   count(DISTINCT md5(text)) AS n_distinct
            FROM documents GROUP BY source ORDER BY source
        """,
        "doc_token_stats": f"""
            WITH t AS (
              SELECT lang,
                     len({_TOKENS}) AS token_count,
                     CASE WHEN len({_TOKENS}) > 0 THEN
                       round(len(list_filter({_TOKENS},
                             t -> list_contains([{_STOP_SQL}], lower(t))))
                             * 1.0 / len({_TOKENS}), 4)
                     ELSE 0.0 END AS stopword_ratio
              FROM documents)
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(token_count) AS BIGINT) AS total_tokens,
                   round(avg(token_count), 4) AS avg_tokens,
                   round(avg(stopword_ratio), 4) AS avg_stopword_ratio
            FROM t GROUP BY lang ORDER BY lang
        """,
        "doc_bpe_tokens": """
            WITH t AS (
              SELECT lang,
                     len(regexp_extract_all(coalesce(text, ''),
                         '%s')) AS bpe_token_count
              FROM documents)
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(bpe_token_count) AS BIGINT) AS total_bpe_tokens,
                   round(avg(bpe_token_count), 4) AS avg_bpe_tokens
            FROM t GROUP BY lang ORDER BY lang
        """
        % BPE_TOKEN_PATTERN.replace("'", "''"),
        "doc_quality": f"""
            WITH t AS (
              SELECT source,
                     len({_TOKENS}) AS n_tok,
                     CASE WHEN len({_TOKENS}) > 0 THEN
                        round(list_sum(list_transform({_TOKENS}, t -> len(t)))
                              * 1.0 / len({_TOKENS}), 4)
                     ELSE 0.0 END AS avg_token_len,
                     CASE WHEN len({_TOKENS}) > 0 THEN
                        round(len(list_filter({_TOKENS},
                              t -> list_contains([{_STOP_SQL}], lower(t))))
                              * 1.0 / len({_TOKENS}), 4)
                     ELSE 0.0 END AS stopword_ratio
              FROM documents),
            q AS (
              SELECT source,
                     round((
                       (CASE WHEN n_tok BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) +
                       (CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
                       (CASE WHEN stopword_ratio >= 0.02 THEN 1.0 ELSE 0.0 END)
                     ) / 3.0, 4) AS quality_score
              FROM t)
            SELECT source,
                   count(*) AS n_docs,
                   round(avg(quality_score), 4) AS avg_quality,
                   CAST(sum(CASE WHEN quality_score >= 0.99 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality
            FROM q GROUP BY source ORDER BY source
        """,
        "lang_id": f"""
            {_LANG_SCORES_CTE},
            pred AS (
              SELECT doc_id,
                     {_LANG_PRED_CASE} AS lang_pred
              FROM sc)
            SELECT lang_pred, count(*) AS n_docs FROM pred
            GROUP BY lang_pred ORDER BY lang_pred
        """,
        "lang_share": """
            SELECT lang, count(*) AS n_docs,
                   round(count(*) * 1.0 / (SELECT count(*) FROM documents), 6) AS share
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "doc_fingerprint": r"""
            WITH n AS (
              SELECT doc_id,
                     trim(lower(regexp_replace(text, '[^\p{L}\p{N}]+', ' ', 'g'))) AS norm
              FROM documents)
            SELECT doc_id,
                   substr(md5(norm), 1, 16) AS fp64,
                   md5(substr(norm, 1, 64)) AS fp_prefix,
                   md5(right(norm, 64)) AS fp_suffix
            FROM n ORDER BY doc_id
        """,
        "exact_dup_full": """
            SELECT md5(text) AS text_hash,
                   count(*) AS n_copies,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY 1 HAVING count(*) > 1
            ORDER BY text_hash
        """,
        "exact_dup_prefix": f"""
            SELECT md5(array_to_string(list_slice({_TOKENS}, 1, 8), ' ')) AS prefix_hash,
                   count(*) AS n_copies,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY 1 HAVING count(*) > 1
            ORDER BY prefix_hash
        """,
        "ngram_jaccard": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKENS} AS tt FROM documents),
            sh AS (
              SELECT doc_id, len(shset) AS set_size, unnest(shset) AS shingle FROM (
                SELECT doc_id,
                       list_distinct([array_to_string(tt[i:i+2], ' ')
                                      for i in range(1, greatest(len(tt)-2, 0)+1)]) AS shset
                FROM toks)
              WHERE len(shset) > 0)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(count(*) * 1.0 /
                         (any_value(a.set_size) + any_value(b.set_size) - count(*)), 6) AS jaccard
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING round(count(*) * 1.0 /
                         (any_value(a.set_size) + any_value(b.set_size) - count(*)), 6) >= 0.2
            ORDER BY id_a, id_b
        """,
        "doc_top_bigrams": f"""
            WITH toks AS (
              SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                 t -> t != '') AS tt
              FROM documents),
            bg AS (
              SELECT unnest([array_to_string(tt[i:i+1], ' ')
                             for i in range(1, greatest(len(tt)-1, 0)+1)]) AS bigram
              FROM toks),
            counted AS (
              SELECT bigram, count(*) AS n FROM bg GROUP BY bigram),
            ranked AS (
              SELECT bigram, n,
                     row_number() OVER (ORDER BY n DESC, bigram) AS rank
              FROM counted)
            SELECT rank, bigram, n FROM ranked WHERE rank <= 25 ORDER BY rank
        """,
        "doc_tfidf_terms": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKENS} AS tt FROM documents),
            terms AS (
              SELECT doc_id, lower(unnest(tt)) AS term FROM toks),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
            dfreq AS (
              SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
              SELECT doc_id, term,
                     tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0) AS s
              FROM tf JOIN dfreq USING (term) CROSS JOIN n),
            ranked AS (
              SELECT doc_id, term, s,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY s DESC, term) AS rank
              FROM scored)
            SELECT doc_id, term, round(s, 6) AS tfidf, rank
            FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
        """,
        # sampling twins: identical integer thresholds on the portable
        # 60-bit md5 hash, computed by the same rate_threshold() the operators
        # use — no float comparisons cross the engine boundary
        "doc_split_counts": f"""
            SELECT CASE
                     WHEN h < {rate_threshold(0.8)} THEN 'train'
                     WHEN h < {rate_threshold(0.8 + 0.1)} THEN 'val'
                     ELSE 'test'
                   END AS split,
                   lang, count(*) AS n_docs
            FROM (SELECT lang,
                         ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT AS h
                  FROM documents)
            GROUP BY 1, 2 ORDER BY split, lang
        """,
        "doc_stratified_sample": f"""
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     ('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT AS h
              FROM documents)
            WHERE h < CASE lang
                        WHEN 'en' THEN {rate_threshold(0.5)}
                        WHEN 'zh' THEN {rate_threshold(0.25)}
                        ELSE {rate_threshold(0.1)}
                      END
            ORDER BY doc_id
        """,
        "split_leakage": f"""
            WITH f AS (
              SELECT doc_id,
                     md5(substr(trim(lower(regexp_replace(text, '[^\\p{{L}}\\p{{N}}]+', ' ', 'g'))), 1, 64)) AS fp_prefix,
                     ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT AS h
              FROM documents),
            s AS (
              SELECT fp_prefix, doc_id,
                     CASE WHEN h < {rate_threshold(0.8)} THEN 'train'
                          WHEN h < {rate_threshold(0.8 + 0.1)} THEN 'val'
                          ELSE 'test' END AS split
              FROM f)
            SELECT fp_prefix,
                   count(DISTINCT split) AS n_splits,
                   count(*) AS n_docs,
                   min(doc_id) AS example_id
            FROM s GROUP BY fp_prefix
            HAVING count(DISTINCT split) > 1 ORDER BY fp_prefix
        """,
        # CC oracle: transitive closure by recursive CTE over the SAME
        # Jaccard edge set as ngram_jaccard; cluster_id = min reachable
        # doc_id (incl. self) — exactly cluster.py's min-uid component label
        "ngram_dup_clusters": f"""
            WITH RECURSIVE toks AS (
              SELECT doc_id, {_TOKENS} AS tt FROM documents),
            sh AS (
              SELECT doc_id, len(shset) AS set_size, unnest(shset) AS shingle FROM (
                SELECT doc_id,
                       list_distinct([array_to_string(tt[i:i+2], ' ')
                                      for i in range(1, greatest(len(tt)-2, 0)+1)]) AS shset
                FROM toks)
              WHERE len(shset) > 0),
            edges AS (
              SELECT a.doc_id AS src, b.doc_id AS dst
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
              HAVING round(count(*) * 1.0 /
                           (any_value(a.set_size) + any_value(b.set_size) - count(*)), 6) >= 0.2),
            und AS (
              SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
            reach(node, r) AS (
              SELECT src AS node, dst AS r FROM und
              UNION
              SELECT u.src AS node, reach.r FROM und u JOIN reach ON u.dst = reach.node)
            SELECT node AS doc_id, least(node, min(r)) AS cluster_id
            FROM reach GROUP BY node ORDER BY doc_id
        """,
        "minhash_dups_md5": f"""
            WITH {_MINHASH_SIG_CTES},
            bands AS (
              SELECT doc_id, i // 4 AS band,
                     string_agg(m::VARCHAR, ',' ORDER BY i) AS bucket
              FROM sig GROUP BY doc_id, i // 4),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              WHERE a.doc_id < b.doc_id),
            est AS (
              SELECT c.id_a, c.id_b,
                     round(sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / 16.0, 6) AS est_jaccard
              FROM cand c
              JOIN sig sa ON sa.doc_id = c.id_a
              JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
              GROUP BY c.id_a, c.id_b)
            SELECT id_a, id_b, est_jaccard FROM est
            WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b
        """,
        "simhash_dups_md5": f"""
            WITH {_SIMHASH_SIG_CTES},
            bandspec(band, off) AS (VALUES (0, 0), (1, 15), (2, 30), (3, 45)),
            banded AS (
              SELECT doc_id, simhash, band, (simhash >> off) & 32767 AS chunk
              FROM sig CROSS JOIN bandspec),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                              a.simhash AS sh_a, b.simhash AS sh_b
              FROM banded a JOIN banded b ON a.band = b.band AND a.chunk = b.chunk
              WHERE a.doc_id < b.doc_id)
            SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
            FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
            ORDER BY id_a, id_b
        """,
        "embedding_topk": """
            SELECT query_id, neighbor_id, cos_sim, rank FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos_sim,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) DESC,
                                e.vec_id) AS rank
              FROM embeddings q JOIN embeddings e ON q.vec_id != e.vec_id
              WHERE q.vec_id < 5) t
            WHERE rank <= 10
            ORDER BY query_id, rank
        """,
        "embedding_dup_exact": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.99
            ORDER BY id_a, id_b
        """,
        # quality-contract oracles: the SQL states the EXPECTED outcome (the
        # floors hold / the twin pair sets are identical); the Spark side
        # genuinely computes recall / the symmetric difference, so a
        # regression flips a value and the driver's hash check goes red
        "ann_recall": """
            SELECT method, 10 AS k,
                   (SELECT count(*) FROM embeddings WHERE vec_id < 5) AS n_queries,
                   true AS passes_floor,
                   true AS hits_bounded
            FROM (SELECT 'ivf' AS method UNION ALL SELECT 'lsh')
            ORDER BY method
        """,
        # the clustered table is engine-synthesized (deterministic Gaussian
        # mixture, CLUSTERED_EMB) — its size and query count are contract
        # constants, so the oracle states them and the floors literally
        "ann_recall_clustered": f"""
            SELECT method, 10 AS k,
                   {CLUSTERED_EMB["n_clusters"]} AS n_queries,
                   true AS passes_floor,
                   true AS scan_bounded,
                   true AS hits_bounded
            FROM (SELECT 'ivf' AS method UNION ALL SELECT 'lsh')
            ORDER BY method
        """,
        # labeled corpus is engine-synthesized (deterministic, seed pinned):
        # the truth-pair count and the floor outcomes are contract literals
        "dedup_quality": f"""
            SELECT detector,
                   {DUP_QUALITY_TRUE_PAIRS} AS n_true_pairs,
                   true AS precision_ok,
                   true AS recall_ok,
                   true AS tp_bounded
            FROM (SELECT 'consensus' AS detector UNION ALL SELECT 'minhash'
                  UNION ALL SELECT 'ngram' UNION ALL SELECT 'simhash'
                  UNION ALL SELECT 'simhash_r8')
            ORDER BY detector
        """,
        "minhash_engine_parity": """
            SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
                   CAST(NULL AS VARCHAR) AS only_in
            WHERE 1 = 0
        """,
    }
    # dedup_consensus composes the three portable detector oracles verbatim
    # (as parenthesized subqueries — DuckDB allows WITH inside a derived
    # table), exactly mirroring how the Spark query reuses the three driver
    # queries; any drift in a detector shows up in BOTH sides identically,
    # and a composition bug shows up as a consensus mismatch.
    oracles["dedup_consensus"] = f"""
        WITH all_pairs AS (
            SELECT id_a, id_b, 'ngram' AS src FROM ({oracles["ngram_jaccard"]})
            UNION ALL
            SELECT id_a, id_b, 'minhash' AS src FROM ({oracles["minhash_dups_md5"]})
            UNION ALL
            SELECT id_a, id_b, 'simhash' AS src FROM ({oracles["simhash_dups_md5"]})
        )
        SELECT id_a, id_b,
               CAST(count(*) AS BIGINT) AS n_signals,
               CAST(max(CASE WHEN src = 'ngram' THEN 1 ELSE 0 END) AS BIGINT) AS has_ngram,
               CAST(max(CASE WHEN src = 'minhash' THEN 1 ELSE 0 END) AS BIGINT) AS has_minhash,
               CAST(max(CASE WHEN src = 'simhash' THEN 1 ELSE 0 END) AS BIGINT) AS has_simhash
        FROM all_pairs
        GROUP BY id_a, id_b
        ORDER BY id_a, id_b
    """
    # keep-policy: ≥2-vote consensus edges → recursive-CTE transitive
    # closure with min-id canonical labeling, mirroring the CC kernel's
    # min-uid component labels
    oracles["dedup_keep_policy"] = f"""
        WITH RECURSIVE cons AS ({oracles["dedup_consensus"]}),
        edges AS (SELECT id_a AS src, id_b AS dst FROM cons WHERE n_signals >= 2),
        und AS (
            SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
        reach(node, r) AS (
            SELECT src AS node, dst AS r FROM und
            UNION
            SELECT u.src AS node, reach.r FROM und u JOIN reach ON u.dst = reach.node)
        ,
        cl AS (
            SELECT node AS doc_id, least(node, min(r)) AS canonical_id
            FROM reach GROUP BY node),
        -- per-doc quality score: the same expression the green doc_quality
        -- oracle uses, replayed per doc_id
        ts AS (
            SELECT doc_id,
                   len({_TOKENS}) AS n_tok,
                   CASE WHEN len({_TOKENS}) > 0 THEN
                      round(list_sum(list_transform({_TOKENS}, t -> len(t)))
                            * 1.0 / len({_TOKENS}), 4)
                   ELSE 0.0 END AS avg_token_len,
                   CASE WHEN len({_TOKENS}) > 0 THEN
                      round(len(list_filter({_TOKENS},
                            t -> list_contains([{_STOP_SQL}], lower(t))))
                            * 1.0 / len({_TOKENS}), 4)
                   ELSE 0.0 END AS stopword_ratio
            FROM documents),
        q AS (
            SELECT doc_id,
                   round((
                     (CASE WHEN n_tok BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) +
                     (CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
                     (CASE WHEN stopword_ratio >= 0.02 THEN 1.0 ELSE 0.0 END)
                   ) / 3.0, 4) AS score
            FROM ts),
        m AS (
            SELECT cl.doc_id, cl.canonical_id, q.score
            FROM cl LEFT JOIN q ON cl.doc_id = q.doc_id),
        best AS (
            SELECT canonical_id, max(score) AS bs FROM m GROUP BY canonical_id),
        surv AS (
            SELECT m.canonical_id, min(m.doc_id) AS quality_survivor_id
            FROM m JOIN best ON m.canonical_id = best.canonical_id
                AND m.score IS NOT DISTINCT FROM best.bs
            GROUP BY m.canonical_id)
        SELECT m.doc_id,
               m.canonical_id,
               m.doc_id = m.canonical_id AS keep,
               surv.quality_survivor_id,
               m.doc_id = surv.quality_survivor_id AS keep_quality
        FROM m JOIN surv ON m.canonical_id = surv.canonical_id
        ORDER BY doc_id
    """
    # capstone manifest: survivors of the keep policy, hash-split (same
    # thresholds as doc_split_counts), whitespace-token totals per cell
    oracles["corpus_manifest"] = f"""
        SELECT CASE
                 WHEN h < {rate_threshold(0.8)} THEN 'train'
                 WHEN h < {rate_threshold(0.8 + 0.1)} THEN 'val'
                 ELSE 'test'
               END AS split,
               lang, count(*) AS n_docs,
               CAST(sum(tc) AS BIGINT) AS total_tokens
        FROM (SELECT lang,
                     ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT AS h,
                     len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     t -> t != '')) AS tc
              FROM documents
              WHERE doc_id NOT IN (
                  SELECT doc_id FROM ({oracles["dedup_keep_policy"]}) WHERE NOT keep))
        GROUP BY 1, 2 ORDER BY split, lang
    """
    return oracles
