"""Deterministic hash sampling: layout-independence, split laws, md5 parity."""

import hashlib

import pytest

from pyspark.sql import functions as F

from addressit_spark.operators.sample import (
    SAMPLE_SPACE,
    rate_threshold,
    assign_split,
    hash_sample,
    sample_hash,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    import os
    return spark.read.parquet(
        os.path.join("/root/testdata/sf0.01", "documents.parquet")
    ).cache()


def _py_hash(key, seed):
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


def test_sample_hash_matches_python_md5(spark, docs):
    """The Spark conv/substr/md5 pipeline is bit-identical to the reference
    arithmetic (the same identity the DuckDB oracle relies on)."""
    rows = docs.select("doc_id", sample_hash(F.col("doc_id"), 42).alias("h")).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["h"] == _py_hash(r["doc_id"], 42)


def test_hash_sample_layout_independent(spark, docs):
    """Same keys kept regardless of partitioning — the property df.sample()
    lacks."""
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(7, "lang"), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_assign_split_disjoint_exhaustive_and_proportional(spark, docs):
    s = assign_split(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    n = docs.count()
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n  # exhaustive & disjoint (one row, one label)
    assert counts["train"] > counts["val"] + counts["test"]  # rough proportionality
    # split of a key never depends on which table it is read from
    again = assign_split(docs.select("doc_id"), "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    m1 = {r["doc_id"]: r["split"] for r in s.select("doc_id", "split").collect()}
    m2 = {r["doc_id"]: r["split"] for r in again.collect()}
    assert m1 == m2


def test_stratified_rates_apply_per_stratum(spark, docs):
    s = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0, "zh": 0.0}, default_rate=0.5, seed=7
    )
    kept = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept["en"] == full["en"]  # rate 1.0 keeps everything
    assert "zh" not in kept  # rate 0.0 keeps nothing
    for lang in set(full) - {"en", "zh"}:  # default applies to the rest
        assert 0 < kept.get(lang, 0) < full[lang]


def test_rate_threshold_validation():
    assert rate_threshold(0.0) == 0 and rate_threshold(1.0) == SAMPLE_SPACE
    with pytest.raises(ValueError):
        rate_threshold(1.5)
    with pytest.raises(ValueError):
        rate_threshold(-0.1)


def test_assign_split_weight_validation(spark, docs):
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", [])
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", [("a", 0.9), ("b", 0.2)])


def test_cross_table_consistency(spark, docs):
    """The same key samples the same way from any table — documents and
    their embeddings land on the same side of a split (the claim that makes
    hash sampling usable for multi-table datasets)."""
    import os

    emb = spark.read.parquet(os.path.join("/root/testdata/sf0.01", "embeddings.parquet"))
    d = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.4, seed=9).select("doc_id").collect()}
    e = {r["vec_id"] for r in hash_sample(emb, "vec_id", 0.4, seed=9).select("vec_id").collect()}
    assert d == e and len(d) > 0
