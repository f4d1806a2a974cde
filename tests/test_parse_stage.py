"""Spark parse stage: UDF↔kernel row parity + the span-sequence invariant."""

import pandas as pd
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from addressit_spark.kernel import parse
from addressit_spark.parity_cases import ALL_CASES
from addressit_spark.parse_stage import (
    DOCUMENTS_SCHEMA,
    make_parse_udf,
    normalize_documents,
    parse_spans,
    reassemble,
)
from addressit_spark.sources.corpus import (
    LOCALITY_KEYS,
    documents_view,
    soundex,
    synth_corpus,
)


@pytest.mark.parametrize("locale", ["en-US", "en-AU"])
def test_udf_matches_kernel_row_for_row(spark, locale):
    inputs = sorted({text for text, loc, _ in ALL_CASES if loc == locale})
    df = spark.createDataFrame([(t,) for t in inputs], ["text"])
    got = {
        r["text"]: r["address"].asDict(recursive=True)
        for r in df.select("text", make_parse_udf(locale)(F.col("text")).alias("address")).collect()
    }
    for t in inputs:
        want = parse(t, locale)
        assert got[t] == want, (t, got[t], want)


def test_udf_null_input(spark):
    df = spark.createDataFrame([(None,), ("Sydney",)], "text string")
    rows = df.select("text", make_parse_udf()(F.col("text")).alias("a")).collect()
    by_text = {r["text"]: r["a"] for r in rows}
    assert by_text["Sydney"]["regions"] == ["Sydney"]
    assert by_text[None]["text"] is None and by_text[None]["regions"] is None


def test_span_sequence_invariant(spark):
    """explode → parse → reassemble preserves (kind, text, media_ref, order)."""
    docs = documents_view(synth_corpus(spark, 300, seed=42)).cache()
    parsed = parse_spans(docs)
    rebuilt = reassemble(parsed.select("doc_id", "pos", "kind", "text", "media_ref", "offset"))
    cmp = docs.alias("a").join(rebuilt.alias("b"), "doc_id")
    mismatches = cmp.where(F.col("a.spans") != F.col("b.spans")).count()
    assert mismatches == 0
    assert rebuilt.count() == docs.count()


def test_flat_driver_shape(spark):
    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spans = normalize_documents(flat)
    assert spans.columns == ["doc_id", "pos", "kind", "text", "media_ref", "offset"]
    parsed = parse_spans(flat)
    assert parsed.count() == flat.count()
    # generic prose mostly parses to no street; must not error
    assert parsed.where(F.col("address").isNotNull()).count() == flat.count()


def test_nested_shape_schema_roundtrip(spark):
    docs = documents_view(synth_corpus(spark, 50, seed=42))
    # generator emits exactly the BASELINE.json input_hint shape
    assert [f.name for f in docs.schema["spans"].dataType.elementType.fields] == [
        "kind",
        "text",
        "media_ref",
        "offset",
    ]
    df2 = spark.createDataFrame(docs.collect(), DOCUMENTS_SCHEMA)
    assert df2.count() == docs.count()


def test_python_soundex_matches_spark(spark):
    words = LOCALITY_KEYS + ["ROBERT", "RUPERT", "ASHCRAFT", "TYMCZAK", "PFISTER", "HONEYMAN"]
    df = spark.createDataFrame([(w,) for w in words], ["w"]).select(
        "w", F.soundex("w").alias("sx")
    )
    for r in df.collect():
        assert soundex(r["w"]) == r["sx"], r


def test_io_roundtrip_and_partitioned_write(spark, tmp_path):
    """sources/io: parquet/json readers enforce the nested schema; the
    partitioned writer lands prunable bucket directories."""
    from addressit_spark.sources.corpus import documents_view, synth_corpus
    from addressit_spark.sources.io import read_documents, write_partitioned

    docs = documents_view(synth_corpus(spark, 50, seed=3))
    pq = str(tmp_path / "docs_pq")
    js = str(tmp_path / "docs_json")
    docs.write.mode("overwrite").parquet(pq)
    docs.write.mode("overwrite").json(js)

    got_pq = read_documents(spark, pq, "parquet")
    got_js = read_documents(spark, js, "json")
    assert got_pq.count() == got_js.count() == docs.count()
    assert got_js.schema["spans"].dataType == docs.schema["spans"].dataType

    part = str(tmp_path / "docs_part")
    write_partitioned(docs, part, buckets=8)
    import os

    bucket_dirs = [d for d in os.listdir(part) if d.startswith("doc_bucket=")]
    assert 1 <= len(bucket_dirs) <= 8
    back = spark.read.parquet(part)
    assert back.count() == docs.count()
    # partition pruning: a bucket filter reads only that directory
    one = back.where("doc_bucket = 3")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
