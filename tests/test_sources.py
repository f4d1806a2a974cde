"""Source readers: format routing incl. the catalog-table (Iceberg) route."""

import pytest

from addressit_spark.sources.io import read_documents, read_documents_snapshot


def test_read_documents_table_route(spark):
    df = spark.createDataFrame([("d1", "1 Main St Springfield")], ["doc_id", "text"])
    df.createOrReplaceTempView("docs_tbl")
    out = read_documents(spark, "docs_tbl", fmt="table")
    assert out.count() == 1
    assert set(out.columns) == {"doc_id", "text"}
    # current-snapshot time-travel route resolves through the same catalog
    out2 = read_documents_snapshot(spark, "docs_tbl")
    assert out2.count() == 1


def test_read_documents_rejects_unknown_format(spark):
    with pytest.raises(ValueError):
        read_documents(spark, "/tmp/x", fmt="orc2")


def test_read_documents_csv_typed(spark, tmp_path):
    p = str(tmp_path / "docs_csv")
    src = spark.createDataFrame(
        [(1, "1 Main St Springfield", "en", "web", 21)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src.coalesce(1).write.option("header", "true").mode("overwrite").csv(p)
    out = read_documents(spark, p, fmt="csv")
    types = dict(out.dtypes)
    # enforced flat schema, not inference: numerics stay typed
    assert types["doc_id"] == "bigint"
    assert types["n_chars"] == "bigint"
    assert types["text"] == "string"
    row = out.collect()[0]
    assert (row["doc_id"], row["text"], row["n_chars"]) == (
        1, "1 Main St Springfield", 21,
    )
