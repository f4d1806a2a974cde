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
