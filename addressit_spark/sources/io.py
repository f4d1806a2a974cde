"""Document-table readers/writers for the engine's supported formats.

The input contract is the BASELINE input_hint shape — nested
``documents(doc_id, spans[])`` — or the flat driver shape
``documents(doc_id, text, …)``. Readers enforce the nested schema on
schemaless formats (JSON) so downstream stages never see drifting types;
writers partition output so a 10^12-row corpus lands as prunable files.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from addressit_spark.parse_stage import DOCUMENTS_SCHEMA

# The flat driver-testdata shape (documents.parquet at every sf). CSV is
# schemaless, so the reader enforces this instead of inferring — inference
# would both cost an extra pass over the files and let a dirty shard flip
# doc_id/n_chars to string mid-corpus.
FLAT_DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a documents table: parquet (self-describing), json
    (schema-enforced), or a catalog table (``fmt="table"`` — the
    Iceberg/Hive route; ``path`` is the table identifier).

    The north_star names Iceberg tables as the 10^12-doc source; through a
    catalog, ``spark.read.table`` gives snapshot isolation + partition/file
    pruning with the exact same downstream plan as the path-based readers
    (the catalog itself isn't installable in this sandbox, so the table
    route is exercised against the session catalog in tests).

    CSV cannot carry the nested span array; a CSV input is treated as the
    flat (doc_id, text) shape with a header.
    """
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "table":
        return spark.read.table(path)
    if fmt == "json":
        return spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    if fmt == "csv":
        return (
            spark.read.option("header", "true")
            .schema(FLAT_DOCUMENTS_SCHEMA)
            .csv(path)
        )
    raise ValueError(f"unsupported documents format: {fmt}")


def read_documents_snapshot(
    spark: SparkSession,
    table: str,
    snapshot_id: Optional[int] = None,
    as_of_timestamp: Optional[str] = None,
) -> DataFrame:
    """Time-travel read of a catalog documents table (Iceberg semantics).

    Maps to the DataFrameReader time-travel options Iceberg's Spark runtime
    honors (``snapshot-id`` / ``as-of-timestamp``); with neither set this is
    a plain current-snapshot ``read.table``. A resumed pipeline run pins the
    snapshot id in its lineage so every stage re-reads the same immutable
    input.
    """
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp is not None:
        reader = reader.option("as-of-timestamp", as_of_timestamp)
    return reader.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: Optional[str] = None,
    buckets: int = 64,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write with a stable hash-partition layout.

    ``partition_col`` defaults to a hash bucket of doc_id so files stay
    balanced regardless of id distribution — the layout a resume/consumer
    job can re-read with partition pruning on the bucket column.
    """
    out = df
    if partition_col is None:
        partition_col = "doc_bucket"
        out = df.withColumn(
            partition_col, F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("int")
        )
    out.write.mode(mode).partitionBy(partition_col).format(fmt).save(path)
