"""Index-table schema + create-if-not-exists semantics.

Reference parity: the fixed Azure Search index schema declared at
``db_utils.py:52-127`` (SURVEY §1.1) becomes a Spark StructType; the
create-or-update-at-startup idempotency (``db_utils.py:48,127``, O7)
becomes write-if-absent on a parquet table path.

Scale notes: the index table is partitioned by ``filename`` prefix
bucket rather than raw filename (unbounded cardinality would create a
small-files problem at 100 TB); dedup probes prune to one partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: db_utils.py:33 — reference vector dimensionality.
VECTOR_DIMENSIONS = 1536

#: The reference index schema (db_utils.py:53-91) in Spark types.
INDEX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("content", T.StringType()),
        T.StructField("content_vector", T.ArrayType(T.FloatType())),
        T.StructField("filename", T.StringType()),
        T.StructField("chunk_id", T.IntegerType()),
        T.StructField("text_hash", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("file_type", T.StringType()),
        T.StructField("page_number", T.IntegerType()),
        T.StructField("metadata", T.StringType()),
    ]
)

#: Number of filename-hash partitions for the index table.
INDEX_BUCKETS = 64


def empty_index(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], INDEX_SCHEMA)


def ensure_index_table(spark: SparkSession, path: str) -> None:
    """O7: idempotent create — write an empty parquet table if absent."""
    if not os.path.exists(path):
        (
            empty_index(spark)
            .withColumn("fbucket", F.abs(F.hash("filename")) % INDEX_BUCKETS)
            .write.mode("ignore")
            .partitionBy("fbucket")
            .parquet(path)
        )


def read_index(spark: SparkSession, path: str) -> DataFrame:
    # explicit schema: an empty (freshly ensured) table has no files to
    # infer from; partition column fbucket is appended by Spark and dropped
    df = spark.read.schema(INDEX_SCHEMA).parquet(path)
    return df.select([f.name for f in INDEX_SCHEMA.fields])


def write_index(df: DataFrame, path: str, mode: str = "append") -> None:
    """A19 sink: bulk columnar append (vs the reference's one-document-
    per-HTTP-call upsert, ``db_utils.py:169``)."""
    (
        df.select([f.name for f in INDEX_SCHEMA.fields])
        .withColumn("fbucket", F.abs(F.hash("filename")) % INDEX_BUCKETS)
        .write.mode(mode)
        .partitionBy("fbucket")
        .parquet(path)
    )
