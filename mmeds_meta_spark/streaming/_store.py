"""Shared reader for batch-keyed parquet stores.

Every streaming twin in this package accumulates state in a
``store_dir/batch_id=N/`` layout (each micro-batch overwrites only its
own partition — the exactly-once-under-replay convention).  Before the
first micro-batch commits, the directory is empty (or absent), and a
bare ``spark.read.parquet(store_dir)`` raises an unable-to-infer-schema
``AnalysisException``.  Probing an un-fed store must instead be
well-defined (round-8 ADVICE): :func:`read_store` pins the data-column
schema explicitly and returns an EMPTY relation with exactly that
schema when no committed batch partition exists yet.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_store(spark: SparkSession, store_dir: str, ddl: str) -> DataFrame:
    """Read a ``batch_id=*``-partitioned parquet store with a pinned
    data-column schema ``ddl`` (e.g. ``"pos BIGINT"``).

    - un-fed store (no ``batch_id=*`` partition yet, or the directory
      does not exist): returns an empty DataFrame with the declared
      columns — the OR/SUM/MAX-monoid identity for every store here.
    - fed store: reads the partitions and projects/casts to the same
      declared columns, so both branches are schema-identical.
    """
    schema = StructType.fromDDL(ddl)
    if not glob.glob(os.path.join(store_dir, "batch_id=*")):
        return spark.createDataFrame([], schema)
    df = spark.read.option("basePath", store_dir).parquet(store_dir)
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
