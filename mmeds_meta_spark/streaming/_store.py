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

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _store_has_batches(spark: SparkSession, store_dir: str) -> bool:
    """True iff ``store_dir`` contains at least one committed
    ``batch_id=N`` partition directory.

    Round-9 ADVICE fix: the previous implementation probed with local
    ``glob.glob``, which always misses on a non-local filesystem
    (HDFS/S3 URIs that Spark's own writers/readers support) — a fed
    remote store silently read back as empty.  Probe through Spark's
    Hadoop ``FileSystem`` API instead, so the check resolves against
    whatever filesystem the URI names.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return False
    for status in fs.listStatus(path):
        if status.isDirectory() and status.getPath().getName().startswith(
            "batch_id="
        ):
            return True
    return False


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
    if not _store_has_batches(spark, store_dir):
        return spark.createDataFrame([], schema)
    try:
        df = spark.read.option("basePath", store_dir).parquet(store_dir)
    except AnalysisException:
        # Partition dirs exist but hold no committed parquet footers yet
        # (e.g. a crash between mkdir and commit): same monoid identity.
        return spark.createDataFrame([], schema)
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
