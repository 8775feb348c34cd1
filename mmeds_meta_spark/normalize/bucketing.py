"""Bucketed warehouse layout — co-located spine joins without shuffles.

The plain ``Warehouse`` stores each snowflake table as path-based parquet;
every spine join (Specimen⋈Aliquot, Aliquot⋈Sample, RawData⋈Results, …)
then re-shuffles both sides on the join key.  At 100 TB the lower spine
(Specimen → Aliquot → Sample → RawData → Results) holds the bulk of the
rows — these are the reference's per-sample tables (sql/tables.sql:295-620),
exactly the ones that grow with data volume while the upper dims
(Lab/Type/BodySite/...) stay bounded and broadcastable.

``BucketedWarehouse`` writes every table through the session catalog with
``bucketBy(n, key)`` + ``sortBy(key)``:

* big children bucket on their PARENT FK (Aliquot on Specimen_idSpecimen,
  RawData on Sample_idSample, Results on RawData_Sample_idSample), so the
  parent⋈child equi-join needs no exchange on the child (big) side — and
  when the parent buckets on the same-valued key (Specimen on idSpecimen),
  no exchange on EITHER side: a pure bucket-local sort-merge join.
* everything else buckets on its PK — harmless (those dims broadcast), and
  it keeps one uniform write path.

Bucket files carry their bucket id in the filename, so the layout is
re-attachable: a fresh session re-registers each table with ``CREATE TABLE
… USING PARQUET CLUSTERED BY … LOCATION`` and Spark trusts the on-disk
bucketing again — the path, not the (session-scoped) catalog, is the
durable store.

Bucket count is a knob: 32 here (local test parallelism); a 1000-executor
cluster would use O(thousands) so each bucket stays executor-memory-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..catalog import TABLES, struct_type
from .normalizer import Warehouse

# spine children bucket on the FK their biggest join uses; Specimen (the
# top of the per-sample spine) buckets on its PK so Specimen⋈Aliquot is
# exchange-free on both sides.
SPINE_BUCKET_KEYS = {
    "Specimen": "idSpecimen",
    "Aliquot": "Specimen_idSpecimen",
    "Sample": "Aliquot_idAliquot",
    "RawData": "Sample_idSample",
    "Results": "RawData_Sample_idSample",
}


def bucket_key(table: str) -> str:
    if table in SPINE_BUCKET_KEYS:
        return SPINE_BUCKET_KEYS[table]
    if "_has_" in table:  # junction: bucket on its first FK
        return next(c for c in TABLES[table] if c != "user_id")
    return f"id{table}"


class BucketedWarehouse(Warehouse):
    """Warehouse variant whose tables are catalog-registered bucketed
    parquet tables (CLUSTERED BY the spine join key)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        database: str = "mmeds_wh",
        buckets: int = 32,
    ):
        super().__init__(spark, path)
        self.database = database
        self.buckets = buckets
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
        for name in os.listdir(path):
            if name in TABLES and not self._registered(name):
                self._register(name)

    # -- catalog plumbing ---------------------------------------------------

    def _qualified(self, name: str) -> str:
        return f"{self.database}.`{name}`"

    def _registered(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._qualified(name))

    def _register(self, name: str) -> None:
        """Re-attach an on-disk bucketed table to the (session) catalog."""
        cols = ", ".join(
            f"`{c}` {f.dataType.simpleString()}" for c, f in zip(TABLES[name], struct_type(name).fields)
        )
        key = bucket_key(name)
        self.spark.sql(
            f"CREATE TABLE {self._qualified(name)} ({cols}) USING PARQUET "
            f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) INTO {self.buckets} BUCKETS "
            f"LOCATION '{self._file(name)}'"
        )

    # -- Warehouse surface --------------------------------------------------

    def exists(self, name: str) -> bool:
        return self._registered(name)

    def table(self, name: str) -> DataFrame:
        if self._registered(name):
            return self.spark.table(self._qualified(name))
        return self._empty(name)

    def append(self, name: str, df: DataFrame) -> None:
        import pyspark.sql.functions as F

        aligned = df.select(
            *[F.col(c).cast(f.dataType) for c, f in zip(TABLES[name], struct_type(name).fields)]
        )
        if not self._registered(name):
            aligned = self._empty(name).unionByName(aligned)
        key = bucket_key(name)
        (
            aligned.write.mode("append")
            .bucketBy(self.buckets, key)
            .sortBy(key)
            .option("path", self._file(name))
            .saveAsTable(self._qualified(name))
        )
