"""§1.3 — the document store (replaces MongoDB's MMEDSDoc).

One ``docs`` table: scalar fields + two map columns (``files`` name→path,
``config`` key→value).  Every reference query is an equality filter +
first() (database.py:967-1120), so a parquet table with predicate
pushdown is strictly more capable than the Mongo original.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_type", T.StringType()),      # study|analysis|sequencing_run
        T.StructField("owner", T.StringType()),
        T.StructField("study_name", T.StringType()),
        T.StructField("access_code", T.StringType()),
        T.StructField("reads_type", T.StringType()),
        T.StructField("analysis_status", T.StringType()),
        T.StructField("restart_stage", T.IntegerType()),
        T.StructField("exit_code", T.IntegerType()),
        T.StructField("created", T.TimestampType()),
        T.StructField("files", T.MapType(T.StringType(), T.StringType())),
        T.StructField("config", T.MapType(T.StringType(), T.StringType())),
    ]
)


class DocStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _table(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return self.spark.createDataFrame([], DOC_SCHEMA)

    def save(self, doc: dict) -> None:
        row = {f.name: doc.get(f.name) for f in DOC_SCHEMA.fields}
        self.spark.createDataFrame([row], DOC_SCHEMA).write.mode("append").parquet(self.path)
        # S10 — every save also materializes file_index.tsv (documents.py:52-70)
        if doc.get("files") and doc.get("file_index_path"):
            with open(doc["file_index_path"], "w", encoding="utf-8") as f:
                for name, p in sorted(doc["files"].items()):
                    f.write(f"{name}\t{p}\n")

    # S9 — equality-filter + first (get_doc, database.py:993-1006)
    def get_doc(self, **eq) -> dict | None:
        df = self._table()
        for k, v in eq.items():
            df = df.filter(F.col(k) == v)
        rows = df.limit(1).collect()
        return rows[0].asDict() if rows else None

    def get_all_studies(self, owner: str) -> DataFrame:
        return self._table().filter(
            (F.col("doc_type") == "study") & (F.col("owner") == owner)
        )

    def get_all_analyses_from_study(self, study_name: str) -> DataFrame:
        return self._table().filter(
            (F.col("doc_type") == "analysis") & (F.col("study_name") == study_name)
        )

    def get_metadata_file_location(self, study_name: str, owner: str) -> str | None:
        doc = self.get_doc(doc_type="study", study_name=study_name, owner=owner)
        return (doc or {}).get("files", {}).get("metadata")
