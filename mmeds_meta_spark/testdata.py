"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region/nation are fixed-size).  customer/supplier/part grow with SF and
# must NOT be unconditionally broadcast at 100 TB — Catalyst's
# autoBroadcastJoinThreshold + AQE make that call from observed sizes.
ALWAYS_BROADCAST = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # If the driver's data generation encoded events.ts as TIMESTAMP(NANOS),
    # this runtime-settable flag keeps the file readable (as long ns) under
    # ANY session; it is a no-op for µs timestamps.  Consumers dispatch on
    # the column's actual dtype (functions/event_time.py) either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
