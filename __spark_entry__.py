"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship meta-analysis cohort query at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2 plus
the large-scale training-data-pipeline operators (dedup / similarity /
text analysis / multimodal plumbing).
``oracle_sql()`` — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mmeds_meta_spark.operators import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mmeds_meta_spark.operators.relational import q_meta_cohort

    return q_meta_cohort(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle is not None
    }
