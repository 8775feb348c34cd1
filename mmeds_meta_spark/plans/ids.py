"""Hierarchical sample-ID generation and incremental additions
(W1/A2 — reference database.py:623-699 create_ids_file / add_aliquot /
add_sample; W2 — util.py:222-228).

The reference issues one COUNT + one INSERT per new child; here each
batch is a single window pass: ordinals continue from the current
per-parent child count, ``row_number`` over an explicit total order keeps
regeneration deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..normalize import Warehouse


def generate_child_ids(
    existing_counts: DataFrame,
    new_children: DataFrame,
    *,
    parent_id_col: str,
    parent_label_col: str,
    suffix: str,
    order_cols: list[str],
) -> DataFrame:
    """`{ParentID}{suffix}{n}` ids for a batch of new children.

    ``existing_counts``: (parent_id, n_existing) — the A2 aggregate over
    the warehouse.  New ordinals continue after n_existing.
    """
    w = Window.partitionBy(parent_id_col).orderBy(*order_cols)
    joined = new_children.join(existing_counts, parent_id_col, "left").fillna(
        0, subset=["n_existing"]
    )
    return joined.withColumn(
        "generated_id",
        F.concat(
            F.col(parent_label_col),
            F.lit(suffix),
            (F.col("n_existing") + F.row_number().over(w)).cast("string"),
        ),
    )


def generate_aliquot_ids(wh: Warehouse, new_aliquots: DataFrame) -> DataFrame:
    """`{SpecimenID}-Aliquot{n}` for rows of (idSpecimen, SpecimenID, ...);
    ordinals continue from the aliquots already in the warehouse."""
    counts = (
        wh.table("Aliquot")
        .filter(F.col("idAliquot") > 1)  # exclude the null seed row
        .groupBy("Specimen_idSpecimen")
        .agg(F.count("*").alias("n_existing"))
        .withColumnRenamed("Specimen_idSpecimen", "idSpecimen")
    )
    return generate_child_ids(
        counts,
        new_aliquots,
        parent_id_col="idSpecimen",
        parent_label_col="SpecimenID",
        suffix="-Aliquot",
        order_cols=["idSpecimen"],
    )


def generate_sample_ids(wh: Warehouse, new_samples: DataFrame) -> DataFrame:
    """`{AliquotID}-Sample{n}` continuation ids."""
    counts = (
        wh.table("Sample")
        .filter(F.col("idSample") > 1)
        .groupBy("Aliquot_idAliquot")
        .agg(F.count("*").alias("n_existing"))
        .withColumnRenamed("Aliquot_idAliquot", "idAliquot")
    )
    return generate_child_ids(
        counts,
        new_samples,
        parent_id_col="idAliquot",
        parent_label_col="AliquotID",
        suffix="-Sample",
        order_cols=["idAliquot"],
    )


def uniquify_ids(df: DataFrame, id_col: str, order_cols: list[str]) -> DataFrame:
    """W2 — meta-analysis RawDataID uniquification `{id}_{ordinal}`
    (util.py:222-228), as a window instead of a positional loop."""
    w = Window.partitionBy(id_col).orderBy(*order_cols)
    return df.withColumn(
        id_col,
        F.concat(
            F.col(id_col), F.lit("_"), (F.row_number().over(w) - 1).cast("string")
        ),
    )
