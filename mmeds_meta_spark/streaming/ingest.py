"""Streaming document-ingest pipeline: the training-data intake path
(fingerprint → token stats → quality → train/eval split) as ONE
Structured Streaming flow sharing the batch operators' exact column
expressions.

Everything here is a narrow map — no shuffle, no state — which is the
point: at 100 TB/day intake, fingerprinting + scoring + splitting run at
source parallelism with exactly-once delivery from checkpoint +
idempotent sink alone.  Stateful stages (arrival dedup, windowed
rollups, sessionization) live in rollup.py/stateful.py; downstream
near-dup clustering is the batch job's business (it needs the full
corpus, not a horizon).

The batch twin (`ingest_profile``) is the SAME function applied to a
batch DataFrame — tests assert row-identical output, which is what
"unified batch/streaming" must mean under the exactness discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from ..operators.sampling import _EVAL_PCT, _bucket_expr

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

def ingest_profile(docs: DataFrame) -> DataFrame:
    """The intake projection, batch or streaming alike: content
    fingerprint, token count, stopword-free quality ratio, deterministic
    split.  All md5/instr arithmetic — identical values on every engine
    and on both execution modes.

    The split bucket is ``operators.sampling._bucket_expr`` — ONE
    definition shared with the batch ``sample_hash_split`` so streaming
    and batch splits can never drift apart."""
    bucket = F.expr(_bucket_expr("spark", "CAST(doc_id AS STRING)"))
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.md5("text").alias("fingerprint"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.length("text") / F.size(toks)).alias("chars_per_token"),
        (bucket % 100).cast("int").alias("bucket"),
        F.when(bucket % 100 < _EVAL_PCT, F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def streaming_ingest(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Un-started streaming DataFrame over a documents directory; caller
    attaches sink/trigger (tests: availableNow + memory sink)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)
    return ingest_profile(stream)
