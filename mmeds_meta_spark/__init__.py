"""mmeds_meta_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of clemente-lab/mmeds-meta.

Built Spark-first: DataFrame/SQL plans optimized by Catalyst, broadcast
joins for small dimensions, decimal-exact aggregation where cross-engine
determinism matters, and Arrow-batched Pandas UDFs only where built-in
operators cannot express the semantics.

Layout
------
- ``catalog``    : static schema catalog (the reference's 41-table snowflake,
                   table ordering, protected sets, declared-type map).
- ``sources``    : readers/writers — the MMEDS 5-row-header metadata TSV,
                   feature tables, QIIME mapping files, FASTQ barcode scans.
- ``validation`` : the metadata validation rule engine (SURVEY §2.8 checks)
                   emitting (row, col, message) diagnostics.
- ``normalize``  : set-based snowflake normalization (replaces the
                   reference's per-row recursive SQLBuilder).
- ``plans``      : view layer (SpecimenView … MetaAnalysisView), RLS,
                   query entry points.
- ``operators``  : the operator inventory demonstrated over the synthetic
                   testdata tables, incl. large-scale training-data-pipeline
                   operators (dedup, similarity search, text analysis,
                   multimodal plumbing).
- ``functions``  : scalar/column function library (ICD parse, camel case,
                   numeric checks, …).
- ``streaming``  : structured-streaming counterparts (incremental upload
                   validation / event rollups).
"""

__version__ = "0.1.0"
