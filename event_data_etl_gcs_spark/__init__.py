"""event_data_etl_gcs_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference pipeline ``akashkatakam/event-data-etl-gcs``
(JSON event corpora -> star-schema Parquet; see SURVEY.md), extended with
the operators a large-scale (100 TB) training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, multimodal binary columns, and text
analysis.

Design principles (SURVEY.md §4, §7):
  * DataFrame/SQL first — declare logical plans, let Catalyst/Tungsten pick
    the physical strategy.
  * No row-at-a-time Python UDFs in hot paths; Arrow-batched pandas UDFs
    only where built-ins can't express the semantics.
  * Scale posture: AQE on, broadcast small dims, no coalesce(1), no
    driver-side collect loops, size-targeted output files.
"""

__version__ = "0.1.0"
