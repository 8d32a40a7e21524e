"""loongcollector_spark — a brand-new PySpark-native parse → enrich → route → aggregate
log/telemetry analytics engine with the query semantics of the LoongCollector
(island086/loongcollector) processor pipeline, re-expressed Spark-first.

Design stance (see SURVEY.md):
  * DataFrame/SQL declarative plans, Catalyst optimizes — no hand-scheduled execution.
  * All hot-path expressions are native ``pyspark.sql.functions`` (whole-stage codegen);
    Python appears only as Arrow-batched pandas UDFs where semantics demand it
    (general UTF-8 token decode, md5-desensitize, recursive JSON flatten).
  * Input is an Iceberg/parquet table of pre-tokenized sequences
    ``(doc_id string, tokens array<int>, n_tok int, source string)``; the ``tokens``
    column is carried untouched end-to-end so routed-row token-array equality holds.
  * Skew is handled explicitly: salted ``repartition`` on ``(source, xxhash64(doc_id))``.
"""

__version__ = "0.1.0"
