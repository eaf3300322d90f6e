"""PySpark-native analytics engine with the query and data-processing
capabilities of ``brandthn/esgi-4iabd2-sparkstreaming-groupe13``.

A from-scratch rebuild (NOT a port): the reference is a Scala
Spark-batch producer + Structured-Streaming consumer + pandas dashboard
over NYC yellow-taxi trip records (see SURVEY.md). This package
re-expresses that surface — and extends it with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) — in idiomatic DataFrame / Spark SQL /
Structured Streaming, designed so every plan survives a 1000-executor,
100 TB deployment even though tests run on ``local[*]``.

Layout:
  session.py    SparkSession factory (reference X4 semantics)
  config.py     engine config dataclasses (mirrors application.conf knobs)
  schemas.py    explicit StructTypes (trip record §1.2, output contracts)
  sources/      batch CSV / parquet scans, streaming file source
  operators/    relational core, joins, windows, dedup, similarity, text
  plans/        the declared query registry (driver + bench contract)
  streaming/    consumer pipeline (foreachBatch multi-sink) + replay producer
"""

__version__ = "0.1.0"
