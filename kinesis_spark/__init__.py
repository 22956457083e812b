"""kinesis_spark — a PySpark-native engine with the capabilities of
remind101/kinesis (reference: /root/reference, read-only), extended with the
analytics layer the task rubric requires.

Layout
------
- ``kinesis_spark.session``   — tuned SparkSession builder (AQE, Arrow, 32 shuffle parts)
- ``kinesis_spark.io``        — table loaders for the driver's parquet fixtures
- ``kinesis_spark.ingest``    — Spark-first re-expression of the reference's
  buffer → load-shed → chunk → batch → PutRecords pipeline
  (reference: kinesis/kinesis.go:37-268, main.go:14-58)
- ``kinesis_spark.queries``   — registry of analytics operators; every entry has a
  Spark callable and (where SQL-expressible) a DuckDB oracle string
- ``kinesis_spark.streaming`` — Structured Streaming parity (rate soak, 1 s trigger,
  foreachBatch sink, drop accounting)
"""

__version__ = "0.1.0"
