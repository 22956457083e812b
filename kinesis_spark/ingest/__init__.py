"""Spark-first re-expression of the reference ingestion pipeline.

Reference (remind101/kinesis) dataflow — buffer → load-shed → chunk →
batch → PutRecords (kinesis/kinesis.go:37-268):

- ``limits``    — the reference's catalog constants, incl. the three it
  declares but never enforces (we enforce them; SURVEY.md §1.3)
- ``chunker``   — fixed-size payload chunking (kinesis/kinesis.go:244-268),
  both pure-Python (CLI/library parity) and as a DataFrame transform
- ``writer``    — chunk + batch + PutRecords with an injectable client
  (the ``kinesisClient`` seam, kinesis/kinesis.go:171-173)
- ``buffered``  — 4 MB / 1 s size-or-time micro-batcher
  (kinesis/kinesis.go:64-103)
- ``drop``      — bounded-queue load shedding with observable drops
  (kinesis/kinesis.go:105-155)
- ``pipeline``  — the fixed 3-node composition ``NewFastWriter`` builds
  (kinesis/kinesis.go:37-57)
"""

from kinesis_spark.ingest.buffered import BufferedWriter
from kinesis_spark.ingest.chunker import chunk_bytes, chunk_df
from kinesis_spark.ingest.drop import DropWriter
from kinesis_spark.ingest.limits import (
    BUFFER_SIZE,
    DROP_QUEUE_DEPTH,
    FLUSH_PERIOD_S,
    PUT_RECORDS_LIMIT,
    PUT_RECORDS_SIZE_LIMIT,
    RECORD_SIZE_LIMIT,
)
from kinesis_spark.ingest.pipeline import new_fast_writer
from kinesis_spark.ingest.writer import Record, Writer

__all__ = [
    "BUFFER_SIZE",
    "BufferedWriter",
    "DROP_QUEUE_DEPTH",
    "DropWriter",
    "FLUSH_PERIOD_S",
    "PUT_RECORDS_LIMIT",
    "PUT_RECORDS_SIZE_LIMIT",
    "RECORD_SIZE_LIMIT",
    "Record",
    "Writer",
    "chunk_bytes",
    "chunk_df",
    "new_fast_writer",
]
