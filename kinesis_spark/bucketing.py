"""Bucketed tables: pre-shuffled storage so repeated joins/aggregations
on the bucket key run with ZERO exchanges.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders) is
the shuffle. Bucketing both tables by the join key at write time moves
that shuffle to ingestion — every subsequent join, aggregation, or
window on the key is co-located. This is plain public Spark
(``DataFrameWriter.bucketBy``); bucket info lives in the session
catalog, and Catalyst drops the Exchange when both sides have the same
bucket count on the join key.

Sizing rule: pick ``num_buckets`` so one bucket at full scale ≈ one
task's worth of data (128-512 MB post-compression). 100 TB of lineitem
at 256 MB/bucket → ~400k buckets is too many files; in practice bucket
counts are powers of two in the 1k-16k range with multiple files per
bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    hint: str | None = None,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free
    when bucket specs match (asserted in tests/test_bucketing.py).

    ``hint='merge'`` forces a sort-merge join; at test SFs the dim side
    is under the broadcast threshold and would broadcast, which also
    avoids the shuffle but doesn't exercise the bucketed path that
    matters when BOTH sides are fact-sized."""
    left = spark.table(left_table)
    if hint:
        left = left.hint(hint)
    return left.join(spark.table(right_table), on=on, how=how)
