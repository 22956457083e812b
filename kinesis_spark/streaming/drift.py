"""Streaming PSI drift monitor — dq4's always-on production face.

A pipeline does not re-profile a 100 TB reference table on every
micro-batch: the reference distribution is captured ONCE
(:func:`write_psi_reference`, PSI_BINS rows of (bin, ref_cnt)), and the
monitor folds each arriving micro-batch into a durable cumulative
current-distribution profile, scoring PSI against the reference after
every batch. The math is dq4's exactly — shared
:func:`~kinesis_spark.queries.lineage.psi_bin` /
:func:`~kinesis_spark.queries.lineage.psi_score` helpers, so the
monitor and the batch report can never disagree on binning, smoothing,
or the decimal ln bridge (parity asserted bit-exact in
tests/test_streaming_drift.py).

Replay idempotence (the repo's foreachBatch discipline, same as
streaming/bloom_dedup.py): each batch's bin counts land in an
OVERWRITE commit keyed by the batch id (``.../batch_id=<id>/``), so an
at-least-once redelivery rewrites its own slot instead of
double-counting; the per-batch report is committed the same way. State
size is PSI_BINS rows per batch — the monitor's storage grows with
batch COUNT, never data volume, and the per-batch scoring job touches
only spine-sized relations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesis_spark.queries.lineage import PSI_BINS, psi_bin, psi_score


def write_psi_reference(
    ref_df: DataFrame, value_col: str, ref_path: str
) -> None:
    """Capture the reference profile: (bin, ref_cnt) over ``value_col``
    under dq4's binning — one scan of the reference slice, run once."""
    (
        ref_df.select(psi_bin(F.col(value_col)).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ref_cnt"))
        .write.mode("overwrite")
        .parquet(ref_path)
    )


def _filled_counts(
    spark: SparkSession, ref_path: str, batches_dir: str
) -> DataFrame:
    """(bin, ref_cnt, cur_cnt) over the full PSI_BINS spine: reference
    profile left-joined with the cumulative sum of every committed
    batch's counts (re-reading per-batch slots keeps redelivery
    overwrite-safe; the relation is batches x PSI_BINS rows, tiny)."""
    spine = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    ref = spark.read.parquet(ref_path)
    cur = (
        spark.read.parquet(batches_dir)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cur_cnt"))
    )
    return (
        spine.join(ref, "bin", "left")
        .join(cur, "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_cnt", F.lit(0)).cast("bigint").alias("ref_cnt"),
            F.coalesce("cur_cnt", F.lit(0)).cast("bigint").alias("cur_cnt"),
        )
    )


def start_psi_drift_query(
    stream: DataFrame,
    ref_path: str,
    value_col: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Start the monitor: every micro-batch commits its bin counts
    (overwrite-by-batch-id) and publishes the dq4 report — cumulative
    current distribution vs the captured reference — under
    ``out_dir/batch_id=<id>/``. Read the report with
    ``spark.read.parquet(out_dir)``; the latest batch_id is the current
    drift state, and `drift_alert` flips when cumulative PSI crosses
    the conventional 0.2."""
    batches_dir = os.path.join(state_dir, "batches")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        (
            batch_df.select(psi_bin(F.col(value_col)).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .write.mode("overwrite")
            .parquet(os.path.join(batches_dir, f"batch_id={batch_id}"))
        )
        report = psi_score(_filled_counts(spark, ref_path, batches_dir))
        report.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
