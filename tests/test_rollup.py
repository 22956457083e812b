"""Incremental rollup: two-batch refresh equals from-scratch aggregation
bit-exactly, and untouched day partitions are not rewritten."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.rollup import daily_rollup_state, refresh_daily_rollup


def _rows(df):
    return sorted(
        tuple(str(v) for v in r)
        for r in df.select("day", "event_type", "n_events", "sum_value").collect()
    )


def test_incremental_refresh_matches_full_recompute(spark, sf_dir, tmp_path):
    out = str(tmp_path / "rollup")
    events = load_table(spark, sf_dir, "events")
    mid = events.select(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    first, second = (
        events.filter(F.col("event_id") <= mid),
        events.filter(F.col("event_id") > mid),
    )

    assert refresh_daily_rollup(spark, out, first) > 0
    files_after_first = {
        p: sorted(os.path.basename(f) for f in glob.glob(os.path.join(p, "*.parquet")))
        for p in glob.glob(os.path.join(out, "day=*"))
    }
    assert refresh_daily_rollup(spark, out, second) > 0

    got = spark.read.parquet(out)
    want = daily_rollup_state(events)
    assert _rows(got) == _rows(want)

    # any day only present in the first batch must be untouched by the
    # second refresh (same file names)
    second_days = {
        f"day={r[0]}" for r in daily_rollup_state(second).select("day").collect()
    }
    for p, files in files_after_first.items():
        if os.path.basename(p) not in second_days:
            now = sorted(
                os.path.basename(f) for f in glob.glob(os.path.join(p, "*.parquet"))
            )
            assert now == files, p


def test_refresh_empty_batch_is_noop(spark, sf_dir, tmp_path):
    out = str(tmp_path / "rollup2")
    events = load_table(spark, sf_dir, "events")
    refresh_daily_rollup(spark, out, events.limit(100))
    empty = events.filter(F.lit(False))
    assert refresh_daily_rollup(spark, out, empty) == 0


def test_streaming_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Drain the events table as a stream in bounded micro-batches; the
    foreachBatch-maintained rollup must equal the one-shot batch rollup
    bit-exactly."""
    import shutil

    from kinesis_spark.rollup import streaming_rollup_query
    from kinesis_spark.streaming.analytics import stream_events

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-000.parquet")

    out = str(tmp_path / "rollup_stream")
    q = streaming_rollup_query(
        spark,
        stream_events(spark, str(src), max_files_per_trigger=1),
        out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = daily_rollup_state(load_table(spark, sf_dir, "events"))
    assert _rows(got) == _rows(want)


def test_bootstrap_and_merged_partitions_share_one_decimal_type(spark, tmp_path):
    """The store must carry ONE parquet decimal type across bootstrap and
    merged rewrites — a mixed-precision store fails to read whenever the
    narrower footer wins schema inference."""
    from kinesis_spark.rollup import refresh_daily_rollup

    store = str(tmp_path / "rollup")
    day1 = spark.createDataFrame(
        [("2024-01-01 10:00:00", "click", 1.5)], "ts STRING, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    day2 = day1.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
    refresh_daily_rollup(spark, store, day1)          # bootstrap write
    refresh_daily_rollup(spark, store, day2)          # merged write
    types = {
        f.dataType.simpleString()
        for f in spark.read.parquet(store).schema.fields
        if f.name == "sum_value"
    }
    assert types == {"decimal(38,6)"}
    # and a third refresh over BOTH days still reads + merges cleanly
    n = refresh_daily_rollup(spark, store, day1.union(day2))
    assert n == 2


def test_refresh_wrong_schema_raises_not_bootstraps(spark, tmp_path):
    """A store that exists but cannot be read/projected must raise — never
    silently rebuild from the batch alone."""
    import pytest
    from pyspark.errors import AnalysisException

    from kinesis_spark.rollup import refresh_daily_rollup

    store = str(tmp_path / "not_a_rollup")
    spark.range(3).withColumn("day", F.lit("2024-01-01")).write.partitionBy(
        "day"
    ).parquet(store)
    batch = spark.createDataFrame(
        [("2024-01-01 10:00:00", "click", 1.0)], "ts STRING, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(AnalysisException):
        refresh_daily_rollup(spark, store, batch)
