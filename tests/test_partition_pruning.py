"""Partition pruning through the partitioned parquet sink: a filter on
the partition column must become a PartitionFilter (directory-level
skip), not a row-level predicate over every file."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.sources import write_parquet


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_part"))
    write_parquet(
        load_table(spark, sf_dir, "events"), out, partition_by=["event_type"]
    )
    return out


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_filter_reaches_scan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("event_type") == "click"
    )
    plan = _plan(df)
    assert "PartitionFilters: [" in plan
    seg = plan[plan.index("PartitionFilters: [") :].split("]")[0]
    assert "event_type" in seg and "click" in seg


def test_pruned_read_returns_only_partition(spark, sf_dir, partitioned_events):
    got = (
        spark.read.parquet(partitioned_events)
        .filter(F.col("event_type") == "click")
        .count()
    )
    want = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert got == want > 0
