"""Training-shard writer: layout, determinism, in-file ordering, and
partition pruning on read-back."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.shards import (
    assign_shards,
    read_split,
    write_training_shards,
)


@pytest.fixture(scope="module")
def shard_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards") / "corpus")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    write_training_shards(docs, out, n_shards=4, max_records_per_file=200)
    return out


def test_layout_is_split_shard_partitioned(shard_dir):
    for split in ("train", "val", "test"):
        assert glob.glob(os.path.join(shard_dir, f"split={split}", "shard=*")), split


def test_round_trip_complete_and_assignment_stable(spark, sf_dir, shard_dir):
    docs = load_table(spark, sf_dir, "documents")
    back = spark.read.parquet(shard_dir)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # re-deriving the assignment matches what was written (pure function)
    expected = assign_shards(docs.select("doc_id"), n_shards=4).select(
        "doc_id", "split", "shard"
    )
    got = back.select("doc_id", "split", "shard")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_files_internally_ordered_and_bounded(shard_dir):
    files = glob.glob(os.path.join(shard_dir, "split=*", "shard=*", "*.parquet"))
    assert files
    for f in files:
        t = pq.read_table(f, columns=["shuffle_key"])
        assert t.num_rows <= 200, f
        keys = t.column("shuffle_key").to_pylist()
        assert keys == sorted(keys), f


def test_read_split_prunes_partitions(spark, shard_dir):
    df = read_split(spark, shard_dir, "train")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters")[1][:200]
    # only train rows come back
    assert df.filter(F.col("split") != "train").count() == 0
    assert df.count() > 0
