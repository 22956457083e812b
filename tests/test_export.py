"""Sorted export: global order across file boundaries, no single-task
sort in the plan."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kinesis_spark.export import sorted_export
from kinesis_spark.io import load_table


def test_files_concatenate_to_global_order(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sorted_lineitem")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    sorted_export(li, ["l_shipdate", "l_orderkey"], out, n_files=8)

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) >= 2  # the range partitioner actually split
    prev_max = None
    total = 0
    for f in files:
        t = pq.read_table(f, columns=["l_shipdate", "l_orderkey"])
        keys = list(zip(t.column("l_shipdate").to_pylist(),
                        t.column("l_orderkey").to_pylist()))
        assert keys == sorted(keys), f  # sorted within the file
        if keys:
            if prev_max is not None:
                assert prev_max <= keys[0], f  # boundaries respect order
            prev_max = keys[-1]
            total += len(keys)
    assert total == li.count()


def test_export_plan_uses_range_partitioning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    shaped = li.repartitionByRange(8, "l_shipdate").sortWithinPartitions(
        "l_shipdate"
    )
    plan = shaped._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan
