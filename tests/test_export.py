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


def test_curriculum_order_materializes_via_sorted_export(spark, sf_dir, tmp_path):
    """The production face of p12: the curriculum schedule is
    MATERIALIZED with the range-partitioned ordered export (file order
    = global training order, no single-task sort), and reading the
    files back in name order reproduces p12's global_pos exactly —
    the registered query's ROW_NUMBER face and the export's
    file-offset arithmetic are the same order."""
    import glob

    from kinesis_spark.export import sorted_export
    from kinesis_spark.pins import release_shared_pins
    from kinesis_spark.queries import get_registry

    sched = get_registry()["p12_curriculum_interleave"].spark_fn(spark, sf_dir)
    want = [r.doc_id for r in sched.orderBy("global_pos").collect()]

    out = str(tmp_path / "curriculum")
    sorted_export(sched, ["global_pos"], out, n_files=8)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 1  # genuinely multi-file, order spans files
    got = []
    for f in files:
        got.extend(
            r.doc_id
            for r in spark.read.parquet(f).orderBy("global_pos").collect()
        )
    assert got == want
    release_shared_pins()
