"""Compaction: many small files → few target-sized files, content
unchanged, and the default path is shuffle-free."""

from __future__ import annotations

import glob
import os

import pytest

from kinesis_spark.compact import compact_dataset, dataset_bytes
from kinesis_spark.io import load_table


@pytest.fixture(scope="module")
def fragmented_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("frag") / "docs")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(64).write.mode("overwrite").parquet(d)
    return d


def _parquet_files(d):
    return glob.glob(os.path.join(d, "*.parquet"))


def test_compaction_reduces_file_count(spark, fragmented_dir, tmp_path):
    out = str(tmp_path / "compacted")
    total = dataset_bytes(spark, spark.read.parquet(fragmented_dir))
    # target = half the dataset → expect exactly 2 output files
    n = compact_dataset(spark, fragmented_dir, out, target_file_bytes=total // 2 + 1)
    assert n == 2
    assert len(_parquet_files(out)) == 2
    assert len(_parquet_files(fragmented_dir)) == 64


def test_compaction_preserves_content(spark, fragmented_dir, tmp_path):
    out = str(tmp_path / "compacted2")
    compact_dataset(spark, fragmented_dir, out, target_file_bytes=1 << 40)
    a = spark.read.parquet(fragmented_dir)
    b = spark.read.parquet(out)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_default_compaction_is_shuffle_free(spark, fragmented_dir):
    df = spark.read.parquet(fragmented_dir).coalesce(2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dataset_bytes_handles_space_in_path(spark, tmp_path):
    """inputFiles() returns percent-encoded URIs while the JVM listing
    decodes them — a path with a space must still size correctly instead
    of tripping the partial-metadata guard."""
    src = str(tmp_path / "dir with space" / "data")
    spark.range(100).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    total = dataset_bytes(spark, df)
    on_disk = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(src, "*.parquet"))
    )
    assert total == on_disk > 0


def test_coalesce_count_clamped_to_input_partitions(spark, tmp_path):
    """A tiny target size cannot make coalesce split partitions — the
    returned count must match the files actually written."""
    import glob

    from kinesis_spark.compact import compact_dataset

    src = str(tmp_path / "one_part")
    spark.range(1000).coalesce(1).write.parquet(src)
    out = str(tmp_path / "compacted")
    n = compact_dataset(spark, src, out, target_file_bytes=64)  # absurdly small
    written = len(glob.glob(out + "/part-*.parquet"))
    assert n == written == 1


def test_in_place_compaction(spark, sf_dir, tmp_path):
    """out_dir == in_dir is the canonical maintenance call: the shaped
    data materializes (localCheckpoint) before the overwrite, so Spark's
    cannot-overwrite-a-path-being-read guard doesn't abort it. (Own
    fragmented copy — the shared fixture is module-scoped and must not
    be mutated.)"""
    d = str(tmp_path / "frag_inplace")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(16).write.mode("overwrite").parquet(d)
    ids = sorted(r.doc_id for r in spark.read.parquet(d).select("doc_id").collect())
    n = compact_dataset(spark, d, d)
    after = spark.read.parquet(d)
    assert sorted(r.doc_id for r in after.select("doc_id").collect()) == ids
    assert n >= 1
    assert len(_parquet_files(d)) < 16
