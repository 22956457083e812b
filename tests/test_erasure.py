"""Right-to-erasure on partitioned stores: matching rows disappear,
untouched partitions stay byte-identical, fully-erased partitions lose
their directories (the dynamic-overwrite pitfall), and the audit counts
are the deletion evidence."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kinesis_spark.erasure import erase_by_key


def _store(spark, path: str) -> None:
    rows = [
        # (user_id, lang, payload)
        (1, "en", "a"), (1, "en", "b"), (2, "en", "c"),
        (1, "de", "d"), (3, "de", "e"),
        (4, "fr", "f"), (4, "fr", "g"),
        (None, "it", "h"), (5, "it", "i"),
    ]
    spark.createDataFrame(rows, "user_id int, lang string, payload string") \
        .repartition(2).write.partitionBy("lang").parquet(path)


def test_erase_rewrites_only_touched_partitions(spark, tmp_path):
    d = str(tmp_path / "store")
    _store(spark, d)
    before = {p: os.path.getmtime(p) for p in glob.glob(f"{d}/lang=*/*.parquet")}

    req = spark.createDataFrame([(1,)], "user_id int")
    audit = {r.partition_value: r for r in erase_by_key(
        spark, d, req, "user_id", "lang").collect()}

    assert set(audit) == {"en", "de"}
    assert audit["en"].n_rows_erased == 2 and audit["en"].n_keys_matched == 1
    assert audit["de"].n_rows_erased == 1
    assert not audit["en"].partition_emptied and not audit["de"].partition_emptied

    left = spark.read.parquet(d)
    assert left.filter(F.col("user_id") == 1).count() == 0
    assert left.count() == 6  # 9 - 3 erased
    # fr and it were never touched: same files, same mtimes
    for p, m in before.items():
        if "lang=fr" in p or "lang=it" in p:
            assert os.path.getmtime(p) == m, p


def test_erase_removes_fully_emptied_partition_directory(spark, tmp_path):
    d = str(tmp_path / "store")
    _store(spark, d)
    req = spark.createDataFrame([(4,)], "user_id int")  # all of lang=fr
    audit = erase_by_key(spark, d, req, "user_id", "lang").collect()
    assert len(audit) == 1
    assert audit[0].partition_value == "fr" and audit[0].partition_emptied
    assert audit[0].n_rows_erased == 2
    assert not os.path.isdir(f"{d}/lang=fr")  # data really gone, not masked
    assert spark.read.parquet(d).filter(F.col("lang") == "fr").count() == 0


def test_erase_matches_null_keys_and_unknown_keys_noop(spark, tmp_path):
    d = str(tmp_path / "store")
    _store(spark, d)
    # unknown keys: empty audit, store untouched
    before = sorted(glob.glob(f"{d}/lang=*/*.parquet"))
    none = erase_by_key(
        spark, d, spark.createDataFrame([(99,)], "user_id int"), "user_id", "lang"
    )
    assert none.count() == 0
    assert sorted(glob.glob(f"{d}/lang=*/*.parquet")) == before

    # a NULL-key row must be erasable (eqNullSafe, upsert's discipline)
    req = spark.createDataFrame([(None,)], "user_id int")
    audit = erase_by_key(spark, d, req, "user_id", "lang").collect()
    assert len(audit) == 1 and audit[0].partition_value == "it"
    assert audit[0].n_rows_erased == 1 and audit[0].n_keys_matched == 1
    assert not audit[0].partition_emptied
    left = spark.read.parquet(d).filter(F.col("lang") == "it").collect()
    assert [r.payload for r in left] == ["i"]


def test_erase_missing_store_raises(spark, tmp_path):
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        erase_by_key(
            spark,
            str(tmp_path / "nope"),
            spark.createDataFrame([(1,)], "user_id int"),
            "user_id",
            "lang",
        )


def test_streaming_erasure_applies_and_replays_idempotently(spark, tmp_path):
    """The foreachBatch face: a drained stream of requests erases the
    same rows erase_by_key would, and re-draining the SAME requests
    (fresh checkpoint = full replay) leaves the store unchanged."""
    from kinesis_spark.erasure import streaming_erasure_query

    d = str(tmp_path / "store")
    _store(spark, d)
    req_dir = str(tmp_path / "requests")
    spark.createDataFrame([(1,), (4,)], "user_id int").write.parquet(req_dir)

    def drain(cp: str) -> None:
        q = streaming_erasure_query(
            spark,
            spark.readStream.schema("user_id int").parquet(req_dir),
            d, "user_id", "lang", str(tmp_path / cp),
        )
        q.awaitTermination(120)

    drain("cp1")
    left = spark.read.parquet(d)
    assert left.filter(F.col("user_id").isin([1, 4])).count() == 0
    assert left.count() == 4  # 9 - (3 rows of user 1) - (2 rows of user 4)
    assert not os.path.isdir(f"{d}/lang=fr")
    files = sorted(glob.glob(f"{d}/lang=*/*.parquet"))

    drain("cp2")  # full replay of the same requests
    assert sorted(glob.glob(f"{d}/lang=*/*.parquet")) == files
    assert spark.read.parquet(d).count() == 4
