"""Partitioned upsert: merge semantics, partition-scoped rewrite, and
untouched partitions left byte-identical."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.upsert import upsert_partitioned


@pytest.fixture()
def day_partitioned(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_month")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    o.write.mode("overwrite").partitionBy("month").parquet(out)
    return out


def _files_by_partition(d):
    return {
        p: sorted(
            (os.path.basename(f), os.path.getmtime(f))
            for f in glob.glob(os.path.join(d, p, "*.parquet"))
        )
        for p in (os.path.basename(x) for x in glob.glob(os.path.join(d, "month=*")))
    }


def test_upsert_merges_and_rewrites_only_touched_partitions(
    spark, day_partitioned
):
    before = spark.read.parquet(day_partitioned)
    months = sorted(
        r[0] for r in before.select("month").distinct().collect()
    )
    touched, untouched = months[0], months[1:]
    n_before = before.count()
    files_before = _files_by_partition(day_partitioned)

    # one updated key (price bumped) + one brand-new key, same partition
    some_key = before.filter(F.col("month") == touched).select(
        F.min("o_orderkey")
    ).first()[0]
    new_key = before.select(F.max("o_orderkey")).first()[0] + 1_000_000
    updates = spark.createDataFrame(
        [
            (some_key, 99999.0, "U", touched),
            (new_key, 1.0, "N", touched),
        ],
        "o_orderkey long, o_totalprice double, o_orderstatus string, month string",
    )

    n = upsert_partitioned(
        spark, day_partitioned, updates, key="o_orderkey", partition_col="month"
    )
    assert n == 1

    after = spark.read.parquet(day_partitioned)
    # count: +1 (insert), updated row replaced not duplicated
    assert after.count() == n_before + 1
    assert after.filter(F.col("o_orderkey") == some_key).count() == 1
    row = after.filter(F.col("o_orderkey") == some_key).first()
    assert row["o_totalprice"] == 99999.0 and row["o_orderstatus"] == "U"
    assert after.filter(F.col("o_orderkey") == new_key).count() == 1

    # untouched partitions: identical file names AND mtimes
    files_after = _files_by_partition(day_partitioned)
    for m in untouched:
        assert files_after[f"month={m}"] == files_before[f"month={m}"], m
    assert files_after[f"month={touched}"] != files_before[f"month={touched}"]


def test_upsert_empty_updates_is_noop(spark, day_partitioned):
    before = _files_by_partition(day_partitioned)
    empty = spark.createDataFrame(
        [],
        "o_orderkey long, o_totalprice double, o_orderstatus string, month string",
    )
    assert (
        upsert_partitioned(
            spark, day_partitioned, empty, key="o_orderkey", partition_col="month"
        )
        == 0
    )
    assert _files_by_partition(day_partitioned) == before


def test_upsert_is_idempotent(spark, day_partitioned):
    """Applying the same update batch twice leaves the dataset exactly
    as after the first application (CDC replays must be safe)."""
    before = spark.read.parquet(day_partitioned)
    month = before.select("month").first()[0]
    key = before.filter(F.col("month") == month).select(
        F.min("o_orderkey")
    ).first()[0]
    updates = spark.createDataFrame(
        [(key, 777.0, "I", month)],
        "o_orderkey long, o_totalprice double, o_orderstatus string, month string",
    )
    upsert_partitioned(spark, day_partitioned, updates, "o_orderkey", "month")
    first = sorted(map(str, spark.read.parquet(day_partitioned).collect()))
    upsert_partitioned(spark, day_partitioned, updates, "o_orderkey", "month")
    second = sorted(map(str, spark.read.parquet(day_partitioned).collect()))
    assert first == second


def test_upsert_bootstraps_missing_target(spark, tmp_path):
    """First batch against a nonexistent target writes the table instead
    of raising PATH_NOT_FOUND."""
    target = str(tmp_path / "fresh_target")
    updates = spark.createDataFrame(
        [(1, 10.0, "O", "2024-01"), (2, 20.0, "F", "2024-02")],
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING, month STRING",
    )
    n = upsert_partitioned(spark, target, updates, "o_orderkey", "month")
    assert n == 2
    got = spark.read.parquet(target)
    assert got.count() == 2
    assert set(r.month for r in got.select("month").collect()) == {"2024-01", "2024-02"}


def test_upsert_dedups_duplicate_keys_in_batch(spark, day_partitioned):
    """Duplicate keys within one updates batch collapse to one whole row
    (MERGE forbids multi-match) — never two inserted copies, and never a
    chimera row mixing fields across duplicates."""
    dup = spark.createDataFrame(
        [(99999991, 1.0, "A", "1995-01"), (99999991, 2.0, "B", "1995-01")],
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING, month STRING",
    )
    upsert_partitioned(spark, day_partitioned, dup, "o_orderkey", "month")
    got = (
        spark.read.parquet(day_partitioned)
        .filter(F.col("o_orderkey") == 99999991)
        .collect()
    )
    assert len(got) == 1
    # struct-max keeps the greatest row INTACT: (2.0, "B"), never (2.0, "A")
    assert (got[0].o_totalprice, got[0].o_orderstatus) == (2.0, "B")


def test_streaming_upsert_applies_batches_in_order(spark, day_partitioned, tmp_path):
    """CDC loop: a stream of update files MERGEs batch-by-batch into the
    partitioned target; the final table equals the batch-ordered apply."""
    from kinesis_spark.upsert import streaming_upsert_query

    schema = "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING, month STRING"
    updates_dir = tmp_path / "updates"
    updates_dir.mkdir()
    import time as _time

    spark.createDataFrame(
        [(88888801, 11.0, "A", "1995-01"), (88888802, 12.0, "A", "1995-02")], schema
    ).coalesce(1).write.mode("overwrite").json(str(updates_dir / "b0"))
    _time.sleep(1.1)  # distinct mtimes => deterministic file-source order
    spark.createDataFrame(
        [(88888801, 99.0, "Z", "1995-01")], schema  # overwrites batch-0 row
    ).coalesce(1).write.mode("overwrite").json(str(updates_dir / "b1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(updates_dir) + "/*")
    )
    q = streaming_upsert_query(
        spark, stream, day_partitioned, "o_orderkey", "month",
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        r.o_orderkey: (r.o_totalprice, r.o_orderstatus)
        for r in spark.read.parquet(day_partitioned)
        .filter(F.col("o_orderkey").isin([88888801, 88888802]))
        .collect()
    }
    assert got == {88888801: (99.0, "Z"), 88888802: (12.0, "A")}


def test_upsert_wrong_partition_col_raises_not_bootstraps(spark, day_partitioned):
    """An analysis error that is NOT path-not-found (e.g. a typo'd
    partition column) must raise — never run the bootstrap overwrite
    against an existing table."""
    from pyspark.errors import AnalysisException

    bad = spark.createDataFrame(
        [(1, 1.0, "O", "1995-01")],
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING, mnth STRING",
    )
    before = spark.read.parquet(day_partitioned).count()
    with pytest.raises(AnalysisException):
        upsert_partitioned(spark, day_partitioned, bad, "o_orderkey", "mnth")
    assert spark.read.parquet(day_partitioned).count() == before


def test_null_key_update_replaces_not_duplicates(spark, tmp_path):
    """A NULL-key update must REPLACE the target's NULL-key row: plain
    key equality never matches NULL in the anti join, so the old row
    would survive and the new row union in beside it — duplicating
    silently every batch."""
    out = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(None, 1.0, "2024-01"), (7, 2.0, "2024-01")],
        "k int, v double, month string",
    )
    base.write.mode("overwrite").partitionBy("month").parquet(out)
    upd = spark.createDataFrame(
        [(None, 9.0, "2024-01")], "k int, v double, month string"
    )
    upsert_partitioned(spark, out, upd, key="k", partition_col="month")
    rows = sorted(
        ((r.k, r.v) for r in spark.read.parquet(out).collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert rows == [(7, 2.0), (None, 9.0)]  # one NULL row, the new one
