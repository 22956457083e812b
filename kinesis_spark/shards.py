"""Deterministic training-shard writer: the physical layout step of an
LLM data pipeline. Combines the s9 split assignment and s10 reproducible
shuffle (same salted-md5 expressions — see ``queries/setops.py``) and
writes ``out_dir/split=<s>/shard=<n>/*.parquet`` with rows inside every
file ordered by the shuffle key.

Scale shape: ONE shuffle (the repartition on (split, shard)); the
within-partition sort is local, and ``partitionBy`` on the writer turns
(split, shard) into directory partitions so a training job reading
``split=train`` prunes at file-listing time — no data read for val/test.
``maxRecordsPerFile`` bounds individual file sizes without an extra
shuffle (the writer rolls files within a task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def hash_u32(key: Column, salt: str = "") -> Column:
    """First-8-hex-chars md5 of (salt || key) as a BIGINT in [0, 2^32):
    the shared sampling-decision hash. ONE definition for every
    hash-gated sampler (s5/s7/s8/s12/s13 in queries/setops.py) — the
    salt and the modulus are the only things that vary per consumer, so
    a width or formula change is a single edit, mirrored in each
    oracle's SQL spelling."""
    s = F.concat(F.lit(salt), key.cast("string")) if salt else key.cast("string")
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def hash_bucket(key: Column, modulo: int, salt: str = "") -> Column:
    """hash_u32 reduced to [0, modulo) — the per-mille/per-myriad keep
    decision. Plain % is safe: the hash is non-negative."""
    return hash_u32(key, salt) % modulo


def split_bucket(key: Column) -> Column:
    """Stable 0-99 bucket from a salted md5 of the row key (pure function
    of the key: append-stable, engine-independent)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint"),
        F.lit(100),
    )


def split_name(bucket: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    return (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )


def shuffle_key(key: Column, seed: str = "shuf42") -> Column:
    """Pseudo-random but reproducible ordering key."""
    return F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))


def shard_of(shuffle_key_col: Column, n_shards: int) -> Column:
    return F.pmod(
        F.conv(F.substring(shuffle_key_col, 1, 15), 16, 10).cast("bigint"),
        F.lit(n_shards),
    )


def assign_shards(
    docs: DataFrame,
    key: str = "doc_id",
    n_shards: int = 4,
    seed: str = "shuf42",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add (split, shard, shuffle_key) columns — all row-local expressions,
    no shuffle until the write repartitions."""
    k = F.col(key)
    sk = shuffle_key(k, seed)
    return (
        docs.withColumn("split", split_name(split_bucket(k), train_pct, val_pct))
        .withColumn("shuffle_key", sk)
        .withColumn("shard", shard_of(F.col("shuffle_key"), n_shards))
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    key: str = "doc_id",
    n_shards: int = 4,
    seed: str = "shuf42",
    max_records_per_file: int | None = None,
) -> None:
    """Materialize the sharded corpus: directory-partitioned by
    (split, shard), each file internally ordered by the shuffle key, so
    a sequential read of a shard IS the training order."""
    assigned = assign_shards(docs, key=key, n_shards=n_shards, seed=seed)
    writer = (
        assigned.repartition(F.col("split"), F.col("shard"))
        .sortWithinPartitions("split", "shard", "shuffle_key", key)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("split", "shard").parquet(out_dir)


def read_split(spark: SparkSession, out_dir: str, split: str) -> DataFrame:
    """Read one split; the filter is a partition filter (pruned at file
    listing, verified by plan audit in tests)."""
    return spark.read.parquet(out_dir).filter(F.col("split") == split)
