"""MERGE/upsert into a directory-partitioned parquet dataset — the CDC
maintenance operation for plain-parquet lakehouses (no table format).

Semantics: rows in ``updates`` replace target rows with the same key;
new keys are inserted. Only the directory partitions that the updates
touch are rewritten (dynamic partition overwrite); every other partition's
files are left byte-identical — at 100 TB the rewrite cost is proportional
to the changed partitions, never the table.

Scale shape: the affected-partition list is a distinct-collect of the
update batch's partition values (bounded by the batch, not the table);
the target read prunes to those partitions at file listing; the merge is
one left-anti join (update keys broadcast when small) + union. The
``localCheckpoint`` before the write breaks the read-from/overwrite-to
cycle on the same path by materializing the merged partitions.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
) -> int:
    """Merge ``updates`` into ``target_dir`` (parquet, partitioned by
    ``partition_col``). Returns the number of partitions rewritten.

    ``updates`` must carry the key and the partition column; a key's
    partition value may change only if the caller also emits a delete for
    the old partition (standard CDC contract for partition-keyed stores).
    Duplicate keys within one batch collapse to a single arbitrary
    winner (MERGE forbids multi-match); emit pre-deduped batches when
    the winner matters.
    """
    # MERGE semantics require at most one source row per key — collapse
    # in-batch duplicates to one whole row (struct-max keeps the
    # lexicographically greatest row intact, never mixes fields across
    # rows) so a dirty batch can't insert the same key twice
    other = [c for c in updates.columns if c != key]
    updates = (
        updates.groupBy(key)
        .agg(F.max(F.struct(*other)).alias("_row"))
        .select(key, *[F.col(f"_row.{c}").alias(c) for c in other])
    )
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not parts:
        return 0

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        try:
            # NULL-partition rows live in __HIVE_DEFAULT_PARTITION__,
            # which the dynamic overwrite rewrites whenever the batch
            # touches it — isin() never matches NULL, so the filter
            # needs the explicit isNull arm (the rollup.py:69 fix)
            touched = F.col(partition_col).isin(
                [x for x in parts if x is not None]
            )
            if any(x is None for x in parts):
                touched = touched | F.col(partition_col).isNull()
            target = spark.read.parquet(target_dir).filter(touched)
        except AnalysisException as exc:
            # bootstrap ONLY on a genuinely missing target — any other
            # analysis error (wrong partition_col, schema drift) must
            # raise, not silently overwrite an existing table
            if "PATH_NOT_FOUND" not in (exc.getCondition() or ""):
                raise
            updates.write.mode("overwrite").partitionBy(partition_col).parquet(
                target_dir
            )
            return len(parts)
        merged = (
            target.join(F.broadcast(updates.select(key)), key, "left_anti")
            .unionByName(updates.select(*target.columns))
            # materialize before overwriting the directory we just read
            .localCheckpoint(eager=True)
        )
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return len(parts)


def streaming_upsert_query(
    spark: SparkSession,
    updates_stream: DataFrame,
    target_dir: str,
    key: str,
    partition_col: str,
    checkpoint_dir: str,
):
    """The CDC apply loop: each micro-batch of updates MERGEs into the
    partitioned target via ``foreachBatch`` — the streaming face of
    :func:`upsert_partitioned` (mirrors ``streaming_rollup_query``,
    rollup.py:79). Unlike the rollup merge, the upsert IS idempotent per
    batch (last-write-wins on the key), so a checkpoint replay of a
    whole micro-batch converges to the same table.

    Returns the started StreamingQuery (caller picks the trigger cadence
    via ``.trigger`` before ``start`` — here availableNow for drains).
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partitioned(spark, target_dir, batch_df, key, partition_col)

    return (
        updates_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
