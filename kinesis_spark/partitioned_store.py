"""Shared scaffolding for partition-selective rewrites of plain-parquet
stores (upsert.py, rollup.py): dynamic-partition-overwrite mode handling,
the NULL-partition-aware touched filter, and the missing-store bootstrap
gate. ONE definition — the NULL-partition fix historically had to be
applied to both consumers separately, and the next overwrite-mode or
bootstrap change must not depend on remembering every copy.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.errors import AnalysisException
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def touched_partition_filter(partition_col: str, values: list) -> Column:
    """Filter matching exactly the given partition values, INCLUDING a
    NULL partition: NULL rows live in ``__HIVE_DEFAULT_PARTITION__``,
    which the dynamic overwrite rewrites whenever the batch touches it —
    ``isin()`` never matches NULL, so the filter needs the explicit
    ``isNull`` arm."""
    cond = F.col(partition_col).isin([v for v in values if v is not None])
    if any(v is None for v in values):
        cond = cond | F.col(partition_col).isNull()
    return cond


@contextmanager
def dynamic_partition_overwrite(spark: SparkSession):
    """Scope ``partitionOverwriteMode=dynamic`` to the block, restoring
    the caller's previous mode on every exit path."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def is_missing_store(exc: AnalysisException) -> bool:
    """True only for a genuinely missing target path — any other
    analysis error (wrong partition column, schema drift, unreadable
    store) must raise, never silently trigger a bootstrap overwrite."""
    return "PATH_NOT_FOUND" in (exc.getCondition() or "")


def diff_by_key(a, b, key: str, fingerprint: Column):
    """Snapshot reconciliation: classify every key as added / removed /
    changed between two corpus snapshots, by comparing a row fingerprint
    (e.g. ``F.md5("text")``) computed on each side. Returns
    ``(key, status)`` rows for every key whose status is not
    'unchanged'.

    Scale shape (the 100 TB snapshot-diff): the fingerprint is computed
    MAP-SIDE on each snapshot scan, so only (key, 16-byte hash, flag)
    ever shuffles — document bodies never leave their scan. One
    full-outer shuffle join on the unique key (skew-free by
    construction); output is proportional to the churn, not the corpus.
    Presence is tracked with explicit flags, not hash nullness, so a
    NULL payload (fingerprint NULL) still diffs correctly.
    """
    fa = a.select(F.col(key), fingerprint.alias("_h_a"), F.lit(True).alias("_in_a"))
    fb = b.select(F.col(key), fingerprint.alias("_h_b"), F.lit(True).alias("_in_b"))
    joined = fa.join(fb, key, "full_outer")
    status = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(
            ~F.col("_h_a").eqNullSafe(F.col("_h_b")), F.lit("changed")
        )  # eqNullSafe: NULL payload on one side only is a change
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select(key, "status")
    )
