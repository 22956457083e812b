"""Data-lineage / provenance operators: every training-data release
needs to answer "which file and row did this example come from" (audit,
reproducibility, takedown requests). Spark exposes this as the hidden
``_metadata`` struct on file sources — no extra scan, the reader fills
it in.

Oracle note: DuckDB replays the same facts via its own file metadata
(``file_row_number``), but the driver's oracle views hide the path, so
the oracles reconstruct the ordinal from the fixture invariant that
rows are written in doc_id order (asserted in tests) and the basename
is ``documents.parquet`` at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_spark.queries import register


def _docs_with_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        "n_chars",
        F.col("_metadata.file_name").alias("file_name"),
        F.col("_metadata.row_index").alias("row_idx"),
    )


@register(
    "prov1_file_lineage",
    oracle="""
SELECT doc_id,
       'documents.parquet' AS file_name,
       CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_idx
FROM documents
""",
    tags=("lineage", "provenance"),
)
def prov1_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-example provenance: (doc_id, source file, row ordinal) straight
    from the reader's ``_metadata`` struct — zero-cost lineage, no join.

    Scale shape: map-only; at 100 TB the file_name column is the shard
    key for takedown/repro lookups, and partition pruning on it turns
    "find row 12345 of shard X" into a single-file scan."""
    return _docs_with_meta(spark, sf_dir).select("doc_id", "file_name", "row_idx")


@register(
    "prov2_shard_manifest",
    oracle="""
SELECT 'documents.parquet' AS file_name,
       COUNT(*) AS n_rows,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
""",
    tags=("lineage", "manifest"),
)
def prov2_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest: per-file row counts, id ranges, byte totals and
    source fan-in — the release artifact that makes a dataset version
    reproducible (and diffable against the previous release with s6).

    Scale shape: groupBy(file_name) partial-aggregates per input split,
    so the shuffle carries one row per file — at 100 TB that is the
    file count, not the row count."""
    return (
        _docs_with_meta(spark, sf_dir)
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
        )
    )
