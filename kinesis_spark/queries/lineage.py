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

from kinesis_spark.io import load_table
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


@register(
    "dq1_validation_rules",
    oracle="""
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
    SUM(CASE WHEN COALESCE(l_quantity BETWEEN 1 AND 50, FALSE) THEN 0 ELSE 1 END) AS qty_range,
    SUM(CASE WHEN COALESCE(l_extendedprice > 0, FALSE) THEN 0 ELSE 1 END) AS price_positive,
    SUM(CASE WHEN COALESCE(l_discount BETWEEN 0 AND 1, FALSE) THEN 0 ELSE 1 END) AS discount_range,
    SUM(CASE WHEN COALESCE(l_shipdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31', FALSE) THEN 0 ELSE 1 END) AS shipdate_range,
    SUM(CASE WHEN COALESCE(l_returnflag IN ('A', 'N', 'R'), FALSE) THEN 0 ELSE 1 END) AS returnflag_domain
  FROM lineitem
)
SELECT r.rule,
       CAST(a.n_rows AS BIGINT) AS n_rows,
       CAST(CASE r.rule
         WHEN 'qty_range' THEN a.qty_range
         WHEN 'price_positive' THEN a.price_positive
         WHEN 'discount_range' THEN a.discount_range
         WHEN 'shipdate_range' THEN a.shipdate_range
         ELSE a.returnflag_domain END AS BIGINT) AS n_violations,
       1.0 - CAST(CASE r.rule
         WHEN 'qty_range' THEN a.qty_range
         WHEN 'price_positive' THEN a.price_positive
         WHEN 'discount_range' THEN a.discount_range
         WHEN 'shipdate_range' THEN a.shipdate_range
         ELSE a.returnflag_domain END AS DOUBLE) / a.n_rows AS pass_rate
FROM agg a,
     (SELECT unnest(['qty_range', 'price_positive', 'discount_range',
                     'shipdate_range', 'returnflag_domain']) AS rule) r
""",
    tags=("quality", "validation"),
)
def dq1_validation_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over lineitem: five constraint
    rules (range, positivity, date ordering, domain membership) checked
    in ONE aggregation pass via kinesis_spark.quality.validate — each
    task emits one row of rule counters, so 50 rules over 100 TB cost
    one scan and a scalar-sized shuffle, never a job per rule. A null
    predicate result counts as a violation (unknown is not good)."""
    from kinesis_spark.quality import validate

    l = load_table(spark, sf_dir, "lineitem")
    return validate(
        l,
        {
            "qty_range": F.col("l_quantity").between(1, 50),
            "price_positive": F.col("l_extendedprice") > 0,
            "discount_range": F.col("l_discount").between(0, 1),
            "shipdate_range": F.col("l_shipdate").between("1992-01-01", "1998-12-31"),
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        },
    )


@register(
    "prov3_dataset_fingerprint",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       bit_xor(CAST(('0x' || substr(
         md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15)) AS BIGINT))
         AS content_fingerprint
FROM documents
GROUP BY source
""",
    tags=("lineage", "fingerprint", "reproducibility"),
)
def prov3_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive dataset fingerprint per source: XOR-aggregate a
    60-bit hash of every (doc_id, text) row. Two pipeline runs produced
    identical data iff the fingerprints match — the cheap reproducibility
    check a training-data release pins next to its manifest
    (row order, partitioning, and file layout all wash out of XOR).

    Scale shape: map-side partial XOR (commutative + associative), so
    the shuffle carries one 8-byte value per (task, source); the scan
    reads only doc_id + text. Rehashing per row is the cost — ~the same
    single pass any content checksum needs."""
    d = load_table(spark, sf_dir, "documents")
    row_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.bit_xor(row_hash).alias("content_fingerprint"),
    )
