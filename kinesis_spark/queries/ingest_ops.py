"""The reference's core dataflow operators (SURVEY.md §2A ops 3-5) as
oracle-checked batch queries: chunking, record tagging, request batching,
and partition-key distribution — run over ``documents`` payloads.

These mirror kinesis_spark.ingest.chunker/writer semantics exactly
(chunk size math: kinesis/kinesis.go:201-205; batch packing:
kinesis/kinesis.go:217-239) so the driver's oracle gate pins the same
behavior the golden unit tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_spark.ingest.rechunk import unframed_rechunk
from kinesis_spark.io import load_table
from kinesis_spark.queries import register

CHUNK = 64  # shrunk RecordSizeLimit − len(partition_key) analog
BATCH = 50  # shrunk PutRecordsLimit analog
RECHUNK = 1024  # unframed-stream chunk size (i4)


@register(
    "i1_chunk_payloads",
    oracle=f"""
SELECT doc_id,
       CAST(i - 1 AS BIGINT) AS chunk_index,
       substring(text, CAST((i - 1) * {CHUNK} + 1 AS INT), {CHUNK}) AS chunk,
       LENGTH(substring(text, CAST((i - 1) * {CHUNK} + 1 AS INT), {CHUNK}))
         AS chunk_bytes
FROM documents,
     UNNEST(range(1, CAST(ceil(LENGTH(text) / {CHUNK}.0) AS BIGINT) + 1)) AS t(i)
WHERE LENGTH(text) > 0
""",
    tags=("ingest", "chunk"),
)
def i1_chunk_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking as a distributed generator expression — the
    chunk() operator (kinesis/kinesis.go:244-268): last chunk = remainder,
    empty payloads yield no chunks. Narrow transform, no shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chunks = F.ceil(F.length("text") / F.lit(CHUNK)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.substring(F.col("text"), i * CHUNK + 1, F.lit(CHUNK)),
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_index", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_index").cast("bigint").alias("chunk_index"),
            "chunk",
            F.length("chunk").cast("bigint").alias("chunk_bytes"),
        )
    )


@register(
    "i2_request_batching",
    oracle=f"""
WITH recs AS (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
  FROM documents
)
SELECT (rn - 1) // {BATCH} AS batch_id,
       COUNT(*) AS n_records,
       CAST(SUM(n_chars) AS BIGINT) AS batch_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM recs
GROUP BY (rn - 1) // {BATCH}
""",
    tags=("ingest", "batch"),
)
def i2_request_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PutRecords batching (≤BATCH records per request) as a declarative
    plan: row_number → integer-div batch id → per-request stats.
    (The global row_number is the semantic contract of ordered packing —
    the streaming sink packs per-partition instead, trading global order
    for parallelism; see streaming/ingest.py.)"""
    d = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    recs = d.select(
        "doc_id", "n_chars", F.row_number().over(w).alias("rn")
    )
    return (
        recs.withColumn("batch_id", F.expr(f"(rn - 1) div {BATCH}"))
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum("n_chars").cast("bigint").alias("batch_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "i3_partition_key_distribution",
    oracle="""
SELECT 'shard-' || CAST(doc_id % 8 AS VARCHAR) AS partition_key,
       COUNT(*) AS n_records,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       CAST(MAX(n_chars) AS BIGINT) AS max_record_bytes
FROM documents
GROUP BY 1
""",
    tags=("ingest", "partition-key"),
)
def i3_partition_key_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-routing skew profile: how records and bytes distribute over
    partition keys (the Kinesis shard-hash analog; the reference pins ONE
    key per writer — kinesis/kinesis.go:179 — which this query shows is
    the worst case: all load on one shard)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.concat(F.lit("shard-"), (F.col("doc_id") % 8).cast("string")).alias(
                "partition_key"
            ),
            "n_chars",
        )
        .groupBy("partition_key")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum("n_chars").cast("bigint").alias("total_bytes"),
            F.max("n_chars").cast("bigint").alias("max_record_bytes"),
        )
    )


@register(
    "i4_unframed_rechunk",
    oracle=f"""
WITH whole AS (
  SELECT string_agg(text, '' ORDER BY doc_id) AS s FROM documents
)
SELECT CAST(i - 1 AS BIGINT) AS chunk_id,
       substring(s, CAST((i - 1) * {RECHUNK} + 1 AS BIGINT), {RECHUNK}) AS chunk,
       CAST(LENGTH(substring(s, CAST((i - 1) * {RECHUNK} + 1 AS BIGINT),
                             {RECHUNK})) AS BIGINT) AS chunk_bytes
FROM whole,
     UNNEST(range(1, CAST(ceil(LENGTH(s) / {RECHUNK}.0) AS BIGINT) + 1)) AS t(i)
""",
    tags=("ingest", "rechunk", "unframed"),
)
def i4_unframed_rechunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unframed concat-then-chunk (SURVEY §7(c)): record boundaries are
    defined over the rejoined byte stream, matching io.Copy semantics
    (main.go:32-35, kinesis/kinesis.go:244-268) instead of row framing.
    Distributed re-framing: two-level prefix-sum offsets, per-row boundary
    split, one shuffle keyed by chunk_id (ingest/rechunk.py). Documents
    are ASCII in the fixtures, so the string oracle matches bytes exactly.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("data")
    )
    out = unframed_rechunk(d, RECHUNK, "doc_id")
    return out.select(
        "chunk_id", F.col("chunk").cast("string").alias("chunk"), "chunk_bytes"
    )
