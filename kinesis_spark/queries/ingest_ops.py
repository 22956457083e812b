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

from kinesis_spark.ingest.limits import (
    SHARD_BYTES_RATE_LIMIT,
    SHARD_RECORDS_RATE_LIMIT,
)
from kinesis_spark.ingest.rechunk import unframed_rechunk
from kinesis_spark.io import load_table
from kinesis_spark.queries import register

# i5's assumed drain window: the fixture corpus offered over one
# reference flush period (FLUSH_PERIOD_S = 1 s, kinesis/kinesis.go:56)
_DRAIN_WINDOW_S = 1

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


@register(
    "i5_shard_throttle_projection",
    oracle=f"""
WITH keyed AS (
  SELECT 'shard-' || CAST(user_id % 8 AS VARCHAR) AS partition_key,
         COUNT(*) AS n_records,
         CAST(SUM(OCTET_LENGTH(ENCODE(props))) AS BIGINT) AS total_bytes
  FROM events
  GROUP BY 1
)
SELECT partition_key, n_records, total_bytes,
       CAST(n_records AS DOUBLE) / {_DRAIN_WINDOW_S} AS records_per_s,
       CAST(total_bytes AS DOUBLE) / {_DRAIN_WINDOW_S} AS bytes_per_s,
       (CAST(n_records AS DOUBLE) / {_DRAIN_WINDOW_S}
          > {SHARD_RECORDS_RATE_LIMIT})
         OR (CAST(total_bytes AS DOUBLE) / {_DRAIN_WINDOW_S}
          > {SHARD_BYTES_RATE_LIMIT}) AS would_throttle,
       GREATEST(
         CAST(CEIL(CAST(n_records AS DOUBLE)
                   / {_DRAIN_WINDOW_S} / {SHARD_RECORDS_RATE_LIMIT}) AS BIGINT),
         CAST(CEIL(CAST(total_bytes AS DOUBLE)
                   / {_DRAIN_WINDOW_S} / {SHARD_BYTES_RATE_LIMIT}) AS BIGINT),
         1) AS min_shards
FROM keyed
""",
    tags=("ingest", "partition-key", "throttle", "capacity"),
)
def i5_shard_throttle_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPACITY PLANNING against the reference's DECLARED per-shard
    service limits — the dead constants (kinesis/kinesis.go:25,28;
    SURVEY §1.3) turned into the report a stream operator actually
    needs: project each partition key's load over a {W}-second drain
    window onto the 1000 records/s and 1 MiB/s per-shard envelope,
    flag keys that would throttle, and size the minimum shard count per
    key (the split decision Kinesis resharding automates — our
    resharding consumer, tests/test_resharding.py, is the read side of
    exactly this). Runs over the EVENTS stream keyed the i3 way: at
    the driver's sf0.01 gate each synthetic key carries ~1250
    records/s, genuinely over the 1000/s record limit, so the report
    shows real True flags and min_shards=2 — not a vacuous all-clear.
    The reference pins ONE key per writer, so its whole stream is a
    single `min_shards` row — the worst case i3 profiles.

    Byte-denominated (ADVICE r9): the service limit is 1 MiB/s of
    BYTES, so payload size is octet_length (Spark) /
    octet_length(encode(...)) (DuckDB) — LENGTH counts characters and
    under-projects bytes_per_s/min_shards on non-ASCII payloads.

    Exactness: integer counts/sums; one division each by the literal
    window; CEIL of exact-input doubles; the throttle flag compares the
    same doubles both engines computed identically."""
    from kinesis_spark.ingest.limits import (
        SHARD_BYTES_RATE_LIMIT as _B,
        SHARD_RECORDS_RATE_LIMIT as _R,
    )

    e = load_table(spark, sf_dir, "events")
    keyed = (
        e.select(
            F.concat(F.lit("shard-"), (F.col("user_id") % 8).cast("string")).alias(
                "partition_key"
            ),
            F.octet_length("props").alias("n_bytes"),
        )
        .groupBy("partition_key")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
    )
    rps = F.col("n_records").cast("double") / F.lit(float(_DRAIN_WINDOW_S))
    bps = F.col("total_bytes").cast("double") / F.lit(float(_DRAIN_WINDOW_S))
    return keyed.select(
        "partition_key",
        "n_records",
        "total_bytes",
        rps.alias("records_per_s"),
        bps.alias("bytes_per_s"),
        ((rps > F.lit(float(_R))) | (bps > F.lit(float(_B)))).alias(
            "would_throttle"
        ),
        F.greatest(
            F.ceil(rps / F.lit(float(_R))).cast("bigint"),
            F.ceil(bps / F.lit(float(_B))).cast("bigint"),
            F.lit(1).cast("bigint"),
        ).alias("min_shards"),
    )


if i5_shard_throttle_projection.__doc__:  # absent under python -OO
    i5_shard_throttle_projection.__doc__ = (
        i5_shard_throttle_projection.__doc__.format(W=_DRAIN_WINDOW_S)
    )
