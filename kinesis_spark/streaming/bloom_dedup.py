"""Streaming incremental exact dedup through a DURABLE bloom index —
the always-on twin of ``d15_bloom_incremental_dedup`` / ``bloom_dedup_batch``
(kinesis_spark/bloom.py).

``streaming/prep.py`` already dedups across micro-batches with streaming
``dropDuplicates`` — state lives in the query's state store, scoped to
one query and one checkpoint. This module keeps the dedup state OUTSIDE
the query, as two parquet relations a whole fleet of jobs (batch
backfills AND streaming intakes) can share:

- ``<state_dir>/bloom``  — the (word, bits) bitmap relation, ≤ m_bits/64
  rows (8 KiB at the default size). Merging a batch's bitmap is
  ``bit_or`` per word — commutative/associative, so the index never has
  to be rebuilt from history.
- ``<state_dir>/hashes`` — the admitted content hashes (one 32-byte-hex
  column), append-only. Read ONLY to verify bloom-positives, with the
  candidate set broadcast (batch-scale) against it — never shuffled,
  never broadcast itself.

Per micro-batch cost is therefore: one narrow pass over the batch
(row-local dense-bitmap probes), plus a hash-store scan proportional to
the store (pruned to the single hash column) ONLY when the bloom says
some candidate might be a dup. At 100 TB of corpus the bitmap stays
8 KiB (the fpp rises — size m_bits for the corpus, the module parameter
exists for exactly that) and the per-batch work stays batch-scale.

Exactly-once: foreachBatch replays a batch after failure. Every state
mutation here is guarded by a committed-batch marker (``_last_batch``),
so a replayed batch_id is a no-op — admitted output, hash store, and
bitmap advance atomically-enough for the single-writer contract
Structured Streaming gives foreachBatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_spark.bloom import (
    DEFAULT_K,
    DEFAULT_M_BITS,
    build_bloom,
    densify_bloom,
    probe_bloom_dense,
)

_MARKER = "_last_batch"


def _read_marker(state_dir: str) -> int:
    try:
        with open(os.path.join(state_dir, _MARKER)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def _write_marker(state_dir: str, batch_id: int) -> None:
    tmp = os.path.join(state_dir, f".{_MARKER}.tmp")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(state_dir, _MARKER))


class BloomDedupSink:
    """foreachBatch sink: admit only rows whose ``sha2(text_col, 256)``
    has never been admitted before (across ALL batches and restarts);
    write admitted rows to ``out_dir`` and fold their hashes into the
    durable bloom index."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        out_dir: str,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        m_bits: int = DEFAULT_M_BITS,
        k: int = DEFAULT_K,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self.m_bits = m_bits
        self.k = k
        os.makedirs(state_dir, exist_ok=True)

    # -- state ------------------------------------------------------------
    @property
    def _bloom_dir(self) -> str:
        return os.path.join(self.state_dir, "bloom")

    @property
    def _hash_dir(self) -> str:
        return os.path.join(self.state_dir, "hashes")

    def _load_bloom(self) -> DataFrame | None:
        if not os.path.isdir(self._bloom_dir):
            return None
        return self.spark.read.parquet(self._bloom_dir)

    def _load_hashes(self) -> DataFrame | None:
        if not os.path.isdir(self._hash_dir):
            return None
        return self.spark.read.parquet(self._hash_dir)

    # -- the batch hook ---------------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_marker(self.state_dir):
            return  # replay of a committed batch: idempotent no-op
        hashed = batch.withColumn("h", F.sha2(self.text_col, 256))
        # within-batch winner per hash: smallest id (the d1 discipline)
        w = Window.partitionBy("h").orderBy(self.id_col)
        hashed = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        bloom = self._load_bloom()
        if bloom is None:
            admitted = hashed
        else:
            dense = densify_bloom(bloom, self.m_bits)
            probed = probe_bloom_dense(hashed, dense, "h", self.m_bits, self.k)
            clean = probed.filter(~F.col("maybe_member")).drop("maybe_member")
            cand = probed.filter(F.col("maybe_member")).drop("maybe_member")
            store = self._load_hashes()
            if store is None:
                admitted = clean.unionByName(cand)
            else:
                # verify bloom-positives exactly: candidate keys are
                # batch-scale -> broadcast them at the store, keep only
                # candidates whose hash is genuinely new
                fresh = cand.join(store, "h", "left_anti")
                admitted = clean.unionByName(fresh)

        # materialize once: admitted feeds three writes below
        admitted = admitted.localCheckpoint(eager=True)
        if admitted.isEmpty():
            _write_marker(self.state_dir, batch_id)
            return

        admitted.drop("h").write.mode("append").parquet(self.out_dir)
        admitted.select("h").write.mode("append").parquet(self._hash_dir)

        batch_bloom = build_bloom(admitted, "h", self.m_bits, self.k)
        merged = batch_bloom if bloom is None else (
            bloom.unionByName(batch_bloom)
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        )
        # the bitmap is <= m_bits/64 rows; rewrite it in one file so the
        # next batch's read is a single-footer scan
        tmp = self._bloom_dir + ".tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self._bloom_dir + ".old"
        if os.path.isdir(self._bloom_dir):
            os.replace(self._bloom_dir, old)
        os.replace(tmp, self._bloom_dir)
        if os.path.isdir(old):
            import shutil

            shutil.rmtree(old, ignore_errors=True)
        _write_marker(self.state_dir, batch_id)


def start_bloom_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    trigger_available_now: bool = False,
):
    """Wire :class:`BloomDedupSink` into a streaming query. Returns the
    started ``StreamingQuery``."""
    sink = BloomDedupSink(
        spark,
        state_dir,
        out_dir,
        text_col=text_col,
        id_col=id_col,
        m_bits=m_bits,
        k=k,
    )
    writer = (
        docs_stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
