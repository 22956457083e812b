"""Production intake sink: streaming document admission against the
DURABLE prep index, committing transactionally — the composed operator
the repo's pieces exist for, shipped as one foreachBatch sink instead
of a per-deployment script.

Per micro-batch of (doc_id, text, lang, source, …) rows:

1. batch-local exact dedup — min doc_id per content hash (one window);
2. exact dedup vs the durable hash store (prep_index.py's layout; the
   store is the truth that survives consumer swaps and checkpoint
   resets — streaming ``dropDuplicates`` state is per-checkpoint and
   cannot dedup across a failover to a fresh query);
3. conservative LSH admission — drop any doc sharing a MinHash band
   key with the persisted band index or with a LOWER-id batch doc
   (d3's pair rule; resolvable later by d4's exact verify);
4. ``tx_append`` the admitted docs into a transactional store — one
   atomic multi-partition commit per micro-batch, so a reader polling
   the corpus never sees a torn batch;
5. grow the durable index (admitted hashes + band keys) so later
   batches — and OTHER consumers — dedup against them;
6. incrementally refresh a per-(partition cols) rollup via
   ``tx_upsert`` — only the touched rollup rows rewrite.

At-least-once inputs are the DESIGN CASE, not an edge: a failover
consumer replaying its predecessor's final uncheckpointed batch, or a
producer re-putting records, re-presents documents the store already
admitted — step 2 drops every one of them, so the corpus converges to
exactly-once content under any replay (tests/test_showcase_e2e.py
proves the end state equals a greedy sequential oracle across a
kill/failover with deliberate re-puts).

Crash-INSIDE-a-batch convergence (the harder at-least-once case — the
hash store and the corpus commit cannot be updated atomically
together): the batch is ordered so every crash point redoes safely.
(a) The corpus append is guarded by an anti-join against the touched
corpus partitions' doc_ids — a redo whose predecessor crashed after
``tx_append`` but before the hash-store append finds the docs already
in the corpus and appends nothing. (b) The index artifacts write with
the HASH STORE LAST: the hash store is the admission gate, so as long
as it trails everything else, a redo regenerates whatever a partial
attempt left missing (duplicate band keys/hashes are harmless —
consumers are semi-joins). (c) The rollup is a RECOUNT of the touched
corpus partitions, not an accumulated delta — recomputing it is
idempotent, and it runs even when the batch dedups to nothing so a
crash between the hash-store append and the rollup still heals.

Ordering contract: within a batch, admission is deterministic (min-id
window + the a.id < b.id band rule). Across batches it is first-come-
first-admitted — the arrival order IS the tie-break, which is the only
meaningful contract for an unbounded stream.

Scale shape per batch: one narrow pass over the batch (row-local
probes), a hash-store scan pruned to its single column with the
batch-scale candidate set broadcast (never the store), a band-index
equi-join, and one manifest swap per touched store. Nothing scales
with the corpus except the two hash/key-sized index-relation scans.
The lineage of the admitted relation is PINNED before step 5 — its
plan reads the same index directories step 5 appends to, and an
unpinned re-evaluation would see the batch's own hashes and resolve
itself empty (the read-your-own-writes trap)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_spark.checkpoints import pin
from kinesis_spark.txstore import (
    tx_append,
    tx_current_manifest,
    tx_init,
    tx_read,
    tx_upsert,
)

WS = r"[ \t\n\f\r\x0B]+"


class PrepIntakeSink:
    """foreachBatch admission against durable state. ``hashes_dir`` /
    ``bands_dir`` follow prep_index.py's layout (bootstrap them with
    ``build_prep_index`` or let the sink grow them from empty);
    ``store_root`` / ``rollup_root`` are transactional stores created on
    first use, partitioned by ``partition_cols``."""

    def __init__(
        self,
        spark: SparkSession,
        *,
        hashes_dir: str,
        bands_dir: str,
        store_root: str,
        rollup_root: str | None = None,
        partition_cols: tuple[str, ...] = ("lang", "source"),
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.spark = spark
        self.hashes_dir = hashes_dir
        self.bands_dir = bands_dir
        self.store_root = store_root
        self.rollup_root = rollup_root
        self.partition_cols = list(partition_cols)
        self.id_col = id_col
        self.text_col = text_col

    # -- internals -----------------------------------------------------

    def _existing(self, path: str, schema: str) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.schema(schema).parquet(path)
        except AnalysisException:
            # missing path = empty index. ONLY that: a transient I/O
            # failure on a populated index must fail the batch (and let
            # the streaming query retry), not admit everything as fresh
            return self.spark.createDataFrame([], schema)

    def _admit(self, batch: DataFrame) -> DataFrame:
        """Steps 1-3: the admitted subset of ``batch``, lineage-pinned."""
        from pyspark.sql.window import Window

        from kinesis_spark.streaming.neardup import band_keys

        did, txt = self.id_col, self.text_col
        h = batch.withColumn("__h", F.sha2(txt, 256))
        wh = Window.partitionBy("__h").orderBy(did)
        firsts = (
            h.withColumn("__rn", F.row_number().over(wh))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        store = self._existing(self.hashes_dir, "h string")
        fresh = firsts.join(
            store, firsts["__h"] == store["h"], "left_anti"
        )

        bk = band_keys(
            fresh.select(F.col(did).alias("doc_id"), F.col(txt).alias("text"))
        )
        index = self._existing(self.bands_dir, "band_key string")
        hit_index = bk.join(index, "band_key", "left_semi").select("doc_id")
        lower = (
            bk.alias("a")
            .join(
                bk.alias("b"),
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("b.doc_id").alias("doc_id"))
        )
        near = hit_index.unionByName(lower).distinct()
        return fresh.join(
            near, fresh[did] == near["doc_id"], "left_anti"
        ).transform(pin)

    def _recount_rollup(self, touched: list[tuple]) -> None:
        """Recount the touched corpus partitions into the rollup —
        idempotent by construction (module header, crash point c):
        values come from the STORE, never from accumulated deltas, so
        replays and partial-batch redos converge instead of drifting."""
        spark, pcols = self.spark, self.partition_cols
        try:
            slice_df = tx_read(spark, self.store_root, partition_values=touched)
        except FileNotFoundError:
            return  # nothing ever admitted: nothing to count
        agg = (
            slice_df.groupBy(*pcols)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(F.size(F.split(self.text_col, WS)))
                .cast("bigint")
                .alias("total_tokens"),
            )
            .withColumn("ls", F.concat_ws("|", *pcols))
        )
        cols = ["ls", *pcols, "n_docs", "total_tokens"]
        try:
            tx_current_manifest(spark, self.rollup_root)
            tx_upsert(spark, self.rollup_root, agg.select(*cols), key="ls")
        except FileNotFoundError:
            tx_init(
                spark,
                self.rollup_root,
                agg.select(*cols),
                partition_col=pcols[0],
            )

    # -- the sink --------------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            # the touched partition set comes from the BATCH, not the
            # admitted subset: the rollup recount must run even when
            # everything dedups away (a replayed batch whose first
            # attempt crashed before the recount — crash point c)
            touched = [
                tuple(r)
                for r in batch.select(*self.partition_cols).distinct().collect()
            ]
            admitted = self._admit(batch)
            if not admitted.isEmpty():
                docs = admitted.drop("__h")
                # corpus-guard (crash point a): drop docs a crashed
                # predecessor already appended but never hash-indexed
                try:
                    tx_current_manifest(self.spark, self.store_root)
                    present = tx_read(
                        self.spark, self.store_root, partition_values=touched
                    ).select(F.col(self.id_col).alias("__present_id"))
                    fresh_docs = docs.join(
                        present,
                        docs[self.id_col] == present["__present_id"],
                        "left_anti",
                    )
                    if not fresh_docs.isEmpty():
                        tx_append(self.spark, self.store_root, fresh_docs)
                except FileNotFoundError:
                    tx_init(
                        self.spark,
                        self.store_root,
                        docs,
                        partition_col=self.partition_cols,
                    )
                # index artifacts from ADMITTED (not the guard's
                # survivors): a redo must regenerate what a partial
                # attempt left missing. Bands first, HASH STORE LAST —
                # it is the admission gate (crash point b)
                from kinesis_spark.streaming.neardup import band_keys

                band_keys(
                    admitted.select(
                        F.col(self.id_col).alias("doc_id"),
                        F.col(self.text_col).alias("text"),
                    )
                ).select("band_key").distinct().write.mode("append").parquet(
                    self.bands_dir
                )
                admitted.select(F.col("__h").alias("h")).write.mode(
                    "append"
                ).parquet(self.hashes_dir)
            if self.rollup_root is not None and touched:
                self._recount_rollup(touched)
        finally:
            batch.unpersist()


def start_prep_intake(
    docs_stream: DataFrame,
    sink: PrepIntakeSink,
    checkpoint_dir: str,
    trigger_available_now: bool = False,
):
    """Wire the sink into a streaming query. The caller owns the
    upstream gate (language/length/quality filters are stream-safe
    projections) and any replay-shield ``dropDuplicates`` it wants in
    front; returns the started StreamingQuery."""
    writer = (
        docs_stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
