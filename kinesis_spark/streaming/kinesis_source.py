"""Structured Streaming Kinesis consumer source (Python Data Source API).

Completes the north star's "Kinesis source/sink": the sink is the
PutRecords writer (ingest/writer.py + ingest/aws.py); this is the
matching ``readStream`` source, built on PySpark 4's Python Data Source
API so it is a REAL streaming source — checkpointable offsets, replay
between offsets, availableNow draining — not a file-source stand-in.

Offset model (exactly what a production Kinesis connector uses):
- an offset is ``{shard_id: last_consumed_sequence_number}`` (``""`` =
  nothing consumed, i.e. TRIM_HORIZON);
- ``latestOffset`` probes the current tip per shard;
- each micro-batch plans ONE partition per shard with new data — the
  Kinesis unit of parallelism — and the executor-side ``read`` runs the
  GetShardIterator → GetRecords loop through the injectable
  :class:`~kinesis_spark.ingest.consumer.ShardIteratorClient` seam,
  stopping at the batch's end sequence so replays are deterministic.

Usage::

    spark.dataSource.register(KinesisConsumerDataSource)
    df = (spark.readStream.format("kinesis_consumer")
          .option("spool_dir", "/path/to/spool")
          .option("stream", "my-stream")
          .option("n_shards", "4")
          .load())

Options select the client backend: ``spool_dir`` (the test/local spool
emulation). Wiring a boto3-backed reader needs only a client with the
same protocol plus a tip probe; the spool client is the only backend
constructible in this container (no AWS SDK/network) and the seam is the
point — sequence-number offsets are backend-agnostic.

Sequence numbers are fixed-width strings (streaming/spool.py:14), so the
lexicographic comparisons here are chronological.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from kinesis_spark.ingest.consumer import (
    CONSUMER_SCHEMA,
    DEFAULT_N_SHARDS,
    SpoolConsumerClient,
)

KINESIS_SOURCE_SCHEMA = CONSUMER_SCHEMA  # one record shape, both faces


@dataclass
class ShardRange(InputPartition):
    """One shard's slice of a micro-batch: records with
    ``start_after < seq <= end_seq``."""

    shard_id: str
    start_after: str
    end_seq: str


class KinesisConsumerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kinesis_consumer"

    def schema(self) -> str:
        return KINESIS_SOURCE_SCHEMA

    def streamReader(self, schema) -> "KinesisShardStreamReader":
        return KinesisShardStreamReader(self.options)

    def reader(self, schema) -> "KinesisShardBatchReader":
        return KinesisShardBatchReader(self.options)


class KinesisShardBatchReader(DataSourceReader):
    """Batch twin of the stream reader: ``spark.read.format(
    "kinesis_consumer")`` scans the whole stream once, one partition per
    shard, TRIM_HORIZON to current tip (pinned at plan time so every
    task sees one consistent snapshot)."""

    def __init__(self, options: dict):
        self._inner = KinesisShardStreamReader(options)

    def partitions(self):
        tips = self._inner.latestOffset()
        return [
            ShardRange(sh, "", end_seq)
            for sh, end_seq in tips.items()
            if end_seq
        ]

    def read(self, partition: "ShardRange"):
        return self._inner.read(partition)


class KinesisShardStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        if "spool_dir" not in options:
            raise ValueError(
                "kinesis_consumer requires option 'spool_dir' (the spool "
                "backend is the only client constructible here; see module "
                "docstring for wiring a real-AWS client)"
            )
        self._spool_dir = options["spool_dir"]
        self._stream = options.get("stream", "default")
        self._n_shards = int(options.get("n_shards", DEFAULT_N_SHARDS))
        self._limit = int(options.get("limit_per_call", 1000))

    def _client(self) -> SpoolConsumerClient:
        return SpoolConsumerClient(self._spool_dir, self._n_shards)

    # -- offsets (driver side) -------------------------------------------
    def initialOffset(self) -> dict:
        return {sh: "" for sh in self._client().list_shards(self._stream)}

    def latestOffset(self) -> dict:
        return self._client().latest_sequence_numbers(self._stream)

    def partitions(self, start: dict, end: dict) -> list[ShardRange]:
        # one partition per shard that actually advanced; an empty batch
        # (start == end) plans zero partitions and costs nothing
        return [
            ShardRange(sh, start.get(sh, ""), end_seq)
            for sh, end_seq in end.items()
            if end_seq > start.get(sh, "")
        ]

    # -- data (executor side) --------------------------------------------
    def read(self, partition: ShardRange):
        if partition is None:
            # PySpark substitutes [None] for an empty partition list —
            # an empty stream is an empty batch, not a crash
            return
        client = self._client()
        if partition.start_after:
            token = client.get_shard_iterator(
                self._stream,
                partition.shard_id,
                "AFTER_SEQUENCE_NUMBER",
                partition.start_after,
            )
        else:
            token = client.get_shard_iterator(
                self._stream, partition.shard_id, "TRIM_HORIZON"
            )
        while token:
            resp = client.get_records(token, self._limit)
            for r in resp["Records"]:
                if r["SequenceNumber"] > partition.end_seq:
                    return  # past this batch's end — later records belong
                    # to the next micro-batch (deterministic replay)
                yield (
                    partition.shard_id,
                    r["PartitionKey"],
                    r["SequenceNumber"],
                    bytearray(r["Data"]),
                )
            if not resp["Records"] and resp.get("MillisBehindLatest", 0) == 0:
                # caught up to the tip; an empty page while still BEHIND
                # (routine on real Kinesis) keeps iterating — returning
                # early would drop the rest of a committed micro-batch
                return
            token = resp.get("NextShardIterator")

    def commit(self, end: dict) -> None:
        # offsets are durable in the streaming checkpoint; the spool
        # retains records (like Kinesis retention), so nothing to ack
        pass
