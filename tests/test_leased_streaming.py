"""KCL worker mode of the kinesis_consumer streaming source: several
consumer queries share one lease table, split shards disjointly, and a
dead consumer's shards migrate with the lease checkpoint (at-least-once
failover, never from-scratch)."""

from __future__ import annotations

import time

import pytest

from kinesis_spark.ingest.chunker import chunk_bytes
from kinesis_spark.ingest.consumer import shard_for_key
from kinesis_spark.ingest.writer import Record
from kinesis_spark.streaming.spool import SpoolStreamClient

STREAM = "leased-src"
CHUNK = 64
PAYLOADS = {
    f"pk{i}": bytes((33 + (i * 13 + j) % 90) for j in range(n))
    for i, n in enumerate([40, 70, 130, 200, 64, 65, 90, 10])
}


def _fill_spool(tmp_path) -> str:
    spool = str(tmp_path / "spool")
    sink = SpoolStreamClient(spool)
    for pk, payload in PAYLOADS.items():
        sink.put_records(
            STREAM,
            [Record(data=c, partition_key=pk) for c in chunk_bytes(payload, CHUNK)],
        )
    return spool


def _drain(spark, spool, tmp_path, consumer_id, ttl="30"):
    """One availableNow drain as the named consumer; returns its rows."""
    from kinesis_spark.streaming.kinesis_source import KinesisConsumerDataSource

    spark.dataSource.register(KinesisConsumerDataSource)
    out = str(tmp_path / f"out-{consumer_id}")
    q = (
        spark.readStream.format("kinesis_consumer")
        .option("spool_dir", spool)
        .option("stream", STREAM)
        .option("lease_dir", str(tmp_path / "leases"))
        .option("consumer_id", consumer_id)
        .option("lease_ttl_s", ttl)
        .option(
            "lineage_state_path",
            str(tmp_path / f"state-{consumer_id}.json"),
        )
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{consumer_id}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    try:
        return {
            (r.shard_id, r.seq) for r in spark.read.parquet(out).collect()
        }
    except Exception:
        return set()  # consumer held no shards -> no sink directory


@pytest.mark.streaming
def test_two_consumers_never_double_read(spark, tmp_path):
    spool = _fill_spool(tmp_path)
    rows_a = _drain(spark, spool, tmp_path, "A")
    rows_b = _drain(spark, spool, tmp_path, "B")
    n_total = sum(-(-len(p) // CHUNK) for p in PAYLOADS.values())
    # A claimed every shard first and drained everything; B got nothing
    assert len(rows_a) == n_total
    assert rows_a & rows_b == set()


@pytest.mark.streaming
def test_failover_resumes_after_lease_checkpoint(spark, tmp_path):
    """A drains twice and dies (TTL lapses); new records arrive; B
    claims the shards and resumes AFTER A's lease checkpoint — it
    replays AT MOST A's final (uncheckpointed) micro-batch plus the new
    records, never the whole stream, and nothing is lost. Lease
    checkpoints ride start offsets, so A's first drain's progress is
    durably checkpointed by its second drain's planning."""
    spool = _fill_spool(tmp_path)
    rows_a1 = _drain(spark, spool, tmp_path, "A", ttl="0.5")
    n_total = sum(-(-len(p) // CHUNK) for p in PAYLOADS.values())
    assert len(rows_a1) == n_total

    # mid-life records; A's second drain delivers them AND, while
    # planning that batch, lease-checkpoints drain 1's end offsets
    SpoolStreamClient(spool).put_records(
        STREAM,
        [
            Record(data=b"mid-1", partition_key="pk0"),
            Record(data=b"mid-2", partition_key="pk1"),
        ],
    )
    rows_a2 = _drain(spark, spool, tmp_path, "A", ttl="0.5")
    assert len(rows_a2 - rows_a1) == 2

    time.sleep(0.8)  # A's leases expire (it never renews again)
    SpoolStreamClient(spool).put_records(
        STREAM,
        [
            Record(data=b"after-failover-1", partition_key="pk0"),
            Record(data=b"after-failover-2", partition_key="pk1"),
        ],
    )
    rows_b = _drain(spark, spool, tmp_path, "B", ttl="30")
    new_rows = rows_b - rows_a2
    replayed = rows_b & rows_a2
    assert len(new_rows) == 2  # both post-failover records delivered
    # at-least-once, tightly bounded: B replays at most A's FINAL
    # micro-batch (the two mid-life records) — never the first drain
    assert replayed <= (rows_a2 - rows_a1)
    assert len(rows_b) <= 4
    assert rows_b & rows_a1 == set()  # checkpointed prefix never re-read
    shards_b = {sh for sh, _ in rows_b}
    assert shards_b <= {shard_for_key("pk0"), shard_for_key("pk1")}
