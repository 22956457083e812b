"""Shard-lease coordination (ingest/leases.py): two consumers sharing a
lease table split a stream's shards disjointly (no shard double-read),
expiry makes a dead consumer's shards claimable, and renew/release/
fencing behave. Virtual clock throughout — no sleeps."""

from __future__ import annotations

from kinesis_spark.ingest.chunker import chunk_bytes
from kinesis_spark.ingest.consumer import (
    SpoolConsumerClient,
    read_stream_batch,
    shard_for_key,
)
from kinesis_spark.ingest.leases import ShardLeases
from kinesis_spark.ingest.writer import Record
from kinesis_spark.streaming.spool import SpoolStreamClient

STREAM = "leased-stream"
CHUNK = 64
PAYLOADS = {
    f"pk{i}": bytes((33 + (i * 7 + j) % 90) for j in range(n))
    for i, n in enumerate([40, 64, 65, 130, 200, 500, 90, 10])
}


class VClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _spool(tmp_path) -> str:
    spool = str(tmp_path / "spool")
    sink = SpoolStreamClient(spool)
    for pk, payload in PAYLOADS.items():
        sink.put_records(
            STREAM,
            [Record(data=c, partition_key=pk) for c in chunk_bytes(payload, CHUNK)],
        )
    return spool


def test_two_consumers_split_shards_disjointly(spark, tmp_path):
    spool = _spool(tmp_path)
    lease_dir = str(tmp_path / "leases")
    clock = VClock()
    a = ShardLeases(lease_dir, owner="A", ttl_s=30, clock=clock)
    b = ShardLeases(lease_dir, owner="B", ttl_s=30, clock=clock)
    all_shards = SpoolConsumerClient(spool).list_shards(STREAM)
    assert len(all_shards) >= 2

    got_a = a.partition_shards(STREAM, all_shards)
    got_b = b.partition_shards(STREAM, all_shards)
    # A claimed first and holds everything; B gets nothing while A lives
    assert got_a == sorted(all_shards) and got_b == []

    # interleaved claims (each consumer sweeps after the other claimed
    # one shard) split the set disjointly with full coverage
    a2 = ShardLeases(str(tmp_path / "l2"), owner="A", ttl_s=30, clock=clock)
    b2 = ShardLeases(str(tmp_path / "l2"), owner="B", ttl_s=30, clock=clock)
    assert a2.try_acquire(STREAM, all_shards[0])
    assert b2.try_acquire(STREAM, all_shards[1])
    got_a2 = a2.partition_shards(STREAM, all_shards)
    got_b2 = b2.partition_shards(STREAM, all_shards)
    assert set(got_a2) & set(got_b2) == set()
    assert set(got_a2) | set(got_b2) == set(all_shards)
    assert all_shards[0] in got_a2 and all_shards[1] in got_b2

    # the leased batch reads are disjoint and their union is the stream
    df_a = read_stream_batch(
        spark, lambda: SpoolConsumerClient(spool), STREAM, leases=a2
    )
    df_b = read_stream_batch(
        spark, lambda: SpoolConsumerClient(spool), STREAM, leases=b2
    )
    rows_a = {(r.shard_id, r.seq) for r in df_a.collect()}
    rows_b = {(r.shard_id, r.seq) for r in df_b.collect()}
    assert rows_a & rows_b == set()
    full = read_stream_batch(spark, lambda: SpoolConsumerClient(spool), STREAM)
    assert rows_a | rows_b == {(r.shard_id, r.seq) for r in full.collect()}
    assert {r.shard_id for r in df_a.collect()} <= set(got_a2)


def test_expired_lease_is_stolen_with_fencing_bump(tmp_path):
    clock = VClock()
    d = str(tmp_path / "l")
    a = ShardLeases(d, owner="A", ttl_s=10, clock=clock)
    b = ShardLeases(d, owner="B", ttl_s=10, clock=clock)
    assert a.try_acquire(STREAM, "shard-0")
    assert not b.try_acquire(STREAM, "shard-0")  # live
    clock.t = 5
    assert a.renew(STREAM, "shard-0")  # heartbeat extends to t=15
    clock.t = 12
    assert not b.try_acquire(STREAM, "shard-0")  # renewed, still live
    clock.t = 16
    assert b.try_acquire(STREAM, "shard-0")  # expired -> stolen
    assert b.still_owns(STREAM, "shard-0")
    # the paused ex-owner must notice before committing anything
    assert not a.still_owns(STREAM, "shard-0")
    assert not a.renew(STREAM, "shard-0")
    # fencing token bumped on the steal
    import json, os

    lease = json.load(open(os.path.join(d, STREAM, "shard-0.json")))
    assert lease["count"] == 2 and lease["owner"] == "B"


def test_release_frees_immediately(tmp_path):
    clock = VClock()
    d = str(tmp_path / "l")
    a = ShardLeases(d, owner="A", ttl_s=1000, clock=clock)
    b = ShardLeases(d, owner="B", ttl_s=1000, clock=clock)
    assert a.try_acquire(STREAM, "s")
    a.release(STREAM, "s")
    assert b.try_acquire(STREAM, "s")  # no TTL wait after clean release
    b.release(STREAM, "s")
    a.release(STREAM, "s")  # releasing a non-owned lease is a no-op
    assert not b.still_owns(STREAM, "s")


def test_reacquire_by_owner_renews(tmp_path):
    clock = VClock()
    a = ShardLeases(str(tmp_path / "l"), owner="A", ttl_s=10, clock=clock)
    assert a.try_acquire(STREAM, "s")
    clock.t = 8
    assert a.try_acquire(STREAM, "s")  # idempotent re-claim = renew
    clock.t = 15  # would be past the ORIGINAL expiry
    assert a.still_owns(STREAM, "s")


def test_concurrent_claims_have_exactly_one_winner(tmp_path):
    """Real concurrency: 16 threads race try_acquire on the same shard;
    the filesystem's exclusive create must arbitrate exactly one winner
    per shard, across several shards and repeated rounds."""
    import threading

    shards = [f"shard-{i}" for i in range(6)]
    for rnd in range(3):
        d = str(tmp_path / f"race{rnd}")  # fresh table per round: the
        # race under test is the exclusive CREATE (live leases are not
        # stealable, so every claim goes through O_CREAT|O_EXCL)
        winners: dict[str, list[str]] = {sh: [] for sh in shards}
        lock = threading.Lock()
        consumers = [
            ShardLeases(d, owner=f"c{rnd}-{i}", ttl_s=60.0) for i in range(16)
        ]

        def race(consumer):
            for sh in shards:
                if consumer.try_acquire(STREAM, sh):
                    with lock:
                        winners[sh].append(consumer.owner)

        threads = [threading.Thread(target=race, args=(c,)) for c in consumers]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for sh, owners in winners.items():
            assert len(owners) == 1, (rnd, sh, owners)
