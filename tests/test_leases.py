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
    lease = b.current_lease(STREAM, "shard-0")
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


def test_concurrent_steals_have_exactly_one_winner(tmp_path):
    """ADVICE r5 (medium): the round-5 steal path (unlink + O_EXCL
    re-create) let TWO stealers win — the second unlinked the first's
    fresh lease in the window. The epoch-file protocol has no unlink on
    the claim path: every stealer targets the SAME next-epoch filename,
    so O_EXCL arbitrates exactly one winner. Race it for real."""
    import threading

    shards = [f"shard-{i}" for i in range(6)]
    for rnd in range(3):
        d = str(tmp_path / f"steal{rnd}")
        clock = VClock()
        dead = ShardLeases(d, owner="dead", ttl_s=10, clock=clock)
        for sh in shards:
            assert dead.try_acquire(STREAM, sh)
            assert dead.checkpoint(STREAM, sh, f"00000{rnd}")
        clock.t = 100.0  # everything expired: every claim is a steal
        winners: dict[str, list[str]] = {sh: [] for sh in shards}
        lock = threading.Lock()
        thieves = [
            ShardLeases(d, owner=f"t{rnd}-{i}", ttl_s=60.0, clock=clock)
            for i in range(16)
        ]

        def race(consumer):
            for sh in shards:
                if consumer.try_acquire(STREAM, sh):
                    with lock:
                        winners[sh].append(consumer.owner)

        threads = [threading.Thread(target=race, args=(c,)) for c in thieves]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for sh, owners in winners.items():
            assert len(owners) == 1, (rnd, sh, owners)
            lease = thieves[0].current_lease(STREAM, sh)
            # exactly one ownership change => fencing token bumped once,
            # and the dead owner's checkpoint survived the steal
            assert lease["count"] == 2 and lease["owner"] == owners[0]
            assert lease["ckpt"] == f"00000{rnd}"


def test_paused_owner_checkpoint_after_steal_is_rejected(tmp_path):
    """VERDICT r5 task 4: a paused ex-owner that resumes AFTER a steal
    must not clobber the thief's lease. Its renew/checkpoint write lands
    on its own dead epoch file, the write-then-verify reports False, and
    the thief's lease (ownership, fencing count, checkpoint) survives
    byte-identically."""
    clock = VClock()
    d = str(tmp_path / "l")
    a = ShardLeases(d, owner="A", ttl_s=10, clock=clock)
    b = ShardLeases(d, owner="B", ttl_s=10, clock=clock)
    assert a.try_acquire(STREAM, "s")
    assert a.checkpoint(STREAM, "s", "000005")
    clock.t = 20.0  # A pauses past its TTL
    assert b.try_acquire(STREAM, "s")  # steal; resumes from A's ckpt
    assert b.checkpoint(STREAM, "s", "000009")
    stolen = b.current_lease(STREAM, "s")
    assert stolen == {
        "owner": "B",
        "expires_at": 30.0,
        "count": 2,
        "ckpt": "000009",
    }
    # A wakes up, unaware, and tries to advance the shard
    assert not a.checkpoint(STREAM, "s", "000042")
    assert not a.renew(STREAM, "s")
    assert not a.still_owns(STREAM, "s")
    # the thief's lease is intact — nothing A did regressed the
    # checkpoint, decayed the expiry, or touched the fencing count
    assert b.current_lease(STREAM, "s") == stolen
    assert b.still_owns(STREAM, "s")
    assert b.last_checkpoint(STREAM, "s") == "000009"


def test_checkpoint_orders_variable_width_sequences_numerically(tmp_path):
    """ADVICE r5 (low): real Kinesis sequence numbers are variable-width
    decimal strings; '9' -> '10' must ADVANCE the checkpoint (numeric
    order), not be swallowed as a lexicographic regress."""
    clock = VClock()
    a = ShardLeases(str(tmp_path / "l"), owner="A", ttl_s=100, clock=clock)
    assert a.try_acquire(STREAM, "s")
    assert a.checkpoint(STREAM, "s", "9")
    assert a.checkpoint(STREAM, "s", "10")  # numeric advance
    assert a.last_checkpoint(STREAM, "s") == "10"
    assert a.checkpoint(STREAM, "s", "2")  # regress: swallowed, not applied
    assert a.last_checkpoint(STREAM, "s") == "10"


def test_checkpoint_mixed_zero_padding_cannot_regress(tmp_path):
    """ADVICE r6 (low): mixed zero-padding must not smuggle a numeric
    regression past the (len, seq) key — checkpoint('08') after
    checkpoint('9') is a regress (8 < 9) even though the padded string
    is longer. Leading zeros are stripped before comparison."""
    clock = VClock()
    a = ShardLeases(str(tmp_path / "l"), owner="A", ttl_s=100, clock=clock)
    assert a.try_acquire(STREAM, "s")
    assert a.checkpoint(STREAM, "s", "9")
    a.checkpoint(STREAM, "s", "08")  # numerically smaller: swallowed
    assert a.last_checkpoint(STREAM, "s") == "9"
    assert a.checkpoint(STREAM, "s", "0010")  # numerically larger: advances
    assert a.last_checkpoint(STREAM, "s") == "0010"
    # all-zeros edge: '000' is 0, never beats anything positive
    a.checkpoint(STREAM, "s", "000")
    assert a.last_checkpoint(STREAM, "s") == "0010"


def test_lease_random_walk_invariants(tmp_path):
    """Model-based sequential walk of the epoch-file protocol (the
    txstore random-walk's sibling): random acquire/renew/checkpoint/
    release/expiry interleavings across 4 consumers and 3 shards under
    a virtual clock, with the protocol's invariants checked after every
    single operation:

    1. at most one consumer ever observes still_owns == True per shard;
    2. a mutating op that returns True implies immediate ownership
       (no concurrent mutation in a sequential walk);
    3. confirmed checkpoints never regress, across any number of
       steals (the lease carries them forward);
    4. the fencing count is strictly monotonic across ownership changes.
    """
    import random

    for seed in (3, 17, 59):
        rng = random.Random(seed)
        clock = VClock()
        d = str(tmp_path / f"walk{seed}")
        consumers = [
            ShardLeases(d, owner=f"c{i}", ttl_s=10.0, clock=clock)
            for i in range(4)
        ]
        shards = [f"sh{j}" for j in range(3)]
        max_ckpt: dict[str, str] = {sh: "" for sh in shards}
        max_count: dict[str, int] = {sh: 0 for sh in shards}
        next_seq = 1

        for step in range(300):
            c = rng.choice(consumers)
            sh = rng.choice(shards)
            op = rng.choice(
                ["acquire", "renew", "checkpoint", "release", "tick", "jump"]
            )
            if op == "tick":
                clock.t += rng.uniform(0.1, 3.0)
            elif op == "jump":
                clock.t += rng.uniform(8.0, 25.0)  # beyond TTL: expiry
            elif op == "acquire":
                if c.try_acquire(STREAM, sh):
                    assert c.still_owns(STREAM, sh), (seed, step)
            elif op == "renew":
                if c.renew(STREAM, sh):
                    assert c.still_owns(STREAM, sh), (seed, step)
            elif op == "release":
                c.release(STREAM, sh)
                assert not c.still_owns(STREAM, sh), (seed, step)
            else:
                seq = f"{next_seq:08d}"
                next_seq += 1
                if c.checkpoint(STREAM, sh, seq):
                    assert c.still_owns(STREAM, sh), (seed, step)
                    max_ckpt[sh] = max(max_ckpt[sh], seq)

            for s2 in shards:
                owners = [
                    x.owner for x in consumers if x.still_owns(STREAM, s2)
                ]
                assert len(owners) <= 1, (seed, step, s2, owners)
                lease = consumers[0].current_lease(STREAM, s2)
                if lease is not None:
                    # confirmed checkpoints survive steals, never regress
                    assert lease["ckpt"] >= max_ckpt[s2], (seed, step, s2)
                    # fencing epoch never decreases
                    assert lease["count"] >= max_count[s2], (seed, step, s2)
                    max_count[s2] = lease["count"]


def test_legacy_bare_lease_file_is_adopted(tmp_path):
    """Upgrade path: a round-5-format lease table (bare <shard>.json, no
    epoch suffix) is adopted — its fencing count and checkpoint carry
    into the first epoch-file claim, a LIVE legacy lease is respected,
    and the bare file is swept once superseded."""
    import json
    import os

    d = str(tmp_path / "l")
    os.makedirs(os.path.join(d, STREAM))
    for sh, expires in (("s-exp", 5.0), ("s-live", 1000.0)):
        with open(os.path.join(d, STREAM, f"{sh}.json"), "w") as f:
            json.dump(
                {"owner": "old", "expires_at": expires, "count": 7,
                 "ckpt": "00000042"},
                f,
            )
    clock = VClock()
    clock.t = 10.0  # s-exp expired, s-live still held
    b = ShardLeases(d, owner="B", ttl_s=10, clock=clock)
    # checkpoints are readable pre-claim (new claimant resumes after them)
    assert b.last_checkpoint(STREAM, "s-exp") == "00000042"
    assert not b.try_acquire(STREAM, "s-live")  # live legacy lease holds
    assert b.try_acquire(STREAM, "s-exp")
    lease = b.current_lease(STREAM, "s-exp")
    assert lease["owner"] == "B"
    assert lease["count"] == 8  # fencing token continues, never regresses
    assert lease["ckpt"] == "00000042"  # checkpoint survived the upgrade
    assert not os.path.exists(os.path.join(d, STREAM, "s-exp.json"))  # swept
