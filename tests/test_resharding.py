"""Kinesis resharding on the read side: shard splits/merges close the
parents (SHARD_END), children carry the ListShards parent linkage, and
the streaming source consumes parent-before-child with no loss and no
reorder within a shard lineage.

The reference writer never needed this (server-side hashing,
kinesis/kinesis.go:179); any long-lived consumer of a real stream does.
"""

from __future__ import annotations

import pytest

from kinesis_spark.ingest.consumer import (
    SpoolConsumerClient,
    read_stream_batch,
)
from kinesis_spark.ingest.resharding import (
    init_topology,
    key_hash,
    load_topology,
    merge_shards,
    split_shard,
)
from kinesis_spark.ingest.writer import Record
from kinesis_spark.streaming.spool import SpoolStreamClient, reassemble_records

STREAM = "reshard-stream"
N_SHARDS = 4


def _keys_for_shard(spool: str, shard_id: str, n: int, tag: str) -> list[str]:
    """Deterministic partition keys that route to ``shard_id`` under the
    CURRENT topology's newest generation."""
    topo = load_topology(spool, N_SHARDS)
    gen = topo.generations[-1]
    keys, i = [], 0
    while len(keys) < n:
        pk = f"{tag}-{i}"
        if gen.route(pk) == shard_id:
            keys.append(pk)
        i += 1
    return keys


def _put(spool: str, payloads: dict[str, bytes]) -> None:
    sink = SpoolStreamClient(spool)
    for pk, data in payloads.items():
        sink.put_records(STREAM, [Record(data=data, partition_key=pk)])


# -- topology unit tests ----------------------------------------------------


def test_split_closes_parent_and_links_children(tmp_path):
    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    c1, c2 = split_shard(spool, shards[0])
    topo = load_topology(spool, N_SHARDS)
    infos = {s.shard_id: s for s in topo.shard_infos()}
    assert infos[shards[0]].closed
    assert not infos[c1].closed and not infos[c2].closed
    assert infos[c1].parent_ids == (shards[0],)
    assert infos[c2].parent_ids == (shards[0],)
    # uninvolved shards stay open with no parents
    for sh in shards[1:]:
        assert not infos[sh].closed and infos[sh].parent_ids == ()
    # parents precede children in listing order
    order = [s.shard_id for s in topo.shard_infos()]
    assert order.index(shards[0]) < order.index(c1) < order.index(c2)


def test_merge_links_both_parents(tmp_path):
    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    child = merge_shards(spool, shards[1], shards[2])
    infos = {s.shard_id: s for s in load_topology(spool, N_SHARDS).shard_infos()}
    assert infos[shards[1]].closed and infos[shards[2]].closed
    assert set(infos[child].parent_ids) == {shards[1], shards[2]}
    assert not infos[child].closed


def test_routing_cuts_over_at_reshard(tmp_path):
    """A record written before the split routes to the parent; the same
    key written after routes to a child — the per-key lineage Kinesis
    maintains."""
    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pk = _keys_for_shard(spool, shards[0], 1, "pk")[0]
    _put(spool, {pk: b"before"})
    c1, c2 = split_shard(spool, shards[0])
    _put(spool, {pk: b"after"})
    client = SpoolConsumerClient(spool, N_SHARDS)
    parent_recs = client._shard_records(STREAM, shards[0])
    assert [r["pk"] for r in parent_recs] == [pk]
    child = c1 if key_hash(pk) < load_topology(spool, N_SHARDS).generations[-1].range_of(c1)[1] else c2
    child_recs = client._shard_records(STREAM, child)
    assert [r["pk"] for r in child_recs] == [pk]
    # within the lineage, parent seq < child seq (order preserved)
    assert parent_recs[0]["seq"] < child_recs[0]["seq"]


def test_closed_shard_ends_with_null_iterator(tmp_path):
    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pk = _keys_for_shard(spool, shards[0], 1, "pk")[0]
    _put(spool, {pk: b"x"})
    split_shard(spool, shards[0])
    # seal_grace_ns=0: this test wants the immediate SHARD_END signal;
    # the grace (in-flight-writer guard) has its own test below
    client = SpoolConsumerClient(spool, N_SHARDS, seal_grace_ns=0)
    it = client.get_shard_iterator(STREAM, shards[0], "TRIM_HORIZON")
    resp = client.get_records(it)
    assert [r["Data"] for r in resp["Records"]] == [b"x"]
    assert resp["NextShardIterator"] is None  # SHARD_END
    # an OPEN shard at its tip keeps a valid iterator
    it2 = client.get_shard_iterator(STREAM, shards[1], "TRIM_HORIZON")
    resp2 = client.get_records(it2)
    assert resp2["NextShardIterator"] is not None


def test_seal_grace_keeps_closed_shard_open_for_inflight_writes(tmp_path):
    """A put that captured its time-prefixed seq just before the reshard
    cutover can rename its spool file just after a reader drained the
    closed parent. Within the seal grace the parent's iterator stays
    valid, so the late-landing record is still delivered; after the
    grace the shard seals (SHARD_END)."""
    import time as _time

    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pk = _keys_for_shard(spool, shards[0], 1, "pk")[0]
    _put(spool, {pk: b"x"})
    split_shard(spool, shards[0])
    client = SpoolConsumerClient(spool, N_SHARDS, seal_grace_ns=400_000_000)
    it = client.get_shard_iterator(STREAM, shards[0], "TRIM_HORIZON")
    resp = client.get_records(it)
    assert [r["Data"] for r in resp["Records"]] == [b"x"]
    # within the grace: NOT sealed — the reader can keep polling
    assert resp["NextShardIterator"] is not None
    # ...and a pre-cutover record landing late is still picked up
    resp2 = client.get_records(resp["NextShardIterator"])
    assert resp2["NextShardIterator"] is not None
    _time.sleep(0.45)
    resp3 = client.get_records(resp2["NextShardIterator"])
    assert resp3["NextShardIterator"] is None  # sealed after the grace


def test_legacy_spool_without_topology_unchanged(tmp_path):
    """No _shards.json => the old md5 % n routing, open shards, no
    parents — existing spools read exactly as before."""
    spool = str(tmp_path / "spool")
    _put(spool, {"pk0": b"a"})
    client = SpoolConsumerClient(spool, N_SHARDS)
    assert client.list_shards(STREAM) == [
        f"shardId-{i:012d}" for i in range(N_SHARDS)
    ]
    assert all("ParentShardId" not in d for d in client.describe_shards(STREAM))


# -- Spark read paths -------------------------------------------------------


def test_batch_read_across_split_and_merge_byte_exact(spark, tmp_path):
    """Produce across a split AND a merge; the snapshot batch read must
    reassemble every key byte-exact (no loss, per-key order kept)."""
    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pks = [_keys_for_shard(spool, sh, 1, f"s{i}")[0] for i, sh in enumerate(shards)]
    _put(spool, {pk: f"pre-{pk}|".encode() for pk in pks})
    split_shard(spool, shards[0])
    _put(spool, {pk: f"mid-{pk}|".encode() for pk in pks})
    merge_shards(spool, shards[1], shards[2])
    _put(spool, {pk: f"post-{pk}|".encode() for pk in pks})
    df = read_stream_batch(
        spark, lambda: SpoolConsumerClient(spool, N_SHARDS), STREAM, limit_per_call=2
    )
    got = {r.pk: bytes(r.stream_bytes) for r in reassemble_records(df).collect()}
    assert got == {
        pk: f"pre-{pk}|mid-{pk}|post-{pk}|".encode() for pk in pks
    }


@pytest.mark.streaming
def test_streaming_consumes_parent_before_child(spark, tmp_path):
    """Produce across a split; the streaming source must emit every
    parent record in an EARLIER micro-batch than any record of its
    children, lose nothing, and keep per-key order."""
    from kinesis_spark.streaming.kinesis_source import KinesisConsumerDataSource

    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pks = _keys_for_shard(spool, shards[0], 2, "k")
    other = _keys_for_shard(spool, shards[3], 1, "o")[0]
    _put(spool, {pk: f"pre-{pk}|".encode() for pk in pks + [other]})
    c1, c2 = split_shard(spool, shards[0])
    _put(spool, {pk: f"post-{pk}|".encode() for pk in pks + [other]})

    spark.dataSource.register(KinesisConsumerDataSource)
    seen: list[tuple[int, str, str]] = []  # (batch_id, shard_id, seq)
    rows_acc = []

    def sink(batch, batch_id):
        rows = batch.collect()
        rows_acc.extend(rows)
        seen.extend((batch_id, r.shard_id, r.seq) for r in rows)

    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("kinesis_consumer")
            .option("spool_dir", spool)
            .option("stream", STREAM)
            .option("n_shards", str(N_SHARDS))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1 consumes the parents (children gated); run 2 (a RESTART — a
    # fresh reader that must reload lineage state) releases the children
    drain()
    drain()

    expected = 2 * (len(pks) + 1)
    assert len(rows_acc) == expected, seen
    parent_batches = [b for b, sh, _ in seen if sh == shards[0]]
    child_batches = [b for b, sh, _ in seen if sh in (c1, c2)]
    assert parent_batches and child_batches
    assert max(parent_batches) < min(child_batches), seen
    # byte-exact reassembly incl. per-key order across the lineage
    df = spark.createDataFrame(rows_acc)
    got = {r.pk: bytes(r.stream_bytes) for r in reassemble_records(df).collect()}
    assert got == {
        pk: f"pre-{pk}|post-{pk}|".encode() for pk in pks + [other]
    }


@pytest.mark.streaming
def test_streaming_merge_waits_for_both_parents(spark, tmp_path):
    from kinesis_spark.streaming.kinesis_source import KinesisConsumerDataSource

    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pk_a = _keys_for_shard(spool, shards[1], 1, "a")[0]
    pk_b = _keys_for_shard(spool, shards[2], 1, "b")[0]
    _put(spool, {pk_a: b"A1|", pk_b: b"B1|"})
    child = merge_shards(spool, shards[1], shards[2])
    _put(spool, {pk_a: b"A2|", pk_b: b"B2|"})

    spark.dataSource.register(KinesisConsumerDataSource)
    seen: list[tuple[int, str]] = []
    rows_acc = []

    def sink(batch, batch_id):
        rows = batch.collect()
        rows_acc.extend(rows)
        seen.extend((batch_id, r.shard_id) for r in rows)

    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):
        q = (
            spark.readStream.format("kinesis_consumer")
            .option("spool_dir", spool)
            .option("stream", STREAM)
            .option("n_shards", str(N_SHARDS))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    parent_batches = [b for b, sh in seen if sh in (shards[1], shards[2])]
    child_batches = [b for b, sh in seen if sh == child]
    assert parent_batches and child_batches
    assert max(parent_batches) < min(child_batches), seen
    df = spark.createDataFrame(rows_acc)
    got = {r.pk: bytes(r.stream_bytes) for r in reassemble_records(df).collect()}
    assert got == {pk_a: b"A1|A2|", pk_b: b"B1|B2|"}


def test_cli_consume_across_reshard_byte_exact(tmp_path):
    """The CLI's --consume drain walks closed parents to SHARD_END and
    children after, reassembling the key's bytes exactly."""
    import io

    from kinesis_spark.__main__ import main as cli_main

    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pk = _keys_for_shard(spool, shards[0], 1, "cli")[0]
    _put(spool, {pk: b"hello "})
    split_shard(spool, shards[0])
    _put(spool, {pk: b"world"})
    out = io.BytesIO()
    rc = cli_main(
        [STREAM, "-p", pk, "--fake-sink", spool, "--consume"],
        stdout=out,
    )
    assert rc == 0
    assert out.getvalue() == b"hello world"


@pytest.mark.streaming
def test_fresh_query_lineage_state_scoping(spark, tmp_path):
    """The lineage state path is the consumer-group scope (KCL lease
    table analog). A NEW query (fresh checkpoint) over a spool another
    query already drained must (a) re-read EVERYTHING when sharing the
    default state path — no rows skipped because of the other query's
    consumed-through marks (initialOffset resets them) — and (b) get
    strict parent-before-child ordering when given its OWN
    lineage_state_path."""
    from kinesis_spark.streaming.kinesis_source import KinesisConsumerDataSource

    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pk = _keys_for_shard(spool, shards[0], 1, "f")[0]
    _put(spool, {pk: b"pre|"})
    c1, c2 = split_shard(spool, shards[0])
    _put(spool, {pk: b"post|"})
    spark.dataSource.register(KinesisConsumerDataSource)

    def run(ckpt, sink, state_path=None):
        reader = (
            spark.readStream.format("kinesis_consumer")
            .option("spool_dir", spool)
            .option("stream", STREAM)
            .option("n_shards", str(N_SHARDS))
        )
        if state_path:
            reader = reader.option("lineage_state_path", state_path)
        q = (
            reader.load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # query A drains everything (two runs: parents then children)
    a_rows = []
    for _ in range(2):
        run(str(tmp_path / "ckptA"), lambda b, i: a_rows.extend(b.collect()))
    assert len(a_rows) == 2

    # (a) query B: fresh checkpoint, SHARED default state path. Must see
    # all the data again — A's consumed-through marks cannot make B skip
    # rows. (Its batch 0 may interleave parent and child: Spark fixes
    # the batch end before the reader learns the query is new — the
    # documented shared-lease-table semantics.)
    b_rows = []
    for _ in range(2):
        run(str(tmp_path / "ckptB"), lambda b, i: b_rows.extend(b.collect()))
    assert sorted(bytes(r.data) for r in b_rows) == [b"post|", b"pre|"]

    # (b) query C: fresh checkpoint, OWN state path — strict ordering
    seen_c: list[tuple[int, str]] = []

    def sink_c(batch, batch_id):
        seen_c.extend((batch_id, r.shard_id) for r in batch.collect())

    own_state = str(tmp_path / "lineageC.json")
    for _ in range(2):
        run(str(tmp_path / "ckptC"), sink_c, state_path=own_state)
    parent_c = [b for b, sh in seen_c if sh == shards[0]]
    child_c = [b for b, sh in seen_c if sh in (c1, c2)]
    assert parent_c and child_c, seen_c
    assert max(parent_c) < min(child_c), seen_c


# -- property tests ---------------------------------------------------------


def test_topology_routing_invariants_under_random_reshards(tmp_path):
    """Hypothesis-style invariants over random reshard sequences: every
    key routes to exactly ONE shard in every generation (full hash-space
    coverage, no overlap), parents always precede children, and every
    closed shard's range is exactly covered by its successors."""
    import random

    from kinesis_spark.ingest.resharding import HASH_SPACE

    rng = random.Random(42)
    spool = str(tmp_path / "spool")
    init_topology(spool, N_SHARDS)
    for step in range(12):
        topo = load_topology(spool, N_SHARDS)
        gen = topo.generations[-1]
        open_shards = gen.shard_ids()
        if rng.random() < 0.6 or len(open_shards) < 2:
            victim = rng.choice(open_shards)
            try:
                split_shard(spool, victim)
            except ValueError:
                pass  # range too narrow — legal no-op
        else:
            # pick two adjacent shards by range order
            ordered = sorted(open_shards, key=lambda s: gen.range_of(s)[0])
            i = rng.randrange(len(ordered) - 1)
            merge_shards(spool, ordered[i], ordered[i + 1])

    topo = load_topology(spool, N_SHARDS)
    for gen in topo.generations:
        ranges = sorted(gen.range_of(s) for s in gen.shard_ids())
        # exact partition of the hash space: no gap, no overlap
        assert ranges[0][0] == 0 and ranges[-1][1] == HASH_SPACE
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 == b0, (a0, a1, b0, b1)
        # spot keys route uniquely
        for i in range(50):
            owners = [
                s for s in gen.shard_ids()
                if gen.range_of(s)[0] <= key_hash(f"k{i}") < gen.range_of(s)[1]
            ]
            assert len(owners) == 1

    infos = topo.shard_infos()
    order = [s.shard_id for s in infos]
    for s in infos:
        for p in s.parent_ids:
            assert order.index(p) < order.index(s.shard_id)
    # every closed shard's successors exactly cover its range
    by_id = {s.shard_id: s for s in infos}
    for s in infos:
        if not s.closed:
            continue
        heirs = [c for c in infos if s.shard_id in c.parent_ids]
        assert heirs, f"closed {s.shard_id} has no children"


def test_gate_is_transitive_across_recordless_intermediate(tmp_path):
    """split A->B,C then B->D,E before anything routed to B: B has no
    records, so a gate that checks only IMMEDIATE parents would release
    D while grandparent A is still unconsumed — a key's pre-split
    records could then land in the same batch as its post-split ones.
    The gate must walk the whole ancestry."""
    from kinesis_spark.streaming.kinesis_source import KinesisShardStreamReader

    spool = str(tmp_path / "spool")
    shards = init_topology(spool, N_SHARDS)
    pk = _keys_for_shard(spool, shards[0], 1, "k")[0]
    _put(spool, {pk: b"pre"})          # lands in A = shards[0]
    b, c = split_shard(spool, shards[0])
    d, e = split_shard(spool, b)       # B closed record-less
    _put(spool, {pk: b"post"})         # routes to one of D/E now

    reader = KinesisShardStreamReader(
        {"spool_dir": spool, "stream": STREAM, "n_shards": str(N_SHARDS)}
    )
    off = reader.latestOffset()
    client = SpoolConsumerClient(spool, N_SHARDS)
    tips = client.latest_sequence_numbers(STREAM)
    assert tips[shards[0]]             # A has unconsumed data
    post_shard = next(sh for sh in (d, e) if tips[sh])
    # every descendant of A is held at its committed position ("")
    assert off[post_shard] == "", off
    assert off[c] == "", off
    # ...until A (and then the intermediate lineage) is consumed
    reader._committed = dict(tips)
    off2 = reader.latestOffset()
    assert off2[post_shard] == tips[post_shard]


def test_offset_floor_prevents_replay_after_state_loss(tmp_path):
    """Lost lineage state + restart: latestOffset can record a REGRESSED
    end ("" for a held child) into Spark's offset log, which becomes the
    next batch's start. The lineage floor (rebuilt from checkpoint
    starts) must stop the released child from re-emitting records the
    previous run already delivered."""
    from kinesis_spark.streaming.kinesis_source import KinesisShardStreamReader

    spool = str(tmp_path / "spool")
    init_topology(spool, N_SHARDS)
    reader = KinesisShardStreamReader(
        {"spool_dir": spool, "stream": STREAM, "n_shards": str(N_SHARDS)}
    )
    sh = "shardId-000000000000"
    # batch with a regressed end (checkpoint start ahead of end): plans
    # nothing, but TEACHES the lineage state the consumed-through point
    assert reader.partitions({sh: "50"}, {sh: ""}) == []
    # next batch starts from the regressed ""; the floor holds at 50
    parts = reader.partitions({sh: ""}, {sh: "70"})
    assert len(parts) == 1 and parts[0].start_after == "50", parts


def test_init_topology_on_used_spool_appends_cutover(tmp_path):
    """init_topology on a spool that already holds records must NOT
    rewrite history: digest%n and digest//step route the same key to
    DIFFERENT shard ids, so replacing the legacy mod generation would
    silently re-route every existing record under the same shard names
    (committed offsets would skip moved-in records and re-read moved-out
    ones). The ranges generation is appended as a cutover instead —
    history keeps its mod routing and the old shards become parents."""
    spool = str(tmp_path / "spool")
    _put(spool, {f"pk{i}": b"old" for i in range(20)})  # legacy mod spool
    client = SpoolConsumerClient(spool, N_SHARDS)
    before = {
        sh: [r["seq"] for r in client._shard_records(STREAM, sh)]
        for sh in client.list_shards(STREAM)
    }
    new_ids = init_topology(spool, N_SHARDS)
    # every pre-existing record still routes exactly as before
    after = {
        sh: [r["seq"] for r in client._shard_records(STREAM, sh)] for sh in before
    }
    assert after == before
    # the new range shards are fresh ids with the old shards as parents
    assert not set(new_ids) & set(before)
    infos = {s.shard_id: s for s in load_topology(spool, N_SHARDS).shard_infos()}
    assert all(infos[sh].closed for sh in before)
    assert all(infos[sid].parent_ids for sid in new_ids)
    # new writes route by the range layout
    _put(spool, {"pk0": b"new"})
    routed = load_topology(spool, N_SHARDS).generations[-1].route("pk0")
    assert routed in new_ids
    assert any(
        r["data"] for r in client._shard_records(STREAM, routed)
    )
