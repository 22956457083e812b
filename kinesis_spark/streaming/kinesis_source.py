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

KCL worker mode (optional): ``lease_dir`` (+ ``consumer_id``,
``lease_ttl_s``) points several consumer queries at one shared shard
lease table (ingest/leases.py). Each query advances only the shards it
holds leases for — two queries split the stream disjointly instead of
double-reading — progress rides into the lease as per-shard
checkpoints (written from each batch's engine-committed start offsets),
and when a consumer dies its shards become claimable after the TTL with
the new owner resuming AFTER the lease checkpoint — it replays at most
the dead consumer's final uncheckpointed micro-batch (at-least-once
failover, never from-scratch).

Resharding (ingest/resharding.py): closed shards keep their final tip
and end with SHARD_END; children appear via the ListShards parent
linkage. The source orders PARENT BEFORE CHILD across micro-batches —
``latestOffset`` holds a child shard at its committed position until
every parent is consumed through its final sequence number, so a key's
pre-split records always land in an earlier micro-batch than its
post-split ones. The consumed-through state persists next to the spool
(``_consumer_state/<stream>.json``, override with option
``lineage_state_path``) because this reader is rebuilt blind on every
restart — the KCL-lease-table analog, max-merged with the Spark
checkpoint's own start offsets so a lost state file self-heals. Like a
KCL lease table, the state path defines the CONSUMER-GROUP scope: one
query per state path by contract. A brand-new query pointed at a used
path re-reads everything (initialOffset resets the state; nothing is
skipped or lost) but its very first batch may interleave a parent with
its children, because Spark resolves that batch's end offset before the
reader can learn the query is new — give each application its own
``lineage_state_path`` for strict first-batch ordering.

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
        # raw tips, NOT the stream reader's lineage-gated latestOffset: a
        # snapshot read covers parents and children in one job (order is
        # irrelevant when everything lands in the same result)
        tips = self._inner._client().latest_sequence_numbers(
            self._inner._stream
        )
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
        # KCL-style lineage checkpoint: the consumed-through state the
        # parent-before-child gate needs. Persisted (tiny json, atomic
        # rename) because the Python Data Source API rebuilds this reader
        # on every restart with no access to the Spark checkpoint — an
        # in-memory-only gate would hold children back FOREVER after a
        # restart. Real consumers persist exactly this (KCL lease table).
        import os

        self._state_path = options.get(
            "lineage_state_path",
            os.path.join(self._spool_dir, "_consumer_state", f"{self._stream}.json"),
        )
        # Per-shard consumer lag snapshot (VERDICT r6 task 5): refreshed
        # by every latestOffset probe, read driver-side by
        # attach_lag_listener on each progress event. A FILE because the
        # Python streaming source runner executes this reader in its own
        # worker process — in-memory state never reaches the session.
        self._lag_path = options.get(
            "lag_path", self._state_path + ".lag"
        )
        self._committed: dict = self._load_committed()
        # KCL worker mode (optional): with a shared lease_dir, several
        # consumer queries split the stream's shards disjointly — each
        # micro-batch advances ONLY the shards this consumer holds
        # leases for, commits ride into the lease as checkpoints, and a
        # dead consumer's shards migrate after lease_ttl_s with the new
        # owner resuming AFTER the lease checkpoint (at-least-once
        # failover, never from-scratch).
        self._leases = None
        if "lease_dir" in options:
            from kinesis_spark.ingest.leases import ShardLeases

            self._leases = ShardLeases(
                options["lease_dir"],
                owner=options.get("consumer_id"),
                ttl_s=float(options.get("lease_ttl_s", "30")),
            )

    def _client(self) -> SpoolConsumerClient:
        return SpoolConsumerClient(self._spool_dir, self._n_shards)

    def _load_committed(self) -> dict:
        import json
        import os

        try:
            with open(self._state_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _save_committed(self) -> None:
        import json
        import os
        import uuid

        os.makedirs(os.path.dirname(self._state_path), exist_ok=True)
        tmp = f"{self._state_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(self._committed, f)
        os.replace(tmp, self._state_path)

    # -- offsets (driver side) -------------------------------------------
    def initialOffset(self) -> dict:
        # Spark calls this ONLY for a brand-new query (no checkpoint) —
        # the one reliable signal that lineage state on disk belongs to
        # a PREVIOUS query. Reset it so every batch AFTER the first
        # gates on THIS query's own progress. It cannot protect batch 0
        # itself: Spark resolves the batch's END (latestOffset) before
        # it asks for the initial offset, so a fresh query sharing a
        # previous query's state path re-reads everything (no loss —
        # start is TRIM_HORIZON) but may interleave a parent and its
        # children inside that first batch. That is exactly KCL's
        # semantics for a shared lease table; for strict first-batch
        # ordering give each application its own ``lineage_state_path``
        # (the lease-table-per-application analog).
        self._committed = {}
        self._save_committed()
        return {sh: "" for sh in self._client().list_shards(self._stream)}

    def latestOffset(self) -> dict:
        """Per-shard tips, with one resharding rule: a CHILD shard's
        offset is held at its committed position until every parent is
        fully consumed (committed through the parent's final sequence
        number). That is the parent-before-child ordering Kinesis
        requires — a key's pre-split records (parent) are always read in
        an earlier micro-batch than its post-split records (child)."""
        client = self._client()
        tips = client.latest_sequence_numbers(self._stream)
        parent_map = {
            d["ShardId"]: [
                p
                for p in (d.get("ParentShardId"), d.get("AdjacentParentShardId"))
                if p
            ]
            for d in client.describe_shards(self._stream)
        }
        # the gate is TRANSITIVE over the ancestry: a record-less
        # intermediate shard (split A->B,C then B->D,E before anything
        # routed to B) must not break the chain — D stays held while
        # grandparent A is unconsumed, or a key's pre-split records
        # could land in the same batch as its post-split ones
        blocked: dict[str, bool] = {}

        def _is_blocked(sh: str) -> bool:
            if sh in blocked:
                return blocked[sh]
            blocked[sh] = False  # no cycles in shard lineage
            for p in parent_map.get(sh, []):
                if self._committed.get(p, "") < tips.get(p, "") or _is_blocked(p):
                    blocked[sh] = True
                    break
            return blocked[sh]

        held = {}
        stalled: set[str] = set()
        for sh, tip in tips.items():
            if parent_map.get(sh) and _is_blocked(sh):
                held[sh] = self._committed.get(sh, "")
                stalled.add(sh)  # lineage-held: can't advance yet
            else:
                held[sh] = tip
        if self._leases is not None:
            # KCL worker gate: only shards this consumer can claim may
            # advance; claiming also RENEWS (heartbeat rides the batch
            # cadence). A newly-acquired shard inherits the lease's
            # checkpoint so a migrated shard resumes after the previous
            # owner's last commit, not from TRIM_HORIZON.
            changed = False
            for sh in list(held):
                if self._leases.try_acquire(self._stream, sh):
                    lc = self._leases.last_checkpoint(self._stream, sh)
                    if lc > self._committed.get(sh, ""):
                        self._committed[sh] = lc
                        changed = True
                else:
                    held[sh] = self._committed.get(sh, "")  # not ours
                    stalled.add(sh)  # leased elsewhere: we can't drain it
            if changed:
                self._save_committed()
        self._write_lag_snapshot(client, stalled)
        return held

    def _write_lag_snapshot(self, client, stalled: set[str]) -> None:
        """Per-shard records-behind vs this consumer group's durable
        floor (lineage state, max-merged with lease checkpoints), plus
        whether the shard is currently stalled (lineage-held or leased
        by another consumer). Best-effort: lag is observability, a
        snapshot failure must never fail the offset probe."""
        probe = getattr(client, "records_behind", None)
        if probe is None:
            return  # backend can't count (real Kinesis: use MillisBehindLatest)
        import json
        import os
        import time
        import uuid

        try:
            floors = dict(self._committed)
            if self._leases is not None:
                from kinesis_spark.ingest.leases import _seq_key

                for sh in client.list_shards(self._stream):
                    lc = self._leases.last_checkpoint(self._stream, sh)
                    # _seq_key, not raw strings: lease checkpoints may be
                    # variable-width digit sequences ('10' > '9') even
                    # though the spool's own seqs are fixed-width
                    if _seq_key(lc) > _seq_key(floors.get(sh, "")):
                        floors[sh] = lc
            behind = probe(self._stream, floors)
            snap = {
                "ts": time.time(),
                "stream": self._stream,
                "shards": {
                    sh: {"records_behind": n, "stalled": sh in stalled}
                    for sh, n in sorted(behind.items())
                },
            }
            os.makedirs(os.path.dirname(self._lag_path) or ".", exist_ok=True)
            tmp = f"{self._lag_path}.{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as f:
                json.dump(snap, f)
            os.replace(tmp, self._lag_path)
        except Exception:
            pass  # observability only — never break latestOffset

    def partitions(self, start: dict, end: dict) -> list[ShardRange]:
        # the checkpoint's start is the truth about consumed-through —
        # fold it into the lineage state (covers a restart whose state
        # file lagged or was lost: monotonic max-merge)
        changed = False
        for sh, seq in start.items():
            if seq > self._committed.get(sh, ""):
                self._committed[sh] = seq
                changed = True
            if self._leases is not None and seq:
                # lease checkpoints ride the START offsets: batch N's
                # start is batch N-1's engine-committed end — the only
                # channel this runner exposes for durable progress (the
                # API's commit() hook is never invoked by the python
                # streaming source runner in this Spark build). The
                # final micro-batch before a crash is therefore never
                # lease-checkpointed, so failover replays AT MOST that
                # one batch — KCL's at-least-once contract exactly.
                self._leases.checkpoint(self._stream, sh, seq)
        if changed:
            self._save_committed()
        # one partition per shard that actually advanced; an empty batch
        # (start == end) plans zero partitions and costs nothing. A held
        # child (end < start after a lineage-state lag) is skipped — its
        # data stays in the stream for the batch after release.
        #
        # start_after takes the MAX of the checkpoint start and the
        # lineage state: after a lost state file, latestOffset can have
        # recorded a REGRESSED end ("" for a held child) into Spark's
        # offset log, which becomes a later batch's start — without
        # the floor, the released child would re-emit every record the
        # previous run already delivered. The lineage state is rebuilt
        # from checkpoint starts (max-merge above) and committed ends
        # (commit()), so it is never ahead of what was truly delivered.
        out = []
        for sh, end_seq in end.items():
            floor = max(start.get(sh, ""), self._committed.get(sh, ""))
            if self._leases is not None:
                # the lease checkpoint is the consumed-through floor that
                # SURVIVES ownership migration AND this reader's own
                # initialOffset reset (Spark resolves a fresh query's
                # first end offset before initialOffset wipes the
                # lineage state, so the in-memory committed map alone
                # cannot be trusted here)
                floor = max(
                    floor, self._leases.last_checkpoint(self._stream, sh)
                )
            if end_seq > floor:
                out.append(ShardRange(sh, floor, end_seq))
        return out

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
        # retains records (like Kinesis retention). The lineage state
        # additionally records consumed-through so the parent-before-
        # child gate survives restarts (monotonic max-merge).
        changed = False
        for sh, seq in end.items():
            if seq > self._committed.get(sh, ""):
                self._committed[sh] = seq
                changed = True
            if self._leases is not None and seq:
                # checkpoint INTO the lease: the failover contract —
                # whoever claims this shard next resumes after here
                self._leases.checkpoint(self._stream, sh, seq)
        if changed:
            self._save_committed()


# ---------------------------------------------------------------------------
# Consumer lag (VERDICT r6 task 5): first-class per-shard observability
# ---------------------------------------------------------------------------


def read_lag(lag_path: str) -> dict:
    """The reader's latest lag snapshot: ``{"ts": ..., "stream": ...,
    "shards": {shard_id: {"records_behind": int, "stalled": bool}}}`` —
    empty dict if no probe has run yet. ``lag_path`` defaults to
    ``<lineage_state_path>.lag`` (override with the reader option
    ``lag_path``)."""
    import json

    try:
        with open(lag_path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def attach_lag_listener(spark, lags: dict, lag_path: str, query_name: str | None = None):
    """Mirror the reader's per-shard lag snapshot into the driver-side
    ``lags`` dict on every progress event — the same engine-level
    observability channel as the ingest drop metrics
    (streaming/ingest.py attach_progress_listener). The snapshot rides a
    file because the Python streaming source runner executes the reader
    in its own worker process. Returns the listener; remove with
    ``spark.streams.removeListener``."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Lag(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            if query_name is not None and event.progress.name != query_name:
                return
            snap = read_lag(lag_path)
            if snap:
                lags.clear()
                lags.update(snap)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _Lag()
    spark.streams.addListener(listener)
    return listener
