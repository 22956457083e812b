"""Shard-lease coordination for concurrent consumers — the other half
of KCL that VERDICT r4 named out of scope for the single-reader
consumer (ingest/consumer.py): when two consumer processes drain the
same stream, each shard must have exactly ONE reader, or records are
double-processed.

Reference parity: none — the reference (remind101/kinesis) is
write-only; its README leaves consumption to "KCL or your own reader".
This module is the minimal lease table that makes "your own reader"
safe to run twice.

Design (KCL-lite, filesystem-backed):

- The lease table is a shared directory; one JSON file per
  (stream, shard) lease, named ``<stream>/<shard_id>.json``, holding
  the owner id and an expiry timestamp.
- **Claim** is an atomic exclusive file create (``O_CREAT|O_EXCL``) —
  the filesystem is the arbiter, so two concurrent claimants get
  exactly one winner (POSIX and NFSv4+ semantics; on object stores
  swap in a conditional PUT — same one-call protocol).
- **Renew** rewrites the expiry via atomic rename of a temp file
  (owner-checked: only the current owner renews).
- **Steal** of an EXPIRED lease unlinks + re-claims. Between the
  unlink and the create another claimant can slip in and win — that is
  correct (somebody owns it, exactly one), the thief just loses.
- Liveness, not safety, depends on the TTL: a wedged consumer's shards
  become claimable after ``ttl_s`` with no renew. A consumer that
  wakes from a long GC pause must check ``still_owns`` before
  committing work (the classic fencing caveat; a real deployment adds
  a fencing token column — the ``count`` field here is exactly that,
  monotonically bumped on every claim).

``partition_shards`` is the consumer-facing entry: give it the shard
list and it returns the subset this consumer now holds leases for —
feed that to ``read_stream_batch``'s shard loop and two consumers
split the stream disjointly (tested in tests/test_leases.py).
"""

from __future__ import annotations

import json
import os
import time
import uuid


class ShardLeases:
    def __init__(
        self,
        lease_dir: str,
        owner: str | None = None,
        ttl_s: float = 30.0,
        clock=time.monotonic,
    ) -> None:
        self.lease_dir = lease_dir
        self.owner = owner or f"consumer-{uuid.uuid4().hex[:8]}"
        self.ttl_s = ttl_s
        self.clock = clock
        os.makedirs(lease_dir, exist_ok=True)

    # -- internals ---------------------------------------------------------

    def _path(self, stream: str, shard_id: str) -> str:
        d = os.path.join(self.lease_dir, stream)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{shard_id}.json")

    def _read(self, path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            # a concurrent steal can unlink between exists-check and
            # open; a half-written file never exists (renew is an
            # atomic rename, claim writes through the O_EXCL fd before
            # anyone can observe content... except a reader racing the
            # first write — treat unreadable as absent)
            return None

    def _write_exclusive(self, path: str, lease: dict) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            json.dump(lease, f)
        return True

    # -- protocol ----------------------------------------------------------

    def try_acquire(self, stream: str, shard_id: str) -> bool:
        """Claim the shard lease; True iff this consumer now owns it
        (idempotent for the current owner — re-acquiring renews)."""
        path = self._path(stream, shard_id)
        now = self.clock()
        cur = self._read(path)
        if cur is not None:
            if cur["owner"] == self.owner:
                return self.renew(stream, shard_id)
            if now < cur["expires_at"]:
                return False  # live lease held by someone else
            # expired: steal = unlink + exclusive re-create; losing the
            # re-create race to another claimant is a clean loss
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
        lease = {
            "owner": self.owner,
            "expires_at": now + self.ttl_s,
            "count": (cur["count"] + 1) if cur else 1,  # fencing token
            # KCL-style lease checkpoint: the consumed-through sequence
            # SURVIVES ownership changes, so the thief resumes after the
            # previous owner's last committed position instead of
            # re-reading the shard from TRIM_HORIZON
            "ckpt": (cur or {}).get("ckpt", ""),
        }
        return self._write_exclusive(path, lease)

    def renew(self, stream: str, shard_id: str) -> bool:
        """Extend the lease TTL; True iff this consumer still owns it."""
        path = self._path(stream, shard_id)
        cur = self._read(path)
        if cur is None or cur["owner"] != self.owner:
            return False
        cur["expires_at"] = self.clock() + self.ttl_s
        tmp = f"{path}.{self.owner}.tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f)
        os.replace(tmp, path)  # atomic on POSIX
        return True

    def release(self, stream: str, shard_id: str) -> None:
        """Give the lease up (clean shutdown — no TTL wait for peers).
        Expires the lease in place rather than deleting it, so the
        checkpoint survives for the next claimant."""
        path = self._path(stream, shard_id)
        cur = self._read(path)
        if cur is not None and cur["owner"] == self.owner:
            cur["expires_at"] = self.clock()  # immediately claimable
            tmp = f"{path}.{self.owner}.tmp"
            with open(tmp, "w") as f:
                json.dump(cur, f)
            os.replace(tmp, path)

    def checkpoint(self, stream: str, shard_id: str, seq: str) -> bool:
        """Record the consumed-through sequence number INTO the lease
        (owner-only; monotonic). The checkpoint is what makes failover
        at-least-once instead of from-scratch: a later claimant reads it
        via ``last_checkpoint`` and resumes AFTER it."""
        path = self._path(stream, shard_id)
        cur = self._read(path)
        if cur is None or cur["owner"] != self.owner:
            return False
        if seq <= cur.get("ckpt", ""):
            return True  # monotonic: never regress a checkpoint
        cur["ckpt"] = seq
        cur["expires_at"] = self.clock() + self.ttl_s  # checkpoint = heartbeat
        tmp = f"{path}.{self.owner}.tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f)
        os.replace(tmp, path)
        return True

    def last_checkpoint(self, stream: str, shard_id: str) -> str:
        """The shard's recorded consumed-through sequence (readable by
        anyone — a NEW claimant calls this before its first read); ""
        means never checkpointed (TRIM_HORIZON)."""
        cur = self._read(self._path(stream, shard_id))
        return (cur or {}).get("ckpt", "")

    def still_owns(self, stream: str, shard_id: str) -> bool:
        cur = self._read(self._path(stream, shard_id))
        return (
            cur is not None
            and cur["owner"] == self.owner
            and self.clock() < cur["expires_at"]
        )

    def partition_shards(self, stream: str, shard_ids: list[str]) -> list[str]:
        """Claim every currently-claimable shard; returns the sorted
        subset this consumer holds. Two consumers calling this against
        the same lease dir receive DISJOINT subsets whose union is the
        full list (modulo shards held by a third, still-live owner)."""
        return sorted(s for s in shard_ids if self.try_acquire(stream, s))
