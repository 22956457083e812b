"""Kinesis shard-topology model: splits, merges, closed shards, and
parent/child lineage for the consumer side.

The reference writer never needed resharding — Kinesis hashes the
partition key server-side (kinesis/kinesis.go:179) and PutRecords is
topology-oblivious — but any long-lived CONSUMER of a real stream hits a
reshard eventually: a shard is split (capacity up) or two adjacent
shards merge (capacity down), the parents CLOSE (their GetRecords
eventually returns a null NextShardIterator — SHARD_END), and children
begin. Correct consumers must (a) keep reading a closed parent to its
end, (b) discover children via the ListShards parent linkage, and
(c) not start a child before its parents are fully consumed — that is
the ONLY ordering Kinesis guarantees per key across a reshard.

Emulation model (spool backend): the stream's routing history is a list
of GENERATIONS in ``<spool_dir>/_shards.json``. Each generation owns the
records whose sequence number is >= its ``from_seq`` (and < the next
generation's); within a generation a record routes by the 128-bit MD5 of
its partition key:

- ``kind: "mod"`` — the legacy layout: ``digest % n`` picks the shard.
  This is what a spool WITHOUT a topology file means (one mod-kind
  generation), so pre-resharding spools read exactly as before.
- ``kind: "ranges"`` — explicit ``[start, end)`` hash-key ranges, the
  real Kinesis model, required for split/merge.

Because sequence numbers are time-prefixed and strictly increasing
(streaming/spool.py), "records before the reshard route by the old
topology" is exactly "seq < from_seq" — the same cutover a real stream
performs at reshard time.

Lineage: a shard may appear in several consecutive generations (a
reshard leaves uninvolved shards open — they are the SAME shard, not
parent/child). A shard's PARENTS are the shards of the generation just
before its first appearance whose hash ranges overlap its own — one
parent for a split child, two for a merge child (AWS's ParentShardId +
AdjacentParentShardId). A shard absent from the newest generation is
CLOSED; its data ends at the from_seq where it disappeared.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field

HASH_SPACE = 1 << 128  # MD5 over the partition key, like Kinesis
TOPOLOGY_FILE = "_shards.json"


def key_hash(pk: str) -> int:
    return int.from_bytes(hashlib.md5(pk.encode("utf-8")).digest(), "big")


@dataclass(frozen=True)
class ShardInfo:
    """ListShards-shaped lineage entry."""

    shard_id: str
    parent_ids: tuple[str, ...]  # () for generation-0 shards
    closed: bool


@dataclass
class Generation:
    from_seq: str  # records with seq >= from_seq (and < next gen's) are ours
    kind: str  # "mod" | "ranges"
    n: int = 0  # mod-kind only
    shards: list[dict] = field(default_factory=list)  # ranges-kind: id/start/end

    def shard_ids(self) -> list[str]:
        if self.kind == "mod":
            return [f"shardId-{i:012d}" for i in range(self.n)]
        return [s["id"] for s in self.shards]

    def route(self, pk: str) -> str:
        h = key_hash(pk)
        if self.kind == "mod":
            return f"shardId-{h % self.n:012d}"
        for s in self.shards:
            if s["start"] <= h < s["end"]:
                return s["id"]
        raise AssertionError(f"hash ranges do not cover {h}")

    def range_of(self, shard_id: str) -> tuple[int, int]:
        if self.kind == "mod":
            # mod-kind interleaves the hash space; treat every shard as
            # full-range for lineage purposes (a regeneration from a
            # mod layout makes every old shard a parent of every child)
            return (0, HASH_SPACE)
        for s in self.shards:
            if s["id"] == shard_id:
                return (s["start"], s["end"])
        raise KeyError(shard_id)


class Topology:
    def __init__(self, generations: list[Generation], next_id: int):
        assert generations, "topology needs at least one generation"
        self.generations = generations
        self.next_id = next_id

    # -- routing ----------------------------------------------------------
    def generation_for_seq(self, seq: str) -> Generation:
        gen = self.generations[0]
        for g in self.generations[1:]:
            if seq >= g.from_seq:
                gen = g
            else:
                break
        return gen

    def shard_for(self, pk: str, seq: str) -> str:
        return self.generation_for_seq(seq).route(pk)

    # -- lineage ----------------------------------------------------------
    def shard_infos(self) -> list[ShardInfo]:
        """Every shard that ever existed, in generation order (parents
        always precede children), with parent linkage and closed flags."""
        latest = set(self.generations[-1].shard_ids())
        seen: dict[str, ShardInfo] = {}
        for gi, gen in enumerate(self.generations):
            for sid in gen.shard_ids():
                if sid in seen:
                    continue
                parents: tuple[str, ...] = ()
                if gi > 0:
                    prev = self.generations[gi - 1]
                    lo, hi = gen.range_of(sid)
                    parents = tuple(
                        p
                        for p in prev.shard_ids()
                        if p != sid
                        and _overlaps(prev.range_of(p), (lo, hi))
                    )
                seen[sid] = ShardInfo(sid, parents, sid not in latest)
        return list(seen.values())

    def close_seq(self, shard_id: str) -> str | None:
        """The from_seq of the generation where ``shard_id`` disappeared
        (records >= it belong to children), or None while open."""
        present = False
        for gen in self.generations:
            if shard_id in gen.shard_ids():
                present = True
            elif present:
                return gen.from_seq
        return None


def _overlaps(a: tuple[int, int], b: tuple[int, int]) -> bool:
    return a[0] < b[1] and b[0] < a[1]


# -- persistence -----------------------------------------------------------


def _topology_path(spool_dir: str) -> str:
    return os.path.join(spool_dir, TOPOLOGY_FILE)


def load_topology(spool_dir: str, n_shards_default: int) -> Topology:
    """The spool's topology; a spool without ``_shards.json`` is the
    legacy single mod-kind generation (routing unchanged)."""
    path = _topology_path(spool_dir)
    if not os.path.exists(path):
        return Topology(
            [Generation(from_seq="", kind="mod", n=n_shards_default)], next_id=0
        )
    with open(path) as f:
        doc = json.load(f)
    gens = [
        Generation(
            from_seq=g["from_seq"],
            kind=g["kind"],
            n=g.get("n", 0),
            shards=g.get("shards", []),
        )
        for g in doc["generations"]
    ]
    return Topology(gens, next_id=doc.get("next_id", 0))


def _save(spool_dir: str, topo: Topology) -> None:
    os.makedirs(spool_dir, exist_ok=True)
    doc = {
        "next_id": topo.next_id,
        "generations": [
            {
                "from_seq": g.from_seq,
                "kind": g.kind,
                **({"n": g.n} if g.kind == "mod" else {"shards": g.shards}),
            }
            for g in topo.generations
        ],
    }
    tmp = _topology_path(spool_dir) + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, _topology_path(spool_dir))


def _now_seq() -> str:
    """A cutover sequence number greater than every already-written seq
    (spool seqs are ``<time_ns:020d>-...``) and <= every later write."""
    return f"{time.time_ns():020d}"


class _TopologyLock:
    """Exclusive advisory lock for topology read-modify-write: Kinesis
    serializes reshards per stream (one at a time); two concurrent
    split/merge calls here would otherwise both load next_id, and the
    loser's os.replace would silently erase the winner's generation
    while both callers hold shard ids they believe exist."""

    def __init__(self, spool_dir: str, timeout_s: float = 5.0):
        self._path = os.path.join(spool_dir, TOPOLOGY_FILE + ".lock")
        self._timeout = timeout_s

    def __enter__(self):
        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        deadline = time.monotonic() + self._timeout
        while True:
            try:
                fd = os.open(self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return self
            except FileExistsError:
                # break a stale lock (holder crashed mid-reshard)
                try:
                    if time.time() - os.path.getmtime(self._path) > self._timeout:
                        os.unlink(self._path)
                        continue
                except OSError:
                    continue  # raced with the holder's release
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"topology lock {self._path} held too long — "
                        "another reshard in progress?"
                    ) from None
                time.sleep(0.02)

    def __exit__(self, *exc):
        try:
            os.unlink(self._path)
        except OSError:
            pass


def _spool_has_records(spool_dir: str) -> bool:
    try:
        return any(
            not n.startswith(".") and n.endswith(".jsonl")
            for n in os.listdir(spool_dir)
        )
    except OSError:
        return False


def init_topology(spool_dir: str, n_shards: int) -> list[str]:
    """Provision a ranges-kind generation with ``n_shards`` equal hash
    ranges (the real Kinesis layout; required before split/merge),
    returning the shard ids.

    On an EMPTY spool this is generation 0 (``from_seq=""``). On a spool
    that already holds records, the ranges generation is appended as a
    CUTOVER above the legacy mod generation instead of replacing it:
    ``digest % n`` and ``digest // step`` route the same key to
    DIFFERENT shard ids, so rewriting history would silently re-route
    every existing record — committed per-shard offsets would then skip
    moved-in records (loss) and re-read moved-out ones (duplicates).
    With the cutover, history keeps its mod routing (the old shards
    close, becoming parents) and only records written after the cutover
    use the range layout."""
    step = HASH_SPACE // n_shards
    with _TopologyLock(spool_dir):
        has_history = _spool_has_records(spool_dir) or os.path.exists(
            _topology_path(spool_dir)
        )
        base = topo = None
        if has_history:
            topo = load_topology(spool_dir, n_shards)
            base = topo.generations
            first_new = topo.next_id or max(
                len(g.shard_ids()) for g in base
            )
        else:
            first_new = 0
        shards = [
            {
                "id": f"shardId-{first_new + i:012d}",
                "start": i * step,
                "end": (i + 1) * step if i < n_shards - 1 else HASH_SPACE,
            }
            for i in range(n_shards)
        ]
        if has_history:
            gens = base + [
                Generation(from_seq=_now_seq(), kind="ranges", shards=shards)
            ]
        else:
            gens = [Generation(from_seq="", kind="ranges", shards=shards)]
        _save(spool_dir, Topology(gens, next_id=first_new + n_shards))
    return [s["id"] for s in shards]


def _next_generation(topo: Topology, new_shards: list[dict]) -> Generation:
    return Generation(from_seq=_now_seq(), kind="ranges", shards=new_shards)


def split_shard(spool_dir: str, shard_id: str, n_shards_default: int = 4) -> tuple[str, str]:
    """Split an open shard at its range midpoint: the parent closes, two
    children take [start, mid) and [mid, end). Records already written
    stay with the parent (seq < cutover); later writes route to the
    children. Returns (low_child, high_child)."""
    with _TopologyLock(spool_dir):
        topo = load_topology(spool_dir, n_shards_default)
        last = topo.generations[-1]
        if last.kind != "ranges":
            raise ValueError("split requires a ranges-kind topology (init_topology)")
        try:
            lo, hi = last.range_of(shard_id)
        except KeyError:
            raise ValueError(
                f"{shard_id} is not an open shard in the latest generation "
                "(already closed by an earlier reshard, or unknown)"
            ) from None
        mid = (lo + hi) // 2
        if mid == lo:
            raise ValueError(f"{shard_id} range too narrow to split")
        c1 = f"shardId-{topo.next_id:012d}"
        c2 = f"shardId-{topo.next_id + 1:012d}"
        new_shards = [s for s in last.shards if s["id"] != shard_id] + [
            {"id": c1, "start": lo, "end": mid},
            {"id": c2, "start": mid, "end": hi},
        ]
        topo.generations.append(_next_generation(topo, new_shards))
        topo.next_id += 2
        _save(spool_dir, topo)
    return c1, c2


def merge_shards(
    spool_dir: str, shard_a: str, shard_b: str, n_shards_default: int = 4
) -> str:
    """Merge two ADJACENT open shards: both parents close, one child
    takes the union range. Returns the child id."""
    with _TopologyLock(spool_dir):
        topo = load_topology(spool_dir, n_shards_default)
        last = topo.generations[-1]
        if last.kind != "ranges":
            raise ValueError("merge requires a ranges-kind topology (init_topology)")
        try:
            ra, rb = last.range_of(shard_a), last.range_of(shard_b)
        except KeyError as exc:
            raise ValueError(
                f"{exc.args[0]} is not an open shard in the latest generation "
                "(already closed by an earlier reshard, or unknown)"
            ) from None
        if ra[1] != rb[0] and rb[1] != ra[0]:
            raise ValueError(f"{shard_a} and {shard_b} are not adjacent")
        child = f"shardId-{topo.next_id:012d}"
        new_shards = [
            s for s in last.shards if s["id"] not in (shard_a, shard_b)
        ] + [{"id": child, "start": min(ra[0], rb[0]), "end": max(ra[1], rb[1])}]
        topo.generations.append(_next_generation(topo, new_shards))
        topo.next_id += 1
        _save(spool_dir, topo)
    return child
