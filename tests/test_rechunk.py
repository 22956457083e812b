"""Unframed concat-then-chunk parity (SURVEY.md §7(c), VERDICT item 5).

The reference chunks a single buffered byte stream (kinesis/kinesis.go:
244-268) fed by io.Copy's arbitrary blocks (main.go:32-35); record
boundaries are therefore independent of how the bytes arrived. These
property tests pin exactly that: however the payload is framed into rows
and micro-batches, unframed_rechunk emits the chunks chunk_bytes() would
emit for the whole payload.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_spark.ingest.chunker import chunk_bytes
from kinesis_spark.ingest.rechunk import StreamRechunker, unframed_rechunk


def _frame(payload: bytes, cuts: list[int]) -> list[bytes]:
    """Split payload at the given cut points (arbitrary framing)."""
    pts = sorted({c % (len(payload) + 1) for c in cuts} | {0, len(payload)})
    return [payload[a:b] for a, b in zip(pts, pts[1:])]


def _df(spark, frames):
    return spark.createDataFrame(
        [(i, f) for i, f in enumerate(frames)], "ord int, data binary"
    )


@settings(deadline=None, max_examples=12)
@given(
    payload=st.binary(min_size=0, max_size=2000),
    cuts=st.lists(st.integers(0, 10_000), max_size=12),
    chunk_size=st.integers(1, 257),
)
def test_rechunk_matches_whole_payload(spark, payload, cuts, chunk_size):
    frames = _frame(payload, cuts)
    rows = unframed_rechunk(_df(spark, frames), chunk_size, "ord").collect()
    got = {r["chunk_id"]: bytes(r["chunk"]) for r in rows}
    want = chunk_bytes(payload, chunk_size)
    assert got == dict(enumerate(want))
    assert all(r["chunk_bytes"] == len(got[r["chunk_id"]]) for r in rows)


@settings(deadline=None, max_examples=8)
@given(
    payload=st.binary(min_size=1, max_size=1500),
    cuts=st.lists(st.integers(0, 10_000), max_size=10),
    batch_cuts=st.lists(st.integers(0, 50), max_size=4),
    chunk_size=st.integers(1, 129),
)
def test_stream_rechunker_boundary_independent(
    spark, payload, cuts, batch_cuts, chunk_size
):
    """Chunk boundaries must not depend on micro-batch framing: every
    emitted chunk is exactly chunk_size, drain() returns the remainder,
    and the concatenation reassembles the payload byte-for-byte."""
    frames = _frame(payload, cuts)
    pts = sorted({c % (len(frames) + 1) for c in batch_cuts} | {0, len(frames)})
    rc = StreamRechunker(chunk_size)
    emitted: list[bytes] = []
    for a, b in zip(pts, pts[1:]):
        emitted.extend(rc.rechunk_batch(_df(spark, frames[a:b]), "ord"))
    assert all(len(c) == chunk_size for c in emitted)
    emitted.extend(rc.drain())
    assert b"".join(emitted) == payload
    assert emitted == chunk_bytes(payload, chunk_size)
    assert rc.carry == b""


def test_unframed_differs_from_per_row_when_frames_misaligned(spark):
    """The point of the operator: line/row framing changes record
    boundaries vs io.Copy semantics; concat-then-chunk restores them."""
    frames = [b"abcde", b"fg", b"hijklmno"]  # frame lens 5,2,8; cs=4
    rows = unframed_rechunk(_df(spark, frames), 4, "ord").collect()
    got = [bytes(r["chunk"]) for r in sorted(rows, key=lambda r: r["chunk_id"])]
    assert got == [b"abcd", b"efgh", b"ijkl", b"mno"]
    per_row = [c for f in frames for c in chunk_bytes(f, 4)]
    assert got != per_row  # boundaries genuinely move


def test_rechunk_empty_and_empty_frames(spark):
    assert unframed_rechunk(_df(spark, [b"", b""]), 8, "ord").count() == 0
    df = spark.createDataFrame([], "ord int, data binary")
    assert unframed_rechunk(df, 8, "ord").count() == 0
    rc = StreamRechunker(3)
    assert rc.rechunk_batch(df, "ord") == []
    assert rc.drain() == []


def test_rechunk_plan_has_no_global_sort(spark):
    """Scale audit: offsets come from a two-level prefix sum — the window
    sort is per-partition (partitionBy __pid), never a single-partition
    global sort."""
    df = _df(spark, [bytes([i]) * 100 for i in range(64)]).repartition(8)
    plan = unframed_rechunk(df, 7, "ord")._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_stream_rechunker_random_soak(spark):
    """Deterministic longer soak: 10 micro-batches of random frames."""
    rng = random.Random(7)
    payload = bytes(rng.randrange(256) for _ in range(5000))
    frames = _frame(payload, [rng.randrange(5001) for _ in range(40)])
    rc = StreamRechunker(256)
    emitted = []
    i = 0
    while i < len(frames):
        j = min(len(frames), i + rng.randrange(1, 8))
        emitted.extend(rc.rechunk_batch(_df(spark, list(frames[i:j])), "ord"))
        i = j
    emitted.extend(rc.drain())
    assert emitted == chunk_bytes(payload, 256)
