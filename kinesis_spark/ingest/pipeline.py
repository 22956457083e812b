"""The fixed 3-node writer composition the reference calls NewFastWriter.

Reference (kinesis/kinesis.go:37-57):
``BufferedWriter(4 MB, 1 s) → DropWriter(queue=4) → Writer(chunk+batch+put)``.
"""

from __future__ import annotations

from collections.abc import Callable

from kinesis_spark.ingest.buffered import BufferedWriter
from kinesis_spark.ingest.drop import DropWriter, _default_on_drop
from kinesis_spark.ingest.limits import (
    BUFFER_SIZE,
    DROP_QUEUE_DEPTH,
    FLUSH_PERIOD_S,
    SHARD_BYTES_RATE_LIMIT,
    SHARD_RECORDS_RATE_LIMIT,
)
from kinesis_spark.ingest.writer import PutRecordsClient, Writer

_DEFAULT_RATE = (float(SHARD_RECORDS_RATE_LIMIT), float(SHARD_BYTES_RATE_LIMIT))


def new_fast_writer(
    client: PutRecordsClient,
    stream_name: str,
    partition_key: str,
    *,
    buffer_size: int = BUFFER_SIZE,
    flush_period_s: float = FLUSH_PERIOD_S,
    queue_depth: int = DROP_QUEUE_DEPTH,
    on_drop: Callable[[bytes], None] = _default_on_drop,
    shard_rate_limits: tuple[float, float] | None = _DEFAULT_RATE,
) -> tuple[BufferedWriter, DropWriter]:
    """Build buffered → drop → writer; returns (head, drop_stage).

    The drop stage is returned too so callers can read its drop counters —
    the reference only exposes drops via a global callback hook.

    The per-shard rate envelope defaults ON (limits.py promises
    "enforces all of them, defaulting on"; one fixed partition key = one
    shard = one writer). Pass ``shard_rate_limits=None`` to disable.
    """
    throttle = None
    if shard_rate_limits is not None:
        from kinesis_spark.ingest.throttle import RateLimiter

        throttle = RateLimiter(*shard_rate_limits)
    writer = Writer(client, stream_name, partition_key, throttle=throttle)
    drop = DropWriter(writer, queue_depth, on_drop)
    buffered = BufferedWriter(drop, buffer_size, flush_period_s)
    return buffered, drop
