"""Per-shard rate throttle — enforcement of the reference's dead
constants (kinesis/kinesis.go:25,28: 1000 records/s and 1 MiB/s per
shard, declared but never referenced; SURVEY.md §1.3).

A dual token bucket (records + bytes). One limiter per writer/partition
task mirrors the service's per-shard envelope under the reference's
fixed-partition-key model (one writer → one shard). Clock and sleep are
injectable so tests run on a virtual clock.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from kinesis_spark.ingest.limits import (
    SHARD_BYTES_RATE_LIMIT,
    SHARD_RECORDS_RATE_LIMIT,
)


class RateLimiter:
    """Dual token bucket: admits (n_records, n_bytes) units, sleeping
    until both buckets can cover the request. Burst capacity = one
    second of budget (the service's accounting granularity)."""

    def __init__(
        self,
        records_per_s: float = SHARD_RECORDS_RATE_LIMIT,
        bytes_per_s: float = SHARD_BYTES_RATE_LIMIT,
        *,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
        start_empty: bool = False,
    ) -> None:
        if records_per_s <= 0 or bytes_per_s <= 0:
            raise ValueError("rates must be positive")
        self.records_per_s = records_per_s
        self.bytes_per_s = bytes_per_s
        self._clock = clock
        self._sleep = sleep
        now = clock()
        # start_empty: for short-lived limiters (one per micro-batch
        # task) a fresh free burst every trigger would compound to ~2x
        # the configured envelope; long-lived limiters keep the burst
        self._rec_tokens = 0.0 if start_empty else records_per_s
        self._byte_tokens = 0.0 if start_empty else bytes_per_s
        self._last = now
        self.total_waited_s = 0.0

    def _refill(self) -> None:
        now = self._clock()
        dt = now - self._last
        self._last = now
        self._rec_tokens = min(
            self.records_per_s, self._rec_tokens + dt * self.records_per_s
        )
        self._byte_tokens = min(
            self.bytes_per_s, self._byte_tokens + dt * self.bytes_per_s
        )

    def acquire(self, n_records: int, n_bytes: int) -> float:
        """Block until the request fits; returns seconds waited.

        Requests larger than one second's budget are admitted by waiting
        for the full deficit (they cannot fit in any burst window)."""
        self._refill()
        rec_deficit = n_records - self._rec_tokens
        byte_deficit = n_bytes - self._byte_tokens
        wait = max(
            rec_deficit / self.records_per_s if rec_deficit > 0 else 0.0,
            byte_deficit / self.bytes_per_s if byte_deficit > 0 else 0.0,
        )
        if wait > 0:
            self._sleep(wait)
            self.total_waited_s += wait
            # credit exactly the slept interval WITHOUT the burst clamp:
            # re-running _refill() here capped the earned credit at one
            # second of budget, discarding the deficit payment of any
            # oversize request (measured ~44% under-delivery for 5x-budget
            # requests); the cap is re-applied after the debit below
            self._rec_tokens += wait * self.records_per_s
            self._byte_tokens += wait * self.bytes_per_s
            self._last = self._clock()
        self._rec_tokens = min(self.records_per_s, self._rec_tokens - n_records)
        self._byte_tokens = min(self.bytes_per_s, self._byte_tokens - n_bytes)
        return wait
