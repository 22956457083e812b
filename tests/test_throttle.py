"""Per-shard rate throttle (the reference's dead constants, enforced):
token-bucket math on a virtual clock, and end-to-end through the batch
Writer."""

from __future__ import annotations

from kinesis_spark.ingest.throttle import RateLimiter
from kinesis_spark.ingest.writer import Writer


class VirtualClock:
    def __init__(self):
        self.t = 0.0

    def now(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.t += s


def _limiter(records_per_s, bytes_per_s, clock):
    return RateLimiter(
        records_per_s, bytes_per_s, clock=clock.now, sleep=clock.sleep
    )


def test_burst_then_steady_record_rate():
    clock = VirtualClock()
    rl = _limiter(records_per_s=100, bytes_per_s=10**9, clock=clock)
    assert rl.acquire(100, 100) == 0.0  # one-second burst is free
    # next 100 records must wait a full second's refill
    waited = rl.acquire(100, 100)
    assert abs(waited - 1.0) < 1e-9
    # long-run: 1000 records at 100/s ≈ 10 s
    for _ in range(10):
        rl.acquire(100, 100)
    assert 10.0 <= clock.t <= 12.0


def test_byte_rate_binds_when_stricter():
    clock = VirtualClock()
    rl = _limiter(records_per_s=10**9, bytes_per_s=1000, clock=clock)
    rl.acquire(1, 1000)  # burst
    waited = rl.acquire(1, 500)
    assert abs(waited - 0.5) < 1e-9  # 500 B at 1000 B/s


def test_oversized_request_admitted_after_full_wait():
    clock = VirtualClock()
    rl = _limiter(records_per_s=10, bytes_per_s=10**9, clock=clock)
    waited = rl.acquire(30, 1)  # 3 seconds of record budget
    assert waited >= 2.0


class CountingClient:
    def __init__(self):
        self.calls = []

    def put_records(self, stream_name, records):
        self.calls.append(len(records))
        return [{} for _ in records]


def test_writer_throttles_batches():
    clock = VirtualClock()
    rl = _limiter(records_per_s=4, bytes_per_s=10**9, clock=clock)
    client = CountingClient()
    w = Writer(client, "s", "k", record_size_limit=10, put_records_limit=2,
               throttle=rl)
    # 54 bytes → 6 chunks of 9 (chunk = 10 - len("k")) → 3 batches of 2
    w.write(b"x" * 54)
    assert client.calls == [2, 2, 2]
    # burst covers the first 4 records; the last 2 wait at 4 records/s
    assert abs(rl.total_waited_s - 0.5) < 1e-9


def test_oversized_requests_sustain_full_rate():
    """Back-to-back 5x-budget requests must deliver at the configured
    rate: the mid-transaction refill clamp used to discard the deficit
    payment and sustain only ~0.56x (5 MiB puts vs 1 MiB/s -> 9 s gaps)."""
    clock = VirtualClock()
    rl = _limiter(records_per_s=10**9, bytes_per_s=1_000_000, clock=clock)
    for _ in range(4):
        rl.acquire(1, 5_000_000)
    # 20 MB at 1 MB/s with a 1 MB initial burst: 19 s, not 9 s * 3 + 4
    assert 18.5 <= clock.t <= 19.5, clock.t


def test_start_empty_has_no_free_burst():
    clock = VirtualClock()
    rl = RateLimiter(100, 10**9, clock=clock.now, sleep=clock.sleep,
                     start_empty=True)
    waited = rl.acquire(100, 1)
    assert abs(waited - 1.0) < 1e-9  # full second for the first batch
