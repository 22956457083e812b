"""BufferedWriter / DropWriter / composition tests — the stages the
reference leaves untested (SURVEY.md §5 "not covered").
"""

from __future__ import annotations

import threading
import time

from kinesis_spark.ingest.buffered import BufferedWriter
from kinesis_spark.ingest.drop import DropWriter
from kinesis_spark.ingest.pipeline import new_fast_writer
from tests.test_golden_ingest import FakeClient


class SinkSpy:
    def __init__(self, delay_s: float = 0.0, fail: bool = False):
        self.writes: list[bytes] = []
        self.delay_s = delay_s
        self.fail = fail
        self.event = threading.Event()

    def write(self, payload: bytes) -> int:
        if self.delay_s:
            time.sleep(self.delay_s)
        if self.fail:
            raise RuntimeError("sink down")
        self.writes.append(payload)
        self.event.set()
        return len(payload)


def test_buffered_flushes_on_size():
    s = SinkSpy()
    b = BufferedWriter(s, size=8, flush_period_s=0)  # no ticker
    b.write(b"1234")
    assert s.writes == []  # below threshold, buffered
    b.write(b"5678")
    assert s.writes == [b"12345678"]  # size-triggered flush


def test_buffered_flushes_on_time():
    s = SinkSpy()
    b = BufferedWriter(s, size=1 << 20, flush_period_s=0.05)
    b.write(b"tick")
    assert s.event.wait(2.0), "periodic flush never fired"
    assert s.writes == [b"tick"]
    b.close()


def test_buffered_close_drains_tail():
    s = SinkSpy()
    b = BufferedWriter(s, size=1 << 20, flush_period_s=0)
    b.write(b"tail")
    b.close()
    assert s.writes == [b"tail"]


def test_drop_writer_passes_through_and_drains():
    s = SinkSpy()
    d = DropWriter(s, queue_depth=4)
    for i in range(3):
        d.write(bytes([i]))
    d.close()
    assert b"".join(s.writes) == b"\x00\x01\x02"
    assert d.dropped_writes == 0


def test_drop_writer_sheds_when_full():
    s = SinkSpy(delay_s=0.2)  # slow sink → queue backs up
    drops: list[int] = []
    d = DropWriter(s, queue_depth=1, on_drop=lambda p: drops.append(len(p)))
    for _ in range(20):
        n = d.write(b"x" * 10)
        assert n == 10  # reference parity: caller always sees success
    assert d.dropped_writes > 0
    assert d.dropped_bytes == 10 * d.dropped_writes
    assert len(drops) == d.dropped_writes
    d.close()


def test_drop_writer_latches_sink_error():
    import pytest

    s = SinkSpy(fail=True)
    d = DropWriter(s, queue_depth=4)
    d.write(b"boom")
    time.sleep(0.2)  # let the consumer hit the error
    with pytest.raises(RuntimeError, match="sink down"):
        for _ in range(10):
            d.write(b"after")
            time.sleep(0.05)


def test_fast_writer_composition_end_to_end():
    client = FakeClient()
    head, drop = new_fast_writer(client, "stream", "pk", flush_period_s=0.05)
    head.write(b"hello world")
    deadline = time.time() + 3
    while not client.calls and time.time() < deadline:
        time.sleep(0.02)
    head.close()
    drop.close()
    assert client.calls, "payload never reached the sink"
    stream, records = client.calls[0]
    assert stream == "stream"
    assert b"".join(r.data for r in records) == b"hello world"
    assert all(r.partition_key == "pk" for r in records)
    assert drop.dropped_writes == 0
