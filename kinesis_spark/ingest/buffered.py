"""Size-or-time micro-batcher (reference BufferedWriter parity).

Reference: a mutex-guarded 4 MB ``bufio.Writer`` plus a goroutine that
flushes every 1 s (kinesis/kinesis.go:64-103) — data leaves on
``min(buffer full, flush period)``. Here: a bytearray + ``threading.Lock``
+ a daemon timer thread. Used by the CLI/library path; the Structured
Streaming path gets the same policy from
``trigger(processingTime="1 second")`` + per-trigger admission instead.
"""

from __future__ import annotations

import threading


class BufferedWriter:
    def __init__(self, sink, size: int, flush_period_s: float) -> None:
        if size <= 0:
            raise ValueError("buffer size must be positive")
        self._sink = sink
        self._size = size
        self._buf = bytearray()
        self._lock = threading.Lock()
        self._closed = threading.Event()
        self._period = flush_period_s
        if flush_period_s > 0:
            self._ticker = threading.Thread(target=self._tick, daemon=True)
            self._ticker.start()

    def write(self, payload: bytes) -> int:
        """Append; a full buffer flushes synchronously (bufio semantics)."""
        with self._lock:
            self._buf.extend(payload)
            if len(self._buf) >= self._size:
                self._flush_locked()
        return len(payload)

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def close(self) -> None:
        """Final drain (reference: signal → stream.Flush(), main.go:48-51)."""
        self._closed.set()
        self.flush()

    def _flush_locked(self) -> None:
        if self._buf:
            data, self._buf = bytes(self._buf), bytearray()
            self._sink.write(data)

    def _tick(self) -> None:
        while not self._closed.wait(self._period):
            self.flush()
