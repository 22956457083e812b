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
        self._err: BaseException | None = None  # sticky, like Go's bufio
        if flush_period_s > 0:
            self._ticker = threading.Thread(target=self._tick, daemon=True)
            self._ticker.start()

    def _check_err(self) -> None:
        if self._err is not None:
            raise self._err

    def write(self, payload: bytes) -> int:
        """Append; a full buffer flushes synchronously (bufio semantics)."""
        with self._lock:
            self._check_err()
            self._buf.extend(payload)
            if len(self._buf) >= self._size:
                self._flush_locked()
        return len(payload)

    def flush(self) -> None:
        with self._lock:
            self._check_err()
            self._flush_locked()

    def close(self) -> None:
        """Final drain (reference: signal → stream.Flush(), main.go:48-51)."""
        self._closed.set()
        self.flush()

    def _flush_locked(self) -> None:
        if self._buf:
            # sink write FIRST: a failed flush keeps the bytes buffered
            # for the next attempt instead of silently losing them
            # (at-least-once — a partially-delivered flush re-sends)
            data = bytes(self._buf)
            self._sink.write(data)
            self._buf = bytearray()

    def _tick(self) -> None:
        while not self._closed.wait(self._period):
            try:
                self.flush()
            except BaseException as exc:
                # latch instead of dying: the next write()/flush()/close()
                # raises the sticky error (bufio parity); an unguarded
                # raise here would kill the timer thread and silently
                # disable time-based flushing forever
                if self._err is None:
                    self._err = exc
