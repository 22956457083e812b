"""Load-shedding valve (reference DropWriter parity).

Reference (kinesis/kinesis.go:105-155): a bounded channel of 4 pending
writes drained by one consumer goroutine; when full, the write is DROPPED,
the ``Dropped`` callback fires, and the caller still sees success. The
first downstream error is latched and returned to all future writes.

Differences we keep vs. fix:
- kept: non-blocking enqueue, drop-on-full, pluggable ``on_drop`` hook
  (mirrors the package-level ``Dropped`` var, kinesis/kinesis.go:151-155)
- kept: sticky error latch (kinesis/kinesis.go:128-133,137-140)
- fixed: drops are counted (``dropped_bytes``/``dropped_writes``) so the
  streaming layer can surface them as first-class metrics instead of a
  stderr log line (SURVEY.md §4 quirk 4).
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Callable


def _default_on_drop(payload: bytes) -> None:
    import sys

    print(f"dropping {len(payload)} bytes", file=sys.stderr)


class DropWriter:
    def __init__(
        self,
        sink,
        queue_depth: int,
        on_drop: Callable[[bytes], None] = _default_on_drop,
    ) -> None:
        self._sink = sink
        self._q: queue.Queue[bytes | None] = queue.Queue(maxsize=queue_depth)
        self._on_drop = on_drop
        self._err: BaseException | None = None
        self._err_lock = threading.Lock()
        self._closing = False
        self.dropped_bytes = 0
        self.dropped_writes = 0
        self._consumer = threading.Thread(target=self._consume, daemon=True)
        self._consumer.start()

    def write(self, payload: bytes) -> int:
        if self._closing:
            # enqueueing behind the shutdown sentinel would strand the
            # payload unconsumed while still reporting success
            raise ValueError("write to a closed DropWriter")
        with self._err_lock:
            if self._err is not None:
                raise self._err
        try:
            self._q.put_nowait(payload)
        except queue.Full:
            self.dropped_bytes += len(payload)
            self.dropped_writes += 1
            self._on_drop(payload)
        # reference parity: caller sees success even on drop
        # (kinesis/kinesis.go:142-148)
        return len(payload)

    def close(self) -> None:
        """Drain the queue, stop the consumer, and SURFACE the latched
        error: the final drain is exactly when a swallowed failure means
        'exit 0 with data undelivered'."""
        self._closing = True
        self._q.put(None)
        self._consumer.join(timeout=30)
        if self._consumer.is_alive():
            raise RuntimeError(
                "DropWriter drain timed out with items still queued"
            )
        with self._err_lock:
            if self._err is not None:
                raise self._err

    def _consume(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                self._sink.write(item)
            except BaseException as exc:  # latch first error
                with self._err_lock:
                    if self._err is None:
                        self._err = exc
