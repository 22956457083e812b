"""Session-scoped shared-subtree pins (VERDICT r7 task 4).

Several queries persist an intermediate relation that the returned plan
consumes more than once (d18's positional tokens, mm9's fingerprint
keys, the MLlib LSH feature vectors, sim6/sim13's IVF assignment,
sim15's distance relation, p9's batch tokens). The persist is load-
bearing — without it each consumer replays the subtree — but the query
function cannot know when its caller is done with the result, so it
cannot unpersist. Left alone, a long-lived session running the catalog
repeatedly accumulates pinned blocks that compete with shuffle memory.

``pin_shared`` registers every such pin; ``release_shared_pins`` lets
the CONSUMER (bench.py, verify sweeps, the scale harness, the
``__spark_entry__`` driver adapter, any production driver loop) drop
them all once the results are materialized.
``spark.catalog.clearCache()`` would also evict them, but it is a
sledgehammer (it clears every cached relation in the session, including
caches the caller owns); the registry releases exactly what the queries
pinned.

Thread safety (ADVICE r8): the registry is guarded by a lock —
concurrent registrations (streaming micro-batches call
``pin_shared`` from foreachBatch worker threads, e.g. p9's incremental
span excision) and a concurrent ``release_shared_pins`` each see a
consistent list. The lock serializes REGISTRY mutation only, not the
unpersist calls; release snapshots the list and drains outside any
job's critical path. The documented contract stays single-consumer:
call ``release_shared_pins`` between materializations, not while a job
that still needs the pinned relation is mid-flight.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_SHARED_PINS: list[DataFrame] = []
_LOCK = threading.Lock()


def pin_shared(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_shared_pins`."""
    df.persist()
    with _LOCK:
        _SHARED_PINS.append(df)
    return df


def pinned_count() -> int:
    """How many shared pins are currently registered (observability for
    long-lived consumers deciding when to drain)."""
    with _LOCK:
        return len(_SHARED_PINS)


def release_shared_pins(blocking: bool = True) -> int:
    """Unpersist every registered pin (newest first); returns how many
    were released. Blocking by default so callers (and tests) observe a
    deterministic storage state. Safe to call with no live session —
    a dead pin is skipped, never raised."""
    with _LOCK:
        drained = list(_SHARED_PINS)
        _SHARED_PINS.clear()
    n = 0
    for df in reversed(drained):
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # noqa: BLE001 - session already stopped
            pass
    return n
