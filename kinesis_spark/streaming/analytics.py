"""Event-time streaming analytics over the ``events`` stream: watermarks,
tumbling/sliding/session windows, watermarked dedup, and a custom
stateful operator (``applyInPandasWithState``).

The reference's only notion of time is a wall-clock flush tick
(kinesis/kinesis.go:85-89); this module is the event-time layer the
rubric adds on top. Every transform here takes a DataFrame that may be
batch OR streaming — the logical plan is identical, which is how the
tests verify streaming results: run the same function both ways and
compare (batch/streaming parity is Structured Streaming's core
guarantee).

Scale notes:
- Watermarks bound state: a 1000-executor job holds only the open
  windows inside the lateness horizon, not all history.
- Windowed aggregation partial-aggregates map-side before the shuffle
  on (window, key).
- The stateful op keys state by user_id — state is partition-local,
  sized by |active users within the watermark|, never global.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def stream_events(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """events as a streaming DataFrame from a parquet path (file source).

    ``maxFilesPerTrigger`` is the admission knob (the streaming analogue
    of the reference's 4 MB buffer): it caps per-micro-batch input so a
    backlog replays in bounded batches instead of one giant one.

    Streaming file sources need an explicit schema; probe it with a batch
    read of the same path so whichever ts encoding the fixtures use
    (TIMESTAMP(NANOS)-as-long or TIMESTAMP(_NTZ)) is picked up, then
    normalize to TimestampType exactly as the batch loader does.
    """
    from kinesis_spark.io import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_events_ts(reader.load(path))


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling event-time window counts per event_type. Late rows beyond
    the watermark are dropped; state for closed windows is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def sliding_value_sum(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding event-time windows: each row lands in width/slide windows;
    the sum is decimal-exact so batch and streaming agree bitwise."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Gap-based sessionization per user via ``session_window`` — the
    built-in merging-window state store op (no custom state code)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once by event_id within the lateness horizon:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only until
    the watermark passes it — bounded state, unlike a global distinct."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


RUNNING_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)
RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_totals_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """Custom stateful op: running (count, sum(value)) per user across
    micro-batches. Pure pandas inside; Arrow batches in and out."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``applyInPandasWithState`` — the
    escape hatch for stateful logic the built-in operators can't express
    (here deliberately simple so tests can oracle it against batch)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def running_counts_tws(events: DataFrame) -> DataFrame:
    """Per-user running event counts via ``transformWithStateInPandas``
    — Spark 4's arbitrary-state API (typed state handles, timers), the
    successor to ``applyInPandasWithState``. Same semantics as
    running_user_totals' count so the two stateful APIs cross-check.

    The processor class is defined inside this function so cloudpickle
    ships it by value (no module import needed on workers).

    Requires the ``protobuf`` package (the state-server protocol), which
    this container does not bundle — gated with a clear error; the
    applyInPandasWithState path (running_user_totals) is the supported
    stateful operator here."""
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package, which "
            "is not installed; use running_user_totals "
            "(applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield _pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningCount(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def click_purchase_join(
    events: DataFrame, watermark: str = "1 hour", within_minutes: int = 30
) -> DataFrame:
    """Stream-stream inner join: each purchase paired with every click by
    the same user in the preceding ``within_minutes``. Both sides carry
    watermarks and the join has a time-range bound, so state eviction is
    provable — without the bound, stream-stream join state grows forever.
    Works identically on batch input (parity-tested)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return purchases.join(clicks, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def click_purchase_left_outer(
    events: DataFrame, watermark: str = "1 hour", within_minutes: int = 30
) -> DataFrame:
    """Left-OUTER stream-stream join: every click, paired with the
    purchases it led to within ``within_minutes`` — or with nulls once
    the watermark proves no purchase can still arrive (the abandoned-
    funnel feed). The null rows are what distinguishes this from
    ``click_purchase_join``: they can only be emitted when event time
    has provably passed click_ts + within + watermark, which is why both
    sides must carry watermarks and the join condition must bound
    purchase_ts relative to click_ts. Works identically on batch input
    up to watermark closure (parity-tested on the closed region)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")
        )
    )
    return clicks.join(purchases, cond, "leftOuter").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )


def segment_window_counts(
    events: DataFrame,
    customer: DataFrame,
    width: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each event is
    enriched with its customer's market segment via a BROADCAST join
    against the static dimension (re-planned per micro-batch, so a
    refreshed dim table is picked up without restarting the query), then
    counted per (tumbling window, segment).

    This is the canonical production streaming join: stateless (no join
    state to watermark — only the aggregation holds state), dim-side
    broadcast so the stream never shuffles before the aggregate. Events
    with no matching customer keep a NULL segment (left join) — dropped
    rows would be silent data loss.
    """
    dim = customer.select(
        F.col("c_custkey").alias("_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(dim), F.col("user_id") == F.col("_custkey"), "left")
        .groupBy(F.window("ts", width).alias("w"), "segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "segment",
            "n_events",
        )
    )


def run_to_completion(
    df: DataFrame,
    output_mode: str,
    query_name: str,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Drain a streaming DataFrame with ``availableNow`` into a memory
    sink and return the result as a batch DataFrame (test/drive helper;
    production uses a real sink + continuous trigger)."""
    query = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = query.awaitTermination(timeout_s)
        if not finished:
            # a slow drain must be a LOUD timeout, not a silently
            # truncated memory table handed to an oracle comparison
            raise TimeoutError(
                f"streaming query {query_name!r} did not drain within "
                f"{timeout_s}s"
            )
    finally:
        query.stop()
    return df.sparkSession.table(query_name)
