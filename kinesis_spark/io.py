"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free; callers select only the columns they
need and let the scan prune (verified via ``.explain`` in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DataFrame-plan memo: spark.read.parquet re-lists files and re-reads
# footers on every call (~100-300 ms per table), and queries load the
# same tables repeatedly. DataFrames are immutable logical plans, so
# reusing one is safe; keying by applicationId prevents a plan from one
# (possibly stopped) session leaking into another.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # re-pin UTC on EVERY load, not just the uncached first one: the
    # timezone conf is read at execution time, so a caller changing
    # session timeZone between loads would otherwise silently shift
    # results on a plan-cache hit. This covers ALL tables, not just
    # events — lineitem/orders store naive TIMESTAMP dates too, and the
    # oracles compare their wall-clock values verbatim (a non-UTC
    # session would shift year() buckets and date-literal filters).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    # evict plans of OTHER (stopped) applications: a process that
    # creates and stops many sessions (pytest across modules) would
    # otherwise accumulate dead plans and their JVM-side references
    # without bound
    for k in [k for k in _PLAN_CACHE if k[0] != app_id]:
        del _PLAN_CACHE[k]
    df = _load_table_uncached(spark, sf_dir, name)
    _PLAN_CACHE[key] = df
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to Spark's native TimestampType.

    Handles every encoding the driver has shipped: TIMESTAMP(NANOS) read
    as long (``nanosAsLong``), TIMESTAMP_NTZ, and plain TIMESTAMP.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # integer `div`, NOT `/`: long/int promotes to double, which
        # can't hold 1.7e18 ns exactly and rounds the microsecond.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        # NTZ -> TimestampType is wall-clock-identity under UTC.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # conf pinning (UTC, nanosAsLong) happens in load_table — the only
    # caller — unconditionally on every load; no second copy here to
    # drift from it.
    if name == "events":
        # The driver has shipped events.ts under two parquet encodings
        # across rounds: TIMESTAMP(NANOS) (which Spark's vectorized reader
        # rejects — read nanos as long, then floor to microseconds) and
        # plain TIMESTAMP(MICROS) / TIMESTAMP_NTZ. Detect from the read
        # schema and normalize both to Spark's native TimestampType so
        # every downstream query sees one shape.
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Parallelism floor for compute-heavy map stages (tokenize / hash /
    explode / pandas decode BEFORE the first shuffle).

    The local fixtures are single-row-group parquet files, so their scans
    are one task and everything up to the first Exchange serializes. A
    real lakehouse table at 100 TB has thousands of files/splits, in which
    case this is a NO-OP — the repartition only fires when the scan yields
    fewer partitions than requested (default: the session's
    defaultParallelism), so no shuffle is ever added at scale.
    """
    spark = df.sparkSession
    n = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
