"""SparkSession factory tuned for the driver harness (local[32], 128 GiB)
but configured the way a 1000-executor cluster run would be: AQE on
(runtime coalesce + skew-join handling), Arrow for any Pandas exchange,
explicit shuffle-partition sizing, and a realistic broadcast threshold so
dimension tables (region/nation/supplier/part at these SFs) broadcast
instead of shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def _cpus() -> int:
    # read at CALL time, not import time: the master local[N] below reads
    # the same variable, and a split read would desynchronize shuffle
    # partitions from core count
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


DEFAULT_SHUFFLE_PARTITIONS = _cpus()  # back-compat alias (import-time snapshot)


def get_spark(app_name: str = "kinesis_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Every knob here is a public Spark conf; nothing is harness-specific:

    - AQE + skew join + partition coalescing: lets the runtime re-plan
      shuffles at 100 TB where static planning guesses wrong.
    - ``spark.sql.shuffle.partitions``: sized to cores locally; on a real
      cluster this is overridden by AQE coalescing anyway.
    - Arrow enabled: all Pandas-UDF paths are vectorized batch transfers.
    - Broadcast threshold 64 MB: TPC-H dims broadcast; fact-fact joins shuffle.
    """
    # Executor Python workers inherit PYTHONPATH (not the driver's sys.path
    # mutations); put the repo root there so closures that reference this
    # package by module unpickle on workers. Must happen before JVM start.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )

    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # default 100 drops wide plans out of whole-stage codegen; the
        # engine's wide aggregates (60-bit simhash votes, 16-bin
        # histograms) are 2.5x slower interpreted (measured at sf0.1)
        .config("spark.sql.codegen.maxFields", "400")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
