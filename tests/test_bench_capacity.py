"""bench.capacity_check (VERDICT r9 task 8): the i5 throttle projection
exercised as an assertion, not just rendered — envelope invariants on
the registered query's rows plus a shard-count projection of measured
soak rates."""

from __future__ import annotations

import pytest


def _soak(kib_per_s: float, records_put: int, seconds: float = 12.0) -> dict:
    return {
        "kib_per_s": kib_per_s,
        "records_put": records_put,
        "seconds": seconds,
        "rows_dropped": 0,
        "put_calls": 12,
    }


def test_capacity_check_green_on_fixture(spark, sf_dir):
    import bench

    out = bench.capacity_check(
        spark,
        sf_dir,
        {
            "soak": _soak(99.8, 1200),  # the reference bench envelope
            "headroom": _soak(4089.6, 6144),  # ~4 MiB/s per-writer ceiling
        },
    )
    assert out["ok"] is True
    assert out["i5_keys"] > 0
    # 4 MiB/s against the 1 MiB/s/shard service limit needs 4 shards;
    # the 100 KiB/s reference load fits one
    assert out["soak_min_shards"] == 1
    assert out["headroom_min_shards"] == 4


def test_capacity_check_catches_broken_projection(spark, sf_dir):
    """The envelope invariants are a real tripwire: an i5 whose
    min_shards column under-projects (zero shards cannot cover any
    positive projected rate, at any SF) must fail the check."""
    import dataclasses

    import bench
    from kinesis_spark.queries import REGISTRY, get_registry

    real = get_registry()["i5_shard_throttle_projection"]

    def broken(s, d):
        from pyspark.sql import functions as F

        return real.spark_fn(s, d).withColumn(
            "min_shards", F.lit(0).cast("bigint")
        )

    REGISTRY["i5_shard_throttle_projection"] = dataclasses.replace(
        real, spark_fn=broken
    )
    try:
        with pytest.raises(AssertionError):
            bench.capacity_check(spark, sf_dir, {})
    finally:
        REGISTRY["i5_shard_throttle_projection"] = real
