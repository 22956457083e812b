"""Accuracy bounds for the sketch aggregates (a8): the driver's check
for oracle-less queries is rows-only, so the real guarantees are pinned
here against exact answers computed in-Spark."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.queries import get_registry

REGISTRY = get_registry()


def test_sketch_bounds(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in REGISTRY["a8_sketch_aggregates"].spark_fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5D)").alias("p50"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, g in got.items():
        e = exact[et]
        assert g["n_events"] == e["n"]  # plain count rides along exactly
        # HLL++ at rsd=0.02: allow 5x the nominal rsd for small groups
        assert abs(g["approx_users"] - e["users"]) <= max(2, 0.10 * e["users"])
        # percentile_approx with accuracy 10000 on ~thousands of rows is
        # near-exact; the observed value must be a real data value near p50
        assert abs(g["approx_p50"] - e["p50"]) <= 0.05 * max(1.0, abs(e["p50"]))
