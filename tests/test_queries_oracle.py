"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (fast inner loop; the driver runs the same comparison at sf0.01).
"""

from __future__ import annotations

import pytest

from kinesis_spark.queries import get_registry
from tests.oracle_utils import compare, run_oracle

REGISTRY = get_registry()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    got = q.spark_fn(spark, sf_dir)
    want = run_oracle(q.oracle, sf_dir)
    compare(got, want, name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_s14_no_near_dup_pair_straddles_splits(spark, sf_dir):
    """The property s14 exists for: every MinHash candidate pair (d3)
    lands in ONE split — zero train/test leakage through near-dups."""
    from kinesis_spark.queries.dedup import d3_minhash_lsh_pairs

    split_of = {
        r.doc_id: r.split
        for r in REGISTRY["s14_leakage_free_split"].spark_fn(spark, sf_dir).collect()
    }
    pairs = d3_minhash_lsh_pairs(spark, sf_dir).collect()
    assert pairs, "fixture should contain near-dup candidates"
    for p in pairs:
        assert split_of[p.doc_a] == split_of[p.doc_b], (p.doc_a, p.doc_b)


def test_w8_fixture_timestamps_are_midnight_only(spark, sf_dir):
    """w8's RANGE frame keys on unix_date over the DATE part of
    o_orderdate (timezone-proof day arithmetic). That is lossless vs the
    oracle's second-granularity INTERVAL 30 DAY frame only while the
    fixture timestamps carry no time-of-day — pin that precondition."""
    from pyspark.sql import functions as F

    from kinesis_spark.io import load_table

    o = load_table(spark, sf_dir, "orders")
    n = o.filter(
        F.col("o_orderdate") != F.date_trunc("day", F.col("o_orderdate"))
    ).count()
    assert n == 0
