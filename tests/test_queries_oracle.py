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
