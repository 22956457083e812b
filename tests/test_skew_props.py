"""Property test: salted_join is semantics-preserving for ANY key
distribution, salt factor, and join type the operator supports."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_spark.skew import salted_join


@st.composite
def _tables(draw):
    n_fact = draw(st.integers(min_value=0, max_value=60))
    keys = draw(st.lists(st.integers(min_value=0, max_value=5),
                         min_size=n_fact, max_size=n_fact))
    dim_keys = draw(st.sets(st.integers(min_value=0, max_value=7), max_size=8))
    salts = draw(st.integers(min_value=1, max_value=5))
    return keys, sorted(dim_keys), salts


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_tables())
def test_salted_join_equals_plain_join(spark, tables):
    keys, dim_keys, salts = tables
    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)] or [(None, None)], "rid long, k long"
    ).filter(F.col("rid").isNotNull())
    dim = spark.createDataFrame(
        [(k, k * 10) for k in dim_keys] or [(None, None)], "dk long, v long"
    ).filter(F.col("dk").isNotNull())
    got = sorted(
        (r["rid"], r["k"], r["v"])
        for r in salted_join(fact, dim, "k", "dk", salt_source="rid",
                             num_salts=salts).collect()
    )
    want = sorted(
        (r["rid"], r["k"], r["v"])
        for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    assert got == want


def test_salted_join_rejects_outer_dim_side(spark):
    import pytest as _pytest

    from kinesis_spark.skew import salted_join

    fact = spark.createDataFrame([(1, 10)], "k BIGINT, rid BIGINT")
    dim = spark.createDataFrame([(1, "a")], "dk BIGINT, attr STRING")
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="inner/left"):
            salted_join(fact, dim, "k", "dk", "rid", how=how)


def test_salted_join_same_key_name_unambiguous(spark):
    from kinesis_spark.skew import salted_join

    fact = spark.createDataFrame([(1, 10), (1, 11), (2, 12)], "k BIGINT, rid BIGINT")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, attr STRING")
    out = salted_join(fact, dim, "k", "k", "rid", num_salts=4)
    assert out.columns.count("k") == 1  # dim's copy dropped, like on='k'
    got = sorted((r.k, r.rid, r.attr) for r in out.collect())
    assert got == [(1, 10, "a"), (1, 11, "a"), (2, 12, "b")]


def test_salted_left_join_preserves_unmatched_facts_once(spark):
    from kinesis_spark.skew import salted_join

    fact = spark.createDataFrame([(1, 10), (3, 13)], "k BIGINT, rid BIGINT")
    dim = spark.createDataFrame([(1, "a")], "dk BIGINT, attr STRING")
    got = sorted(
        (r.k, r.rid, r.attr)
        for r in salted_join(fact, dim, "k", "dk", "rid", how="left").collect()
    )
    assert got == [(1, 10, "a"), (3, 13, None)]  # one row per fact, exactly
