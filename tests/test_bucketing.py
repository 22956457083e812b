"""Bucketed co-located joins: both fact tables bucketed by the join key
must join with zero Exchange nodes, and the result must equal the plain
shuffle join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kinesis_spark.bucketing import bucketed_join, write_bucketed
from kinesis_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(l, "li_b", ["l_orderkey"], 8, path=str(base / "li"))
    write_bucketed(o, "or_b", ["l_orderkey"], 8, path=str(base / "or"))
    yield "li_b", "or_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS or_b")


def _physical(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li, orb = bucketed_tables
    joined = bucketed_join(spark, li, orb, on=["l_orderkey"], hint="merge")
    plan = _physical(joined)
    assert not re.search(r"\(\d+\) Exchange", plan), plan
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_bucketed_join_matches_shuffle_join(spark, sf_dir, bucketed_tables):
    li, orb = bucketed_tables
    got = bucketed_join(spark, li, orb, on=["l_orderkey"], hint="merge").count()
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert got == want


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    li, _ = bucketed_tables
    agg = spark.table(li).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = _physical(agg)
    assert not re.search(r"\(\d+\) Exchange", plan), plan
