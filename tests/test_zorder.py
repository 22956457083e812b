"""Z-order clustering: predicates on EITHER dimension overlap far fewer
files than a linear sort gives the second dimension."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kinesis_spark.export import sorted_export
from kinesis_spark.io import load_table
from kinesis_spark.zorder import zorder_export

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    linear = str(base / "linear")
    zed = str(base / "zed")
    sorted_export(li, ["l_partkey"], linear, n_files=N_FILES)
    zorder_export(li, "l_partkey", "l_suppkey", zed, n_files=N_FILES)
    return linear, zed


def _overlapping_files(d, col, lo, hi):
    n = 0
    for f in glob.glob(os.path.join(d, "part-*.parquet")):
        t = pq.read_table(f, columns=[col])
        vals = t.column(col).to_pylist()
        if vals and min(vals) <= hi and max(vals) >= lo:
            n += 1
    return n


def test_zorder_prunes_both_dimensions(spark, layouts):
    linear, zed = layouts
    # narrow band on the SECOND dimension: linear layout can't prune it
    li = spark.read.parquet(linear)
    smax = li.agg(F.max("l_suppkey")).first()[0]
    lo, hi = 1, max(2, smax // 10)

    linear_overlap = _overlapping_files(linear, "l_suppkey", lo, hi)
    z_overlap = _overlapping_files(zed, "l_suppkey", lo, hi)
    assert linear_overlap >= N_FILES * 3 // 4  # linear: nearly every file
    assert z_overlap <= linear_overlap // 2  # z-order: at least 2x pruning

    # and the FIRST dimension still prunes well under z-order
    pmax = li.agg(F.max("l_partkey")).first()[0]
    z_first = _overlapping_files(zed, "l_partkey", 1, max(2, pmax // 10))
    assert z_first <= N_FILES // 2


def test_zorder_preserves_content(spark, sf_dir, layouts):
    _, zed = layouts
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    back = spark.read.parquet(zed)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0


def test_morton_interleave_is_bijective():
    """Pure-python mirror of the interleave: distinct (a, b) pairs map to
    distinct keys and the key decodes back (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def interleave(a, b, bits=16):
        k = 0
        for i in range(bits):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    def deinterleave(k, bits=16):
        a = b = 0
        for i in range(bits):
            a |= ((k >> (2 * i)) & 1) << i
            b |= ((k >> (2 * i + 1)) & 1) << i
        return a, b

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=(1 << 16) - 1),
        st.integers(min_value=0, max_value=(1 << 16) - 1),
    )
    def check(a, b):
        assert deinterleave(interleave(a, b)) == (a, b)

    check()


def test_spark_interleave_matches_python(spark):
    """The Spark column expression computes the same Morton keys as the
    reference python bit-twiddling."""
    from kinesis_spark.zorder import _interleave
    from pyspark.sql import functions as F

    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1024, 65535)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", _interleave(F.col("a"), F.col("b"), 16)
    )

    def interleave(a, b, bits=16):
        k = 0
        for i in range(bits):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    for r in df.collect():
        assert r["z"] == interleave(r["a"], r["b"]), (r["a"], r["b"])


def test_nan_rows_do_not_crash_or_poison_bounds(spark, tmp_path):
    """Under ANSI mode round(NaN).cast('bigint') throws; one NaN row
    must map to a stable grid corner instead of killing the export, and
    NaN must not become vmax (which would collapse the whole grid)."""
    df = spark.createDataFrame(
        [(float("nan"), 1.0), (10.0, 2.0), (20.0, 3.0), (30.0, float("nan"))],
        "a double, b double",
    )
    out = str(tmp_path / "z")
    zorder_export(df, "a", "b", out, n_files=2)
    back = spark.read.parquet(out)
    assert back.count() == 4  # every row written, NaN rows included
