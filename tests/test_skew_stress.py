"""Skew stress for the salted join (VERDICT r1 item 8): a genuinely
skewed key distribution — one key owning 90 % of the fact side — must run
within ~2x of a uniform distribution at the same row count, and salting
must not change the join's semantics.

AQE's skew-join splitting is deliberately out of the picture here: the
test forces sort-merge joins (merge hint) and the partitions are far below
the 256 MB advisory threshold AQE splits at, so an unsalted hot key really
does serialize into one task — the situation the salted operator exists
for (a key AQE can't split, kinesis_spark/skew.py).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from kinesis_spark.skew import salted_join

N_FACT = 2_000_000
N_KEYS = 1_000
SALTS = 32  # ~ local[32] parallelism; a fully-hot key spreads over all cores


def _dim(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("dk"), (F.col("id") % 7).alias("grp")
    )


def _fact_uniform(spark):
    return spark.range(N_FACT).select(
        F.pmod(F.hash("id"), F.lit(N_KEYS)).alias("k"), F.col("id").alias("rid")
    )


def _fact_skewed(spark):
    # key 0 owns 90% of rows; the rest spread uniformly
    return spark.range(N_FACT).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(N_KEYS)))
        .alias("k"),
        F.col("id").alias("rid"),
    )


def _agg_salted(fact, dim):
    # merge hint: force a shuffled sort-merge join (the 1000-row dim would
    # otherwise broadcast and hide the skew this test exists to exercise)
    j = salted_join(fact, dim.hint("merge"), "k", "dk", salt_source="rid",
                    num_salts=SALTS)
    return j.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("rid").alias("s")
    )


def _time_noop(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def test_salted_join_matches_plain_join(spark):
    """Salting is semantics-preserving on the skewed input."""
    fact, dim = _fact_skewed(spark), _dim(spark)
    got = _agg_salted(fact, dim).orderBy("grp").collect()
    want = (
        fact.join(dim.hint("merge"), fact.k == dim.dk)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("rid").alias("s"))
        .orderBy("grp")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_salted_join_skew_within_2x_of_uniform(spark):
    """The VERDICT criterion: 90%-hot key within ~2x of uniform keys.

    Both sides run the SAME salted operator, so the comparison isolates
    the key distribution. Generous 2.5x bound + best-of-2 to keep the
    assertion meaningful but not flaky on a loaded machine.
    """
    dim = _dim(spark)
    t_uniform = _time_noop(_agg_salted(_fact_uniform(spark), dim))
    t_skewed = _time_noop(_agg_salted(_fact_skewed(spark), dim))
    assert t_skewed <= max(2.5 * t_uniform, t_uniform + 1.0), (
        f"skewed {t_skewed:.2f}s vs uniform {t_uniform:.2f}s"
    )


@pytest.mark.slow
def test_unsalted_hot_key_is_actually_slower(spark):
    """Sanity that the stress is real: the same skewed input WITHOUT
    salting serializes the hot key into one sort-merge task and loses to
    the salted plan. Skipped from the hot path (timing-sensitive)."""
    dim = _dim(spark)
    fact = _fact_skewed(spark)
    plain = (
        fact.join(dim.hint("merge"), fact.k == dim.dk)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("rid").alias("s"))
    )
    t_plain = _time_noop(plain)
    t_salted = _time_noop(_agg_salted(fact, dim))
    assert t_salted <= t_plain * 1.2, (
        f"salted {t_salted:.2f}s should not lose to unsalted {t_plain:.2f}s"
    )
