"""Accuracy bounds for the sketch aggregates: a8's registered form
exposes the estimates only as within-bound booleans (the driver
hash-compares those against DuckDB), so the RAW estimate accuracy is
pinned here against exact answers computed in-Spark."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.queries import get_registry

REGISTRY = get_registry()


def test_sketch_bounds(spark, sf_dir):
    from kinesis_spark.queries.aggregates import _sketch_estimates

    got = {
        r["event_type"]: r
        for r in _sketch_estimates(spark, sf_dir).collect()
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


def test_bloom_dedup_exact_under_heavy_false_positives(spark, sf_dir):
    """Force a deliberately undersized bitmap (64 bits for ~450 corpus
    keys -> every word saturates, nearly every probe is a false
    positive) and require the final answer to STILL equal the exact
    anti-join — proving the verification stage does real work rather
    than relying on the production bitmap's negligible fpp."""
    from kinesis_spark.bloom import bloom_dedup_batch, build_bloom, probe_bloom

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.sha2("text", 256).alias("content_hash")
    )
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)

    got = bloom_dedup_batch(corpus, batch, "content_hash", m_bits=64, k=2)
    want = batch.join(corpus, "content_hash", "left_anti")
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )

    # the tiny bitmap really does produce false positives (candidates
    # far exceed true dups), so the anti-join branch was exercised
    bloom = build_bloom(corpus, "content_hash", m_bits=64, k=2)
    n_candidates = (
        probe_bloom(batch, bloom, "content_hash", m_bits=64, k=2)
        .filter("maybe_member")
        .count()
    )
    n_true_dups = batch.join(corpus, "content_hash", "left_semi").count()
    assert n_candidates > n_true_dups


def test_bloom_bitmap_is_fixed_size(spark, sf_dir):
    """The bitmap relation never exceeds m_bits/64 rows regardless of
    input cardinality — the property that makes its broadcast
    constant-cost at any corpus size."""
    from kinesis_spark.bloom import build_bloom

    d = load_table(spark, sf_dir, "documents").select(
        F.sha2("text", 256).alias("content_hash")
    )
    assert build_bloom(d, "content_hash", m_bits=1 << 10, k=4).count() <= (1 << 10) // 64


def test_dense_probe_matches_relational_probe(spark, sf_dir):
    """probe_bloom_dense (row-local map lookups, no shuffle) must flag
    exactly the same rows as probe_bloom (explode+groupBy) — including
    under a deliberately tiny bitmap that forces false positives."""
    from pyspark.sql import functions as F

    from kinesis_spark.bloom import (
        build_bloom,
        densify_bloom,
        probe_bloom,
        probe_bloom_dense,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.sha2("text", 256).alias("h")
    )
    corpus = d.filter(F.col("doc_id") % 3 == 0)
    batch = d.filter(F.col("doc_id") % 3 != 0)
    for m_bits, k in ((64, 2), (1 << 16, 4)):
        bloom = build_bloom(corpus, "h", m_bits=m_bits, k=k)
        rel = {
            r["doc_id"]: r["maybe_member"]
            for r in probe_bloom(batch, bloom, "h", m_bits=m_bits, k=k).collect()
        }
        dense = {
            r["doc_id"]: r["maybe_member"]
            for r in probe_bloom_dense(
                batch, densify_bloom(bloom, m_bits), "h", m_bits=m_bits, k=k
            ).collect()
        }
        assert rel == dense


def test_j10_bloom_prefilter_sheds_rows(spark, sf_dir):
    """The j10 prefilter must admit every true match (no false
    negatives — guaranteed by construction, asserted anyway) while
    shedding a meaningful share of non-matching fact rows."""
    from pyspark.sql import functions as F

    from kinesis_spark.bloom import build_bloom, densify_bloom, probe_bloom_dense
    from kinesis_spark.io import load_table

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    dense = densify_bloom(build_bloom(o, "o_orderkey"))
    probed = probe_bloom_dense(l, dense, "l_orderkey")
    kept = probed.filter("maybe_member").count()
    total = probed.count()
    true_matches = l.join(o, l.l_orderkey == o.o_orderkey, "left_semi").count()
    assert kept >= true_matches          # no false negatives
    assert kept < total                  # the filter actually sheds rows


def test_probe_bloom_preserves_duplicate_rows(spark):
    """probe_bloom must be row-preserving: two fully-identical input
    rows (no unique id column) stay two rows — the explode/regroup
    round trip keys on an internal uid, not the visible columns."""
    from kinesis_spark.bloom import build_bloom, probe_bloom

    corpus = spark.createDataFrame([("a",), ("b",)], "key string")
    batch = spark.createDataFrame([("a",), ("a",), ("z",)], "key string")
    bloom = build_bloom(corpus, "key")
    probed = probe_bloom(batch, bloom, "key")
    rows = sorted((r["key"], r["maybe_member"]) for r in probed.collect())
    assert rows.count(("a", True)) == 2
    assert ("z", False) in rows
    assert len(rows) == 3


def test_theta_sketch_above_threshold_bounds(spark):
    """a14's sketches leave exact mode above ~4096 distinct keys; the
    estimate error must stay within the published ±~1.6% (3-sigma ~5%)
    envelope, and the set algebra must stay consistent."""
    from pyspark.sql import functions as F

    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 2 == 0).alias("even"), F.col("id").alias("uid")
    )
    sk = df.groupBy("even").agg(F.theta_sketch_agg("uid").alias("sk"))
    a = sk.filter("even").select(F.col("sk").alias("sk_a"))
    b = sk.filter("NOT even").select(F.col("sk").alias("sk_b"))
    row = (
        a.crossJoin(b)
        .select(
            F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias("u"),
            F.theta_sketch_estimate(
                F.theta_intersection("sk_a", "sk_b")
            ).alias("i"),
        )
        .collect()[0]
    )
    assert abs(row["u"] - n) / n < 0.05
    # disjoint halves: intersection estimate must be ~0 relative to n
    assert row["i"] / n < 0.01


def test_a14_emits_all_pairs_when_segment_missing(spark, tmp_path):
    """A pair whose segment has no events still emits a row with
    empty-set semantics (union=|other|, intersect=0, only_a=0) — the
    oracle always returns all three pairs."""
    import datetime

    from pyspark.sql import functions as F

    from kinesis_spark.queries import get_registry

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "click", 0.0, "{}"),
        (2, t0, 11, "click", 0.0, "{}"),
        (3, t0, 10, "purchase", 0.0, "{}"),
        (4, t0, 12, "error", 0.0, "{}"),   # no 'signup', no 'view'
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    got = {
        (r["seg_a"], r["seg_b"]): r
        for r in get_registry()["a14_theta_segment_algebra"]
        .spark_fn(spark, d)
        .collect()
    }
    assert len(got) == 3
    r = got[("signup", "error")]  # signup absent entirely
    assert (r["union_users"], r["intersect_users"], r["only_a_users"]) == (1, 0, 0)
    r = got[("view", "click")]  # view absent
    assert (r["union_users"], r["intersect_users"], r["only_a_users"]) == (2, 0, 0)
    r = got[("click", "purchase")]
    assert (r["union_users"], r["intersect_users"], r["only_a_users"]) == (2, 1, 1)
