"""Shared-pin lifecycle (VERDICT r7 task 4): queries that persist an
internal relation register it with kinesis_spark.pins, so a session
running the catalog repeatedly can release them between passes instead
of accumulating pinned blocks that compete with shuffle memory."""

from __future__ import annotations

from kinesis_spark.pins import _SHARED_PINS, release_shared_pins

# the query-side pin sites named in VERDICT r7 "What's wrong" #3 —
# one representative per family keeps the test minutes-cheap while
# exercising persist-at-construction (MLlib fit), persist-consumed-by-
# returned-plan (d18), and the persist=True seam (mm9 keys)
PINNING = [
    "d18_dup_span_excision",
    "mm9_clip_fingerprint_match",
    "sim15_centroid_outliers",
    "d8_minhash_lsh_mllib",
]


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_catalog_pass_releases_all_pins(spark, sf_dir):
    """Two passes over the pinning queries with release between: the
    registry empties and the JVM's persistent-RDD table returns to its
    pre-pass level each time — no growth pass over pass."""
    from kinesis_spark.queries import get_registry

    reg = get_registry()
    release_shared_pins()
    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    counts = []
    for _ in range(2):
        for name in PINNING:
            reg[name].spark_fn(spark, sf_dir).count()
        assert _SHARED_PINS, "pinning queries must register their pins"
        released = release_shared_pins()
        assert released >= len(PINNING) - 1  # mm9 may pin once per call
        assert not _SHARED_PINS
        counts.append(_persistent_rdd_count(spark))
    assert counts[0] == counts[1] <= baseline + 1, (baseline, counts)


def test_release_is_safe_without_pins():
    assert release_shared_pins() == 0
