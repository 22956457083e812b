"""Persisted prep index (prep_index.py): the indexed batch admission
produces p3's exact report while reading ONLY the batch + the index
(plan-asserted zero corpus scans), and the bitmap rebuilds from the
hash store alone."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.prep_index import build_prep_index, incremental_prep_indexed
from kinesis_spark.queries import get_registry


def test_indexed_report_equals_p3_with_zero_corpus_scans(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    corpus_docs = d.filter(F.col("doc_id") % 10 != 0)  # p3's split
    batch_docs = d.filter(F.col("doc_id") % 10 == 0)
    idx = str(tmp_path / "prep_index")
    stats = build_prep_index(spark, corpus_docs, idx)
    assert stats["hashes"] > 0 and stats["bands"] > 0
    assert stats["bloom_words"] == 1  # the dense single-row bitmap

    # the incremental contract: the batch is its OWN storage (a new
    # crawl drop), not a re-slice of the corpus table
    batch_path = str(tmp_path / "batch")
    batch_docs.write.parquet(batch_path)
    batch = spark.read.parquet(batch_path)

    got = incremental_prep_indexed(spark, batch, idx)

    # zero corpus scans, plan-asserted: every file the plan reads is the
    # batch drop or an index relation — the documents table appears
    # nowhere (p3 scans it three times for the same answer)
    files = got.inputFiles()
    assert files
    tmp = str(tmp_path)
    assert all(tmp in f for f in files), [f for f in files if tmp not in f][:3]
    assert not any("documents" in f for f in files)
    kinds = {"/prep_index/" in f or "/batch" in f for f in files}
    assert kinds == {True}

    p3 = get_registry()["p3_incremental_prep"].spark_fn(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, p3.collect()))


def test_duplicate_store_hashes_do_not_fan_out_report(spark, sf_dir, tmp_path):
    """intake.py's crash-redo path legitimately re-appends admitted
    hashes ('index appends are harmless to repeat'): a duplicated hash
    store must produce the identical report, not double-counted
    n_batch/n_exact_dup rows via join fan-out."""
    d = load_table(spark, sf_dir, "documents")
    corpus_docs = d.filter(F.col("doc_id") % 10 != 0)
    batch_docs = d.filter(F.col("doc_id") % 10 == 0)
    idx = str(tmp_path / "prep_index")
    build_prep_index(spark, corpus_docs, idx)
    batch_path = str(tmp_path / "batch")
    batch_docs.write.parquet(batch_path)
    batch = spark.read.parquet(batch_path)

    clean = sorted(map(tuple, incremental_prep_indexed(spark, batch, idx).collect()))

    # simulate the redo: every store hash appended a second time
    hashes = spark.read.parquet(f"{idx}/hashes")
    hashes.write.mode("append").parquet(f"{idx}/hashes")

    redone = sorted(map(tuple, incremental_prep_indexed(spark, batch, idx).collect()))
    assert redone == clean


def test_bloom_rebuilds_from_hash_store_without_corpus(spark, sf_dir, tmp_path):
    """The bitmap is derived state: losing it costs one scan of the
    persisted hash store, never a corpus scan."""
    import shutil

    from kinesis_spark.bloom import build_bloom, densify_bloom

    d = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "prep_index")
    build_prep_index(spark, d.filter(F.col("doc_id") % 10 != 0), idx)
    before = spark.read.parquet(f"{idx}/bloom").first()["__bloom"]
    shutil.rmtree(f"{idx}/bloom")
    hashes = spark.read.parquet(f"{idx}/hashes")
    densify_bloom(build_bloom(hashes, "h")).write.parquet(f"{idx}/bloom")
    after = spark.read.parquet(f"{idx}/bloom").first()["__bloom"]
    assert before == after
