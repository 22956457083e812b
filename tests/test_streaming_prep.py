"""Streaming prep intake (streaming/prep.py): single-trigger parity
with the batch p1 stages, and cross-batch exact-dedup state."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kinesis_spark.queries.pipelines import _KEEP_LANGS, _MIN_TOKENS
from kinesis_spark.streaming.analytics import run_to_completion
from kinesis_spark.streaming.neardup import band_keys
from kinesis_spark.streaming.prep import exact_dedup_stream, near_dup_flags_stream


@pytest.fixture(scope="module")
def docs_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("prep_stream")
    shutil.copy(f"{sf_dir}/documents.parquet", d / "part-000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def docs_dir_dups(sf_dir, tmp_path_factory):
    """The corpus twice: batch 2 is byte-identical, so exact dedup must
    drop ALL of it."""
    d = tmp_path_factory.mktemp("prep_stream_dups")
    f1, f2 = str(d / "part-000.parquet"), str(d / "part-001.parquet")
    shutil.copy(f"{sf_dir}/documents.parquet", f1)
    shutil.copy(f"{sf_dir}/documents.parquet", f2)
    now = os.path.getmtime(f2)
    os.utime(f1, (now - 100, now - 100))
    return str(d)


def _stream(spark, d, mfpt=None):
    schema = spark.read.parquet(d).schema
    r = spark.readStream.schema(schema)
    if mfpt is not None:
        r = r.option("maxFilesPerTrigger", mfpt)
    return r.parquet(d)


def _batch_exact(spark, d):
    """The batch p1 gate+exact stages (min doc_id per hash — streaming
    keeps first ARRIVAL, which in a single file-ordered batch is not
    guaranteed to be the min id, so compare on hash sets, not ids)."""
    docs = spark.read.parquet(d)
    return (
        docs.filter(
            F.col("lang").isin(*_KEEP_LANGS)
            & (F.size(F.split("text", r"\s+")) >= _MIN_TOKENS)
        )
        .withColumn("h", F.sha2("text", 256))
    )


@pytest.mark.streaming
def test_exact_dedup_stream_matches_batch_hash_set(spark, docs_dir):
    got = run_to_completion(
        exact_dedup_stream(_stream(spark, docs_dir)),
        output_mode="append",
        query_name="prep_exact",
    )
    batch = _batch_exact(spark, docs_dir)
    got_hashes = sorted(
        r["h"] for r in got.withColumn("h", F.sha2("text", 256)).select("h").collect()
    )
    want_hashes = sorted(r["h"] for r in batch.select("h").distinct().collect())
    assert got_hashes == want_hashes


@pytest.mark.streaming
def test_exact_dedup_state_crosses_batches(spark, docs_dir_dups):
    got = run_to_completion(
        exact_dedup_stream(_stream(spark, docs_dir_dups, mfpt=1)),
        output_mode="append",
        query_name="prep_exact2",
    )
    batch = _batch_exact(spark, docs_dir_dups)
    # the second (identical) file adds nothing: one survivor per hash
    assert got.count() == batch.select("h").distinct().count()


@pytest.mark.streaming
def test_full_chain_flags_match_banding_of_survivors(spark, docs_dir):
    got = run_to_completion(
        near_dup_flags_stream(_stream(spark, docs_dir)),
        output_mode="update",
        query_name="prep_chain",
    )
    got_rows = {
        (r["band_key"], r["doc_id"], r["dup_of"]) for r in got.collect()
    }
    # expected: band the exact-dedup survivors (batch), per bucket all
    # non-minimal members flagged against the min — but streaming dedup
    # keeps first ARRIVAL per hash, so compute the survivor set from the
    # stream's own output to isolate the near-dup stage
    survivors = run_to_completion(
        exact_dedup_stream(_stream(spark, docs_dir)),
        output_mode="append",
        query_name="prep_surv",
    )
    bands = band_keys(survivors).toPandas()
    want = set()
    for band_key, grp in bands.groupby("band_key"):
        members = sorted(set(int(x) for x in grp["doc_id"]))
        want.update((band_key, m, members[0]) for m in members[1:])
    assert got_rows == want
    assert len(got_rows) > 0
