"""RocksDB state-store provider (session.state_store): parity with the
default in-heap provider on the chained stateful prep query, and state
survival across a query restart under RocksDB — the at-scale streaming
configuration (VERDICT r4 #3)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kinesis_spark.session import _PROVIDER_KEY, state_store
from kinesis_spark.streaming.analytics import run_to_completion
from kinesis_spark.streaming.prep import exact_dedup_stream, near_dup_flags_stream


@pytest.fixture(scope="module")
def docs_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("rocksdb_docs")
    shutil.copy(f"{sf_dir}/documents.parquet", d / "part-000.parquet")
    return str(d)


def _stream(spark, d):
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).parquet(d)


def _state_files(ckpt):
    out = []
    for root, _, files in os.walk(os.path.join(ckpt, "state")):
        out.extend(os.path.join(root, f) for f in files)
    return out


def test_state_store_scope_restores_conf(spark):
    assert spark.conf.get(_PROVIDER_KEY, None) is None
    with state_store(spark, "rocksdb"):
        assert "RocksDB" in spark.conf.get(_PROVIDER_KEY)
    assert spark.conf.get(_PROVIDER_KEY, None) is None
    with pytest.raises(ValueError):
        with state_store(spark, "leveldb"):
            pass


@pytest.mark.streaming
def test_chained_prep_query_parity_across_providers(spark, docs_dir):
    """The two-stateful-operator prep chain (dropDuplicates state + LSH
    bucket state) produces identical flags under RocksDB and the default
    provider."""
    default = run_to_completion(
        near_dup_flags_stream(_stream(spark, docs_dir)),
        output_mode="update",
        query_name="ss_default",
    )
    want = sorted(map(tuple, default.collect()))
    with state_store(spark, "rocksdb"):
        rocks = run_to_completion(
            near_dup_flags_stream(_stream(spark, docs_dir)),
            output_mode="update",
            query_name="ss_rocks",
        )
        got = sorted(map(tuple, rocks.collect()))
    assert got == want
    assert len(got) > 0


@pytest.mark.streaming
def test_exact_dedup_state_survives_restart_under_rocksdb(spark, docs_dir, tmp_path):
    """Kill/restart cycle on the stateful dedup with a RocksDB-backed
    checkpoint: the restarted query must remember every hash from the
    first run (an identical second file adds ZERO rows), and the
    checkpoint must actually hold RocksDB artifacts (zip snapshots /
    changelogs), not the default provider's delta files."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(os.path.join(docs_dir, "part-000.parquet"), f"{src}/f1.parquet")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = spark.read.parquet(src).schema

    def _run():
        stream = exact_dedup_stream(spark.readStream.schema(schema).parquet(src))
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "drain timed out"
        q.stop()

    with state_store(spark, "rocksdb"):
        _run()
        n1 = spark.read.parquet(out).count()
        assert n1 > 0
        files = _state_files(ckpt)
        assert any(f.endswith((".zip", ".changelog")) for f in files), (
            "no RocksDB artifacts in checkpoint — provider did not engage"
        )
        assert not any(f.endswith(".delta") for f in files)
        # crash/redeploy: same checkpoint, new query instance, dup input
        shutil.copy(f"{src}/f1.parquet", f"{src}/f2.parquet")
        _run()
        assert spark.read.parquet(out).count() == n1  # state survived

    # the provider choice is pinned INTO the checkpoint: a restart
    # outside the scope (default conf) keeps working against the same
    # checkpoint rather than corrupting it
    shutil.copy(f"{src}/f1.parquet", f"{src}/f3.parquet")
    _run()
    assert spark.read.parquet(out).count() == n1
