"""Streaming chunk-dedup maintainer (streaming/chunk_dedup.py):
multi-batch parity with the sequential batch rewrite, durable-store
growth, and replay idempotence."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import pytest
from pyspark.sql import functions as F

from kinesis_spark.pins import release_shared_pins
from kinesis_spark.streaming.chunk_dedup import ChunkDedupSink, start_chunk_dedup

_W = 64


def _toks(prefix: str, n: int = _W) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# three arrival waves: chunk A repeats across batches, C repeats across
# batches, B repeats within its own batch
_BATCHES = [
    [(1, _toks("A")), (2, _toks("C"))],
    [(10, _toks("A")), (11, _toks("B")), (12, _toks("B"))],
    [(20, _toks("C")), (21, _toks("D"))],
]


@pytest.fixture(scope="module")
def waves(spark, tmp_path_factory):
    """One parquet file per wave, mtime-ordered so maxFilesPerTrigger=1
    delivers them as three ordered micro-batches."""
    d = tmp_path_factory.mktemp("chunk_stream")
    out = tmp_path_factory.mktemp("chunk_stream_files")
    files = []
    for i, rows in enumerate(_BATCHES):
        p = str(d / f"wave-{i}")
        spark.createDataFrame(
            [(i_, t, "en", "s", len(t)) for i_, t in rows], _SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(p)
        src = glob.glob(f"{p}/part-*.parquet")[0]
        dst = str(out / f"part-{i:03d}.parquet")
        shutil.copy(src, dst)
        files.append(dst)
    base = os.path.getmtime(files[-1])
    for i, f in enumerate(files):
        os.utime(f, (base + i, base + i))
    return str(out)


def _stream(spark, d, mfpt=1):
    schema = spark.read.parquet(d).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", mfpt)
        .parquet(d)
    )


@pytest.mark.streaming
def test_stream_matches_sequential_batch_rewrite(spark, waves, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    q = start_chunk_dedup(
        spark,
        _stream(spark, waves),
        state,
        out,
        str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    release_shared_pins()

    got = {
        r["doc_id"]: r for r in spark.read.parquet(out).collect()
    }
    # wave 0: A and C are both novel
    assert got[1]["n_dropped"] == 0 and got[1]["clean_md5"] == _md5(_toks("A"))
    assert got[2]["n_dropped"] == 0
    # wave 1: A is corpus-owned now; B keeps its first occurrence only
    assert got[10]["n_dropped"] == 1 and got[10]["clean_md5"] == _md5("")
    assert got[11]["n_dropped"] == 0 and got[11]["clean_md5"] == _md5(_toks("B"))
    assert got[12]["n_dropped"] == 1 and got[12]["clean_md5"] == _md5("")
    # wave 2: C was admitted in wave 0, D is novel
    assert got[20]["n_dropped"] == 1 and got[20]["clean_md5"] == _md5("")
    assert got[21]["n_dropped"] == 0 and got[21]["clean_md5"] == _md5(_toks("D"))
    # the durable store holds exactly the admitted distinct hashes
    hashes = {
        r["chunk_hash"]
        for r in spark.read.parquet(f"{state}/chunks").collect()
    }
    assert hashes == {_md5(_toks(p)) for p in "ABCD"}
    # provenance: one subdirectory per committed batch
    assert len(glob.glob(f"{state}/chunks/ingest_batch=*")) == 3


@pytest.mark.streaming
def test_replay_of_committed_batch_is_noop(spark, waves, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    sink = ChunkDedupSink(
        spark, state, out, run_token="tok"
    )
    b0 = spark.createDataFrame(
        [(1, _toks("A"), "en", "s", 0)], _SCHEMA
    )
    sink.process_batch(b0, 0)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{state}/chunks/ingest_batch=*/*.parquet")
    }
    sink.process_batch(b0, 0)  # committed: marker short-circuits
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{state}/chunks/ingest_batch=*/*.parquet")
    }
    assert before == after


@pytest.mark.streaming
def test_replay_after_partial_write_recomputes_identically(
    spark, waves, tmp_path
):
    """Crash between the store write and the marker: the replay must
    exclude its OWN subdirectory, so its chunks are not self-dups."""
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    sink = ChunkDedupSink(spark, state, out, run_token="tok")
    b0 = spark.createDataFrame([(1, _toks("A"), "en", "s", 0)], _SCHEMA)
    sink.process_batch(b0, 0)
    # simulate the crash: first attempt wrote everything but the marker
    os.remove(os.path.join(state, "_last_batch"))
    sink.process_batch(b0, 0)  # replay
    got = spark.read.parquet(out).filter(F.col("doc_id") == 1).collect()
    assert len(got) == 1  # overwrite, not duplicate
    assert got[0]["n_dropped"] == 0  # own hashes did not mask the batch
    assert got[0]["clean_md5"] == _md5(_toks("A"))
