"""p15_chunk_dedup_rewrite — chunk-granularity dedup EXECUTED
incrementally (VERDICT r10 task 3): planted-corpus semantics, the
zero-corpus-scan plan contract, the bodies-never-cross-an-exchange
contract (stricter than p9's), and the day-over-day append loop.

The oracle gate proves Spark == DuckDB on the big corpora; these tests
prove both engines compute the RIGHT thing on inputs with known
answers, and pin the executed plan's scale shape."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from kinesis_spark.pins import release_shared_pins
from kinesis_spark.queries import get_registry

REGISTRY = get_registry()

# one 64-token window per line keeps the planted chunks exact
_W = 64


def _toks(prefix: str, n: int = _W) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """Corpus/batch split on doc_id % 10. Corpus owns chunk A; the
    batch re-submits A (corpus-dup), submits C twice (within-batch
    dup, first occurrence canonical), and one unique two-chunk doc."""
    sf = str(tmp_path_factory.mktemp("p15sf"))
    rows = [
        (1, _toks("A"), "en", "s"),            # corpus: owns chunk A
        (3, _toks("B"), "en", "s"),            # corpus: unrelated
        (10, _toks("A"), "en", "s"),           # batch: corpus-dup -> dropped
        (20, _toks("C"), "en", "s"),           # batch: first C -> kept
        (30, _toks("C"), "en", "s"),           # batch: second C -> dropped
        (40, _toks("D", 100), "en", "s"),      # batch: unique, 2 chunks
    ]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_planted_chunk_dedup_semantics(spark, planted):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["p15_chunk_dedup_rewrite"].spark_fn(
            spark, planted
        ).collect()
    }
    release_shared_pins()
    assert set(got) == {10, 20, 30, 40}  # batch docs only
    # doc 10: its single chunk is corpus-owned -> everything dropped,
    # the rebuilt body is the empty chunk stream
    assert got[10]["n_chunks"] == 1 and got[10]["n_dropped"] == 1
    assert got[10]["tokens_dropped"] == _W
    assert got[10]["clean_md5"] == _md5("")
    # docs 20/30 share chunk C: the first (doc_id, chunk_idx)
    # occurrence is canonical, the later one drops
    assert got[20]["n_dropped"] == 0
    assert got[20]["clean_md5"] == _md5(_toks("C"))
    assert got[30]["n_dropped"] == 1
    assert got[30]["clean_md5"] == _md5("")
    # doc 40: 100 tokens -> windows [0..63] and [48..99], both unique,
    # newline-joined in chunk order; overlap tokens stay in each chunk
    d = _toks("D", 100).split(" ")
    want = " ".join(d[0:64]) + "\n" + " ".join(d[48:100])
    assert got[40]["n_chunks"] == 2 and got[40]["n_dropped"] == 0
    assert got[40]["tokens_total"] == 64 + 52
    assert got[40]["clean_md5"] == _md5(want)


def test_planted_matches_oracle(spark, planted):
    """The planted corpus also round-trips the DuckDB oracle — same
    drift guard as d18's planted gate."""
    import duckdb

    from tests.oracle_utils import compare

    q = REGISTRY["p15_chunk_dedup_rewrite"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted}/documents.parquet/*.parquet')"
    )
    want = con.execute(q.oracle).fetchdf()
    compare(q.spark_fn(spark, planted), want, "p15-planted")
    release_shared_pins()


def test_p15_zero_corpus_scans(spark, planted):
    """With the chunk index bootstrapped, the recurring per-batch plan
    reads documents exactly once (the batch slice); the corpus enters
    only through the persisted chunk store."""
    import contextlib
    import io

    q = REGISTRY["p15_chunk_dedup_rewrite"]
    q.spark_fn(spark, planted).collect()  # bootstrap the index
    df = q.spark_fn(spark, planted)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    release_shared_pins()
    assert plan.count("documents.parquet") == 1
    assert "chunks" in plan


def test_p15_bodies_never_cross_exchange(spark, planted):
    """STRICTER than p9: no text- or body-bearing column may appear in
    the input of ANY exchange (shuffle or broadcast) — the dup decision
    shuffles 16 B hash rows, the drop lists come back narrow, and chunk
    bodies exist only in map-side projections over the batch scan."""
    import contextlib
    import io

    q = REGISTRY["p15_chunk_dedup_rewrite"]
    q.spark_fn(spark, planted).collect()  # bootstrap the index
    df = q.spark_fn(spark, planted)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    release_shared_pins()
    blocks = re.findall(
        r"\(\d+\) (?:Exchange|BroadcastExchange)\s*\n"
        r"Input \[\d+\]: \[([^\]]*)\]",
        plan,
    )
    assert blocks, "expected exchanges in the plan"
    for cols in blocks:
        names = {c.strip().split("#")[0] for c in cols.split(",")}
        assert "text" not in names and "chunk_text" not in names, names


def test_append_day_over_day(spark, planted, tmp_path):
    """The admission loop: bootstrap from the corpus, rewrite batch 1,
    append batch 1's surviving hashes, then a batch-2 doc repeating a
    batch-1 chunk is dropped as corpus-owned."""
    from kinesis_spark.prep_index import (
        append_chunk_index,
        build_chunk_index,
        chunk_dedup_rewrite,
    )

    idx = str(tmp_path / "idx")
    docs = spark.read.parquet(f"{planted}/documents.parquet")
    build_chunk_index(spark, docs.filter(F.col("doc_id") % 10 != 0), idx)
    b1 = docs.filter(F.col("doc_id").isin(20, 40))
    chunk_dedup_rewrite(spark, b1, idx).collect()
    assert append_chunk_index(spark, b1, idx) == 3  # C + D's two chunks
    release_shared_pins()
    b2 = spark.createDataFrame(
        [(50, _toks("C"), "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = chunk_dedup_rewrite(spark, b2, idx).collect()[0]
    release_shared_pins()
    assert got["n_dropped"] == 1 and got["clean_md5"] == _md5("")
    # crash-redo: re-appending the same batch adds nothing
    assert append_chunk_index(spark, b1, idx) == 0
