"""Crash-inside-a-batch convergence of the production intake sink
(streaming/intake.py): the hash store and the corpus commit cannot be
updated atomically together, so the sink's ordering + corpus-guard +
rollup-recount must make every crash point redo-safe. Each test
simulates a crash by running only a PREFIX of the batch's steps, then
redelivers the batch through the full sink and asserts the end state
is exactly the clean single-delivery state."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.queries.pipelines import _KEEP_LANGS
from kinesis_spark.streaming.intake import PrepIntakeSink
from kinesis_spark.txstore import tx_read


def _batch(spark, sf_dir, lo, hi):
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin(*_KEEP_LANGS))
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text", "lang", "source")
    )


def _mk_sink(spark, work):
    return PrepIntakeSink(
        spark,
        hashes_dir=f"{work}/index/hashes",
        bands_dir=f"{work}/index/bands",
        store_root=f"{work}/corpus_tx",
        rollup_root=f"{work}/rollup_tx",
        partition_cols=("lang", "source"),
    )


def _end_state(spark, sink):
    corpus = sorted(
        r.doc_id for r in tx_read(spark, sink.store_root).select("doc_id").collect()
    )
    rollup = {
        (r.lang, r.source): (r.n_docs, r.total_tokens)
        for r in tx_read(spark, sink.rollup_root).collect()
    }
    return corpus, rollup


def _clean_reference(spark, sf_dir, tmp_path):
    """The state a single clean delivery of both batches produces."""
    sink = _mk_sink(spark, str(tmp_path / "ref"))
    sink.process_batch(_batch(spark, sf_dir, 0, 200), 0)
    sink.process_batch(_batch(spark, sf_dir, 200, 400), 1)
    return _end_state(spark, sink)


def test_crash_after_append_before_index_converges(spark, sf_dir, tmp_path):
    """Crash point (a): the predecessor appended the batch to the corpus
    but died before writing the hash store. The redo's corpus-guard must
    find the docs already present and append NOTHING — no duplicate
    doc_ids, rollup equal to a recount."""
    from kinesis_spark.txstore import tx_init

    ref = _clean_reference(spark, sf_dir, tmp_path)
    sink = _mk_sink(spark, str(tmp_path / "a"))
    sink.process_batch(_batch(spark, sf_dir, 0, 200), 0)

    b2 = _batch(spark, sf_dir, 200, 400)
    # simulate the partial attempt: admit + corpus append ONLY
    admitted = sink._admit(b2)
    from kinesis_spark.txstore import tx_append

    tx_append(spark, sink.store_root, admitted.drop("__h"))
    # ... crash. Redeliver the whole batch through the full sink:
    sink.process_batch(b2, 1)

    corpus, rollup = _end_state(spark, sink)
    assert corpus == ref[0]  # no double-admission
    assert len(corpus) == len(set(corpus))
    assert rollup == ref[1]  # recount healed the rollup
    # and the hash store now gates a THIRD delivery outright
    sink.process_batch(b2, 2)
    assert _end_state(spark, sink) == ref


def test_crash_after_hashes_before_rollup_converges(spark, sf_dir, tmp_path):
    """Crash point (c): the predecessor finished the corpus append and
    every index artifact but died before the rollup recount. The redo
    dedups the whole batch away — and must STILL recount the touched
    partitions, healing the rollup."""
    ref = _clean_reference(spark, sf_dir, tmp_path)
    sink = _mk_sink(spark, str(tmp_path / "c"))
    sink.process_batch(_batch(spark, sf_dir, 0, 200), 0)

    b2 = _batch(spark, sf_dir, 200, 400)
    # partial attempt: everything EXCEPT the rollup recount
    rollup_root = sink.rollup_root
    sink.rollup_root = None
    sink.process_batch(b2, 1)
    sink.rollup_root = rollup_root
    stale = {
        (r.lang, r.source): r.n_docs
        for r in tx_read(spark, rollup_root).collect()
    }
    # ... crash. Redelivery dedups to zero admitted docs:
    sink.process_batch(b2, 1)

    corpus, rollup = _end_state(spark, sink)
    assert corpus == ref[0]
    assert rollup == ref[1]
    # the partial attempt really had left the rollup behind (so the
    # equality above demonstrates healing, not a vacuous no-op)
    assert any(stale.get(k, 0) < v[0] for k, v in ref[1].items())
