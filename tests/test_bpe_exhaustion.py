"""Parity test for _bpe_learn's vocabulary-exhaustion path (review fix):
when every word is fully merged before BPE_MERGES rounds complete, the
per-round argmax must become a 0-row relation — emptying the vocab and
the remaining merge rounds EXACTLY like the oracle's `LIMIT 1` over an
empty CTE — instead of emitting an all-NULL merge row that NULLs the
vocabulary through F.replace. The fixture corpora never exhaust (rich
vocabulary), so this pins the behavior on a corpus that does.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kinesis_spark.queries import get_registry

REGISTRY = get_registry()


def _tiny_corpus(spark, tmp_path):
    # words: 'ab' only -> round 1 merges (a,b); rounds 2..4 find no
    # pairs (every word is a single symbol) -> exhaustion
    rows = [
        (0, "ab ab", "en", "s1", 5),
        (1, "ab", "en", "s1", 2),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        # Spark writes a directory; glob its part files
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def test_t14_exhaustion_emits_only_real_merges(spark, tmp_path):
    sf = _tiny_corpus(spark, tmp_path)
    q = REGISTRY["t14_bpe_merge_learn"]
    got = q.spark_fn(spark, sf).toPandas().sort_values("merge_rank")
    want = _oracle(q.oracle, sf).sort_values("merge_rank")
    assert len(got) == len(want) == 1  # one real merge, no NULL rows
    assert got.iloc[0]["left_sym"] == "a" and got.iloc[0]["right_sym"] == "b"
    assert int(got.iloc[0]["pair_count"]) == 3
    assert not got.isna().any().any()


def test_t16_exhaustion_matches_oracle_empty_vocab(spark, tmp_path):
    # the oracle's w{t} cross-joins an empty b{t} -> vocab goes empty ->
    # t16 returns 0 rows; the Spark side must agree (the NULL-merge bug
    # instead NULLed every word and ALSO returned 0 rows but via a
    # corrupted vocab — the t14 assertion above is what distinguishes)
    sf = _tiny_corpus(spark, tmp_path)
    q = REGISTRY["t16_bpe_apply"]
    got = q.spark_fn(spark, sf).toPandas()
    want = _oracle(q.oracle, sf)
    assert len(got) == len(want)
