"""Parity tests for _bpe_learn's vocabulary-exhaustion path: when every
word is fully merged before BPE_MERGES rounds complete, the merge loop
STOPS at the last non-empty vocabulary (Spark break == oracle NOT
EXISTS carry-forward), so t14 emits only the real merges and t16
degrades to per-word fully-merged token counts — every document stays
in the encoding report instead of silently vanishing (the earlier
behavior emptied the vocab through a 0-row cross join). The fixture
corpora never exhaust (rich vocabulary), so this pins the behavior on
corpora that do.
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


def test_t16_exhaustion_degrades_to_fully_merged_counts(spark, tmp_path):
    # post-exhaustion the vocab is the LAST NON-EMPTY state (every word
    # one symbol), so every document stays in the report with
    # n_bpe_tokens == n_words — and Spark must still match the oracle's
    # carry-forward arm row for row
    sf = _tiny_corpus(spark, tmp_path)
    q = REGISTRY["t16_bpe_apply"]
    got = q.spark_fn(spark, sf).toPandas().sort_values("doc_id").reset_index(drop=True)
    want = _oracle(q.oracle, sf).sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want) == 2  # no document vanished
    assert (got["n_bpe_tokens"] == got["n_words"]).all()  # fully merged
    for c in ["doc_id", "n_words", "n_bpe_tokens"]:
        assert (got[c].astype("int64") == want[c].astype("int64")).all(), c


def test_t14_round1_exhaustion_returns_empty(spark, tmp_path):
    # single-letter corpus: nothing is ever mergeable; both engines
    # must return an EMPTY merge list (not crash, not a NULL row)
    rows = [(0, "a b a", "en", "s1", 5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    q = REGISTRY["t14_bpe_merge_learn"]
    got = q.spark_fn(spark, str(tmp_path)).toPandas()
    want = _oracle(q.oracle, str(tmp_path))
    assert len(got) == len(want) == 0
    # and the applied encoding still reports every document
    q16 = REGISTRY["t16_bpe_apply"]
    got16 = q16.spark_fn(spark, str(tmp_path)).toPandas()
    want16 = _oracle(q16.oracle, str(tmp_path))
    assert len(got16) == len(want16) == 1
    assert int(got16.iloc[0]["n_bpe_tokens"]) == 3 == int(want16.iloc[0]["n_bpe_tokens"])
