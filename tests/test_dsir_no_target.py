"""Parity test for s16's zero-target-corpus path (review fix): with no
target-language grams anywhere, every bucket weight is a NULL division
— the score must PROPAGATE that NULL exactly like the oracle, never
coalesce to 0.0 (a 0.0 score reads as "maximally unlike the target",
which is a silent semantic lie when the target sample is simply empty).
"""

from __future__ import annotations

import duckdb

from kinesis_spark.queries import get_registry

REGISTRY = get_registry()


def test_s16_null_weights_propagate(spark, tmp_path):
    rows = [
        (0, "ein kleiner text", "de", "s1", 16),
        (1, "noch ein text", "de", "s1", 13),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    q = REGISTRY["s16_dsir_reweight"]
    got = q.spark_fn(spark, str(tmp_path)).toPandas().sort_values("doc_id")
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
        )
        want = con.execute(q.oracle).fetchdf().sort_values("doc_id")
    finally:
        con.close()
    assert len(got) == len(want) == 2
    assert got["dsir_score"].isna().all() and want["dsir_score"].isna().all()
    assert got["upweight"].isna().all() and want["upweight"].isna().all()


def test_s16_nonascii_text_no_overflow_and_engines_agree(spark, tmp_path):
    """ADVICE r5 (low): a supplementary-plane code point (0x10FFFF) made
    h * MIX overflow int64 — Spark wrapped silently while DuckDB
    errored. The % 2^22 pre-multiply reduction (and the oracle's BIGINT
    cast over DuckDB's INT32 unicode()) keeps both engines exact and
    identical on any Unicode input; ASCII buckets are unchanged."""
    rows = [
        (0, "\U0010FFFF\U0010FFFFhello world text\U0010FFFF", "en", "s1", 20),
        (1, "plain ascii text here", "en", "s1", 21),
        (2, "\U0001F600 emoji und umlaut äöü", "de", "s1", 24),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    q = REGISTRY["s16_dsir_reweight"]
    got = q.spark_fn(spark, str(tmp_path)).toPandas().sort_values("doc_id")
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
        )
        want = con.execute(q.oracle).fetchdf().sort_values("doc_id")
    finally:
        con.close()
    assert len(got) == len(want) == 3
    for c in ["n_grams", "dsir_score", "upweight"]:
        assert (got[c].values == want[c].values).all(), c
