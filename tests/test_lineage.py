"""The lineage oracles reconstruct file ordinals from the fixture
invariant that rows are written in doc_id order — assert the invariant
itself so a fixture change fails loudly here, not as a value mismatch."""

from pyspark.sql import functions as F


def test_fixture_rows_are_in_doc_id_order(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.col("_metadata.row_index").alias("row_idx"))
        .orderBy("row_idx")
    )
    rows = df.collect()
    ids = [r.doc_id for r in rows]
    assert ids == sorted(ids)
    assert [r.row_idx for r in rows] == list(range(len(rows)))


def test_metadata_costs_no_extra_scan(spark, sf_dir):
    from kinesis_spark.queries import get_registry

    df = get_registry()["prov1_file_lineage"].spark_fn(spark, sf_dir)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Scan parquet") == 2  # ONE scan node (tree + detail)
    assert "Exchange" not in plan
