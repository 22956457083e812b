"""Source/sink matrix: every format round-trips the events table (or a
projection of it) without loss, batch and streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_spark.io import load_table
from kinesis_spark.sources import (
    read_csv,
    read_json,
    read_parquet,
    read_text,
    socket_source,
    write_parquet,
)

FLAT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def flat_events(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .cache()
    )


def _assert_same_rows(got, want, key="event_id"):
    assert got.count() == want.count()
    assert (
        got.join(want, on=list(want.columns), how="inner").count() == want.count()
    ), "row mismatch after round-trip"


def test_csv_roundtrip(spark, flat_events, tmp_path):
    p = str(tmp_path / "ev_csv")
    flat_events.write.option("header", True).csv(p)
    back = read_csv(spark, p, FLAT_SCHEMA)
    _assert_same_rows(back, flat_events)


def test_csv_infer_schema(spark, flat_events, tmp_path):
    p = str(tmp_path / "ev_csv2")
    flat_events.write.option("header", True).csv(p)
    back = read_csv(spark, p)
    assert back.count() == flat_events.count()
    assert dict(back.dtypes)["event_id"] in ("int", "bigint")


def test_json_roundtrip_batch_and_stream(spark, flat_events, tmp_path):
    p = str(tmp_path / "ev_json")
    flat_events.write.json(p)
    _assert_same_rows(read_json(spark, p, FLAT_SCHEMA), flat_events)
    # streaming read of the same files, drained to memory
    stream = read_json(spark, p, FLAT_SCHEMA, streaming=True)
    q = (
        stream.writeStream.format("memory")
        .queryName("json_stream_rt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _assert_same_rows(spark.table("json_stream_rt"), flat_events)


def test_json_stream_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_json(spark, str(tmp_path), streaming=True)


def test_text_roundtrip(spark, flat_events, tmp_path):
    p = str(tmp_path / "ev_text")
    flat_events.select(
        F.concat_ws(",", "event_id", "event_type").alias("value")
    ).write.text(p)
    back = read_text(spark, p)
    assert back.count() == flat_events.count()
    assert back.schema == T.StructType([T.StructField("value", T.StringType())])


def test_parquet_partitioned_sink_prunes(spark, flat_events, tmp_path):
    p = str(tmp_path / "ev_parq")
    write_parquet(flat_events, p, partition_by=["event_type"], max_records_per_file=10_000)
    back = read_parquet(spark, p)
    one_type = flat_events.select("event_type").first()[0]
    pruned = back.filter(F.col("event_type") == one_type)
    # partition pruning visible in the plan: only one partition dir read
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan[:500]
    assert (
        pruned.count()
        == flat_events.filter(F.col("event_type") == one_type).count()
    )


def test_socket_source_constructs(spark):
    df = socket_source(spark, "localhost", 9999)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["value"]


def test_orc_roundtrip_and_pushdown(spark, flat_events, tmp_path):
    from kinesis_spark.sources import read_orc, write_orc

    p = str(tmp_path / "orc")
    write_orc(flat_events, p, partition_by=["event_type"])
    back = read_orc(spark, p)
    assert back.count() == flat_events.count()
    plan = (
        back.filter(back.event_type == "click")
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition filter must prune at the scan, not post-filter
    assert "click" in plan


def test_orc_stream_requires_schema(spark, tmp_path):
    import pytest as _pytest

    from kinesis_spark.sources import read_orc

    with _pytest.raises(ValueError):
        read_orc(spark, str(tmp_path), streaming=True)


def test_avro_provision_decision(monkeypatch, tmp_path):
    """Self-provision attempts the spark-avro coordinate ONLY when it is
    resolvable (ivy cache hit or Maven reachable) — an unconditional
    coordinate would fail JVM startup offline — and honors the opt-out."""
    import socket

    import pyspark

    import kinesis_spark.session as sess
    from kinesis_spark.session import _avro_package

    def fresh():  # the decision memoizes per process; reset between cases
        monkeypatch.setattr(sess, "_AVRO_DECISION", sess._UNRESOLVED)

    monkeypatch.setenv("HOME", str(tmp_path))  # empty ivy cache

    def refuse(*a, **k):
        raise OSError("offline")

    monkeypatch.setattr(socket, "create_connection", refuse)
    fresh()
    assert _avro_package() is None  # offline, no cache → gate path

    # a cached jar provisions even offline
    jars = tmp_path / ".ivy2" / "jars"
    jars.mkdir(parents=True)
    coord = f"org.apache.spark:spark-avro_2.13:{pyspark.__version__}"
    (jars / f"org.apache.spark_spark-avro_2.13-{pyspark.__version__}.jar").touch()
    fresh()
    assert _avro_package() == coord

    # explicit opt-out wins over everything
    monkeypatch.setenv("SPARK_GRAFT_AVRO_PROVISION", "off")
    fresh()
    assert _avro_package() is None

    # reachable network provisions without a cache
    monkeypatch.delenv("SPARK_GRAFT_AVRO_PROVISION")
    monkeypatch.setenv("HOME", str(tmp_path / "nohome"))

    class FakeSock:
        def close(self):
            pass

    monkeypatch.setattr(socket, "create_connection", lambda *a, **k: FakeSock())
    fresh()
    assert _avro_package() == coord

    # memoized: a flipped environment does NOT change the decision
    monkeypatch.setattr(socket, "create_connection", refuse)
    assert _avro_package() == coord


def test_avro_roundtrip_or_gate(spark, flat_events, tmp_path):
    import pytest as _pytest

    from kinesis_spark.sources import _avro_available, read_avro, write_avro

    p = str(tmp_path / "avro")
    if not _avro_available(spark):
        with _pytest.raises(NotImplementedError):
            read_avro(spark, p)
        return
    write_avro(flat_events, p)
    back = read_avro(spark, p)
    assert back.count() == flat_events.count()
    assert set(back.columns) == set(flat_events.columns)


class TestCorruptRecords:
    """Schema-on-read error policy: quarantine, drop, or fail loud."""

    @staticmethod
    def _mixed_json(tmp_path):
        p = tmp_path / "mixed.jsonl"
        p.write_text(
            '{"id": 1, "v": "ok"}\n'
            "this is not json\n"
            '{"id": 2, "v": "also ok"}\n'
            '{"id": "not-a-number", "v": "bad type"}\n'
        )
        return str(p)

    def test_permissive_quarantines_raw_text(self, spark, tmp_path):
        from kinesis_spark.sources import read_json

        df = read_json(
            spark,
            self._mixed_json(tmp_path),
            schema="id BIGINT, v STRING",
            corrupt_column="_bad",
        ).cache()
        assert df.count() == 4
        bad = df.filter(df._bad.isNotNull())
        assert bad.count() == 2  # the non-JSON line and the bad-typed row
        assert df.filter(df.id.isNotNull()).count() == 2

    def test_dropmalformed_silently_drops(self, spark, tmp_path):
        from kinesis_spark.sources import read_json

        df = read_json(
            spark,
            self._mixed_json(tmp_path),
            schema="id BIGINT, v STRING",
            mode="DROPMALFORMED",
        )
        # select both columns: a zero-column count() takes the raw-line
        # fast path and never parses (so nothing would be dropped)
        assert len(df.select("id", "v").collect()) == 2

    def test_failfast_raises(self, spark, tmp_path):
        import pytest as _pytest

        from kinesis_spark.sources import read_json

        df = read_json(
            spark,
            self._mixed_json(tmp_path),
            schema="id BIGINT, v STRING",
            mode="FAILFAST",
        )
        with _pytest.raises(Exception, match="FAILFAST|[Mm]alformed"):
            df.select("id", "v").collect()

    @staticmethod
    def _mixed_csv(tmp_path):
        p = tmp_path / "mixed.csv"
        p.write_text("id,v\n1,ok\nnot-a-number,bad\n2,fine\n")
        return str(p)

    def test_csv_permissive_quarantines(self, spark, tmp_path):
        from kinesis_spark.sources import read_csv

        df = read_csv(
            spark,
            self._mixed_csv(tmp_path),
            schema="id BIGINT, v STRING",
            corrupt_column="_bad",
        ).cache()
        assert df.count() == 3
        assert df.filter(df._bad.isNotNull()).count() == 1
        assert df.filter(df.id.isNotNull()).count() == 2

    def test_csv_failfast_raises(self, spark, tmp_path):
        import pytest as _pytest

        from kinesis_spark.sources import read_csv

        df = read_csv(
            spark,
            self._mixed_csv(tmp_path),
            schema="id BIGINT, v STRING",
            mode="FAILFAST",
        )
        with _pytest.raises(Exception, match="FAILFAST|[Mm]alformed"):
            df.select("id", "v").collect()

    def test_streaming_quarantine_column(self, spark, tmp_path):
        """corrupt_column applies on the readStream path too: the stream's
        schema carries the quarantine column and bad rows land in it."""
        from kinesis_spark.sources import read_json

        src = tmp_path / "stream_in"
        src.mkdir()
        (src / "part-0.jsonl").write_text(
            '{"id": 1, "v": "ok"}\nnot json at all\n'
        )
        sdf = read_json(
            spark,
            str(src),
            schema="id BIGINT, v STRING",
            streaming=True,
            corrupt_column="_bad",
        )
        assert sdf.isStreaming and "_bad" in sdf.columns
        out = str(tmp_path / "sink")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.read.parquet(out)
        assert got.count() == 2
        assert got.filter(got._bad.isNotNull()).count() == 1

    def test_csv_streaming_quarantine_column(self, spark, tmp_path):
        from kinesis_spark.sources import read_csv

        src = tmp_path / "csv_stream_in"
        src.mkdir()
        (src / "part-0.csv").write_text("id,v\n1,ok\nnot-a-number,bad\n")
        sdf = read_csv(
            spark,
            str(src),
            schema="id BIGINT, v STRING",
            streaming=True,
            corrupt_column="_bad",
        )
        assert sdf.isStreaming and "_bad" in sdf.columns


def test_binary_file_source_batch_and_glob(spark, tmp_path):
    """binaryFile: whole files as binary rows; glob prunes at listing."""
    from kinesis_spark.sources import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    payloads = {"a.img": b"\x00\x01IMGDATA", "b.img": b"\xffIMG2", "c.txt": b"not media"}
    for name, data in payloads.items():
        (d / name).write_bytes(data)

    df = read_binary_files(spark, str(d), glob="*.img")
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert rows == {"a.img": payloads["a.img"], "b.img": payloads["b.img"]}
    got_len = {r.path.rsplit("/", 1)[-1]: r.length for r in df.collect()}
    assert got_len == {"a.img": 9, "b.img": 5}


def test_binary_file_source_streaming(spark, tmp_path):
    from kinesis_spark.sources import read_binary_files

    d = tmp_path / "media_stream"
    d.mkdir()
    (d / "x.bin").write_bytes(b"STREAMED")
    sdf = read_binary_files(spark, str(d), streaming=True)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("binfiles")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.table("binfiles").collect()
    assert len(rows) == 1 and bytes(rows[0].content) == b"STREAMED"


def test_xml_roundtrip(spark, tmp_path):
    from kinesis_spark.sources import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "<beta & gamma>")], "id BIGINT, name STRING"
    )
    out = str(tmp_path / "xml_out")
    write_xml(df, out, "row")
    back = read_xml(spark, out, "row", schema="id BIGINT, name STRING")
    assert sorted((r.id, r.name) for r in back.collect()) == [
        (1, "alpha"),
        (2, "<beta & gamma>"),  # escaping round-trips
    ]


def test_xml_stream_requires_schema(spark, tmp_path):
    from kinesis_spark.sources import read_xml

    with pytest.raises(ValueError, match="explicit schema"):
        read_xml(spark, str(tmp_path), "row", streaming=True)


def test_load_table_repins_utc_for_every_table(spark, sf_dir):
    """The external driver owns the session and may run it in any
    timezone; load_table must re-pin UTC on EVERY load (all tables, not
    just events) so TIMESTAMP-typed date columns keep the wall-clock
    values the DuckDB oracles compare verbatim. The fixtures currently
    load as TIMESTAMP_NTZ (naive either way), but older/other parquet
    encodings load as TIMESTAMP, where a non-UTC session would shift
    year() buckets and date-literal filters."""
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        for table in ("lineitem", "orders", "events"):
            spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
            load_table(spark, sf_dir, table)
            assert spark.conf.get("spark.sql.session.timeZone") == "UTC", table
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
