"""Source/sink surface beyond the fixture parquet: text, JSON, CSV, rate,
socket readers (batch + streaming where the format supports it) and a
partitioned parquet sink.

Reference parity: the reference's only source is stdin (main.go:32-35)
and its only sink is PutRecords (kinesis/kinesis.go:221). ``read_text``
with ``path='/dev/stdin'`` is the CLI-parity batch source; the
PutRecords sink lives in kinesis_spark.streaming.ingest. Everything
else here is the §2B source matrix.

Scale notes:
- All readers return plain DataFrames → Catalyst pushes filters and
  prunes columns into the scan (csv/json get schema-aware pruning when
  an explicit schema is passed — always pass one in production; inference
  reads the data twice and widens every column).
- The parquet sink supports ``partition_by`` for partition-pruned
  downstream reads and ``max_records_per_file`` to bound file sizes at
  100 TB (small-file storms and 10 GB monoliths both kill a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_text(
    spark: SparkSession,
    path: str,
    *,
    streaming: bool = False,
    whole_text: bool = False,
) -> DataFrame:
    """Line-framed text → one string row per line (column ``value``).

    Batch with ``path='/dev/stdin'`` is the CLI-parity unix-pipe source.
    Note the framing difference vs the reference documented in SURVEY.md
    §7(c): io.Copy chunks at arbitrary 32 KB boundaries, the text source
    frames on newlines; the ingest chunker re-chunks downstream either way.
    """
    if streaming:
        return spark.readStream.text(path)
    reader = spark.read
    if whole_text:
        return reader.option("wholetext", "true").text(path)
    return reader.text(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    streaming: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_column: str | None = None,
) -> DataFrame:
    """JSON-lines reader. Streaming requires an explicit schema (Spark
    refuses to infer on a stream — rightly: inference is a full scan).

    Corrupt-record policy is explicit: ``mode`` is PERMISSIVE (bad rows
    become nulls), DROPMALFORMED (bad rows silently vanish — opt-in
    only), or FAILFAST (the 100 TB-safe default for pipelines where a
    malformed shard means upstream breakage, fail loud not quiet).
    With ``corrupt_column`` the PERMISSIVE raw text of each bad record is
    retained in that column for quarantine-and-audit flows — on the
    batch and streaming paths alike.
    """
    if streaming and schema is None:
        raise ValueError("streaming JSON requires an explicit schema")
    reader = (spark.readStream if streaming else spark.read).option("mode", mode)
    if corrupt_column is not None:
        if schema is None:
            raise ValueError("corrupt_column requires an explicit schema")
        schema = _with_corrupt_field(schema, corrupt_column)
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def _with_corrupt_field(schema: T.StructType | str, corrupt_column: str) -> T.StructType:
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    return T.StructType(
        list(schema.fields) + [T.StructField(corrupt_column, T.StringType())]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    header: bool = True,
    streaming: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_column: str | None = None,
) -> DataFrame:
    """CSV reader with the same explicit corrupt-record policy as
    ``read_json`` (PERMISSIVE / DROPMALFORMED / FAILFAST, optional
    quarantine column holding the raw malformed line), batch and
    streaming alike."""
    if streaming and schema is None:
        raise ValueError("streaming CSV requires an explicit schema")
    reader = (spark.readStream if streaming else spark.read).option(
        "header", header
    ).option("mode", mode)
    if corrupt_column is not None:
        if schema is None:
            raise ValueError("corrupt_column requires an explicit schema")
        schema = _with_corrupt_field(schema, corrupt_column)
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    *,
    streaming: bool = False,
) -> DataFrame:
    if streaming:
        if schema is None:
            raise ValueError("streaming parquet requires an explicit schema")
        return spark.readStream.schema(schema).parquet(path)
    reader = spark.read
    if schema is not None:
        # enforce, don't infer: a caller passing a schema wants drifted
        # files to fail loudly, not be silently widened/renamed
        reader = reader.schema(schema)
    return reader.parquet(path)


BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = False,
    streaming: bool = False,
) -> DataFrame:
    """``binaryFile`` source — the multimodal ingestion scan: whole files
    (images/audio/video blobs) as ``(path, modificationTime, length,
    content binary)`` rows, ready for ``multimodal.decode_media``.

    Scale shape: listing and reads are task-parallel; ``glob`` prunes at
    file listing (never opens non-matching files). One file = one row —
    for many-KB objects that's ideal; for multi-GB media keep a manifest
    + range-read pattern instead (a 2 GB row blows past Arrow batch and
    shuffle-block sweet spots). The streaming variant is the standard
    new-file-arrival intake (checkpointed, exactly-once)."""
    reader = spark.readStream if streaming else spark.read
    reader = reader.format("binaryFile")
    if streaming:
        reader = reader.schema(BINARY_FILE_SCHEMA)  # file streams need one
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | str | None = None,
    *,
    streaming: bool = False,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """XML reader (built into Spark core since 4.0; one row per
    ``row_tag`` element). Same explicit corrupt-record policy family as
    JSON/CSV via ``mode``. Streaming requires an explicit schema, like
    every file-stream source here."""
    if streaming and schema is None:
        raise ValueError("streaming XML requires an explicit schema")
    reader = (spark.readStream if streaming else spark.read).format("xml").option(
        "rowTag", row_tag
    ).option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str, *, mode: str = "overwrite") -> None:
    """XML sink (interchange/hand-off format — parquet/ORC remain the
    analytics store)."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Streaming socket source (dev/debug only — not replayable, so no
    exactly-once; the production byte-stream path is the file or Kinesis
    source)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink. ``partition_by`` buys partition pruning
    for every downstream read; ``max_records_per_file`` bounds file size
    so a skewed partition can't produce a multi-GB file."""
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    *,
    streaming: bool = False,
) -> DataFrame:
    """ORC reader (batch + streaming). ORC gets the same pushdown/pruning
    treatment as parquet from the DataSource V2 scan — `.explain` shows
    PushedFilters against the ORC stripe index."""
    if streaming:
        if schema is None:
            raise ValueError("streaming orc requires an explicit schema")
        return spark.readStream.schema(schema).orc(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Partitioned ORC sink — same contract as ``write_parquet``."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


# Spark 4.1 bundles the Avro classes inside spark-sql.jar, but the
# short name "avro" only registers when the separate spark-avro package
# provides its ServiceLoader entry — the fully-qualified class name works
# everywhere, so that is what we use.
_AVRO_FORMAT = "org.apache.spark.sql.avro.AvroFileFormat"


def _avro_available(spark: SparkSession) -> bool:
    """True when the Avro FileFormat class actually loads (py4j package
    traversal never fails, so force real classloading)."""
    try:
        spark._jvm.java.lang.Class.forName(_AVRO_FORMAT)  # noqa: SLF001
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro reader. Gated with a clear error on distributions where the
    Avro classes are genuinely absent from the classpath."""
    if not _avro_available(spark):
        raise NotImplementedError(
            "Avro classes not on the classpath; add "
            "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        )
    return spark.read.format(_AVRO_FORMAT).load(path)


def write_avro(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Avro sink (row-oriented — the interchange format for ingest
    hand-off; stick to parquet/ORC for analytics storage)."""
    if not _avro_available(df.sparkSession):
        raise NotImplementedError(
            "Avro classes not on the classpath; add "
            "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        )
    df.write.mode(mode).format(_AVRO_FORMAT).save(path)
