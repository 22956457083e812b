"""Multimodal-column queries: opaque binary payloads + typed metadata,
decode/frame-sample/feature-extract — the Spark surface of
``kinesis_spark.multimodal``.

The payloads are the UTF-8 bytes of ``documents.text`` (deterministic;
the fixtures carry no real media). The fixture corpus is pure ASCII, so
the DuckDB oracles replay byte-level semantics (slicing, md5, hex) over
VARCHAR exactly — verified: octet_length(encode(text)) == length(text)
for every row at every SF.

Reference parity: the reference treats payloads as opaque bytes end to
end (kinesis/kinesis.go:199,213); these queries are the analytics
extension of that model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_spark.io import ensure_min_partitions, load_table
from kinesis_spark.multimodal import (
    MODALITIES,
    decode_media,
    media_table,
    nibble_histogram,
    sample_frames,
)
from kinesis_spark.queries import register

# generated from MODALITIES so the oracle can never drift from
# media_table's Spark-side assignment (fixture doc_ids are >= 0, so
# DuckDB's sign-preserving % equals Spark's pmod here)
_MODALITY_SQL = "([{}])[doc_id % {} + 1]".format(
    ",".join(f"'{m}'" for m in MODALITIES), len(MODALITIES)
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 8-way, not defaultParallelism: the decode path is mapInPandas, and
    # per-partition Python worker + Arrow stream setup dominates past ~8
    # partitions at fixture scale (measured: 32-way 2.6 s, 8-way 0.5 s,
    # serial 0.3-2.1 s for the mm family). The floor only fires when the
    # scan has fewer partitions (single-file fixtures); real multi-file
    # tables keep their native split count.
    return media_table(
        ensure_min_partitions(load_table(spark, sf_dir, "documents"), 8)
    )


@register(
    "mm1_media_catalog",
    oracle=f"""
SELECT {_MODALITY_SQL} AS modality,
       COUNT(*) AS n_media,
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       CAST(MIN(length(text)) AS BIGINT) AS min_bytes,
       CAST(MAX(length(text)) AS BIGINT) AS max_bytes
FROM documents
GROUP BY {_MODALITY_SQL}
""",
    tags=("multimodal", "metadata"),
)
def mm1_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog stats over typed metadata only — payload bytes are never
    touched, so Catalyst prunes the binary column out of the scan."""
    return _media(spark, sf_dir).groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


@register(
    "mm2_decode_features",
    oracle=f"""
SELECT doc_id AS media_id,
       {_MODALITY_SQL} AS modality,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) + 1 AS BIGINT) AS width,
       CAST(CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1))
                 ELSE 0 END + 1 AS BIGINT) AS height,
       CAST(length(text) // 64 + 1 AS BIGINT) AS n_frames,
       md5(text) AS checksum
FROM documents
""",
    tags=("multimodal", "decode", "pandas_udf"),
)
def mm2_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage over ``mapInPandas`` (deterministic header-parse
    fake; real codecs are stubbed — see kinesis_spark.multimodal). The
    oracle replays the fake byte-for-byte, proving the Arrow round-trip
    (binary in, typed features out) is lossless."""
    return decode_media(_media(spark, sf_dir), fake=True)


@register(
    "mm3_frame_sample",
    oracle=f"""
WITH m AS (
  SELECT doc_id AS media_id,
         {_MODALITY_SQL} AS modality,
         text, length(text) AS nb
  FROM documents
),
f AS (
  SELECT media_id, modality, text,
         unnest(range(0, (nb + 255) // 256)) AS frame_idx
  FROM m
)
SELECT media_id, modality, CAST(frame_idx AS BIGINT) AS frame_idx,
       md5(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_md5,
       CAST(length(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS BIGINT)
         AS frame_bytes
FROM f
WHERE frame_idx % 4 = 0
""",
    tags=("multimodal", "frames"),
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling: payload → 256-byte frames, keep every 4th —
    entirely JVM-side binary substring (no Python in the hot path); the
    1/4 byte reduction happens before any decoder would run."""
    frames = sample_frames(_media(spark, sf_dir), frame_bytes=256, every_k=4)
    return frames.select(
        "media_id",
        "modality",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.octet_length("frame").cast("bigint").alias("frame_bytes"),
    )


_NIB_SQL = ", ".join(
    f"CAST(length(hx) - length(replace(hx, '{format(i, 'X')}', '')) AS BIGINT)"
    f" AS nib_{format(i, 'x')}"
    for i in range(16)
)


@register(
    "mm4_nibble_histogram",
    oracle=f"""
WITH h AS (
  SELECT doc_id AS media_id,
         {_MODALITY_SQL} AS modality,
         CAST(length(text) AS BIGINT) AS n_bytes,
         hex(encode(text)) AS hx
  FROM documents
)
SELECT media_id, modality, n_bytes, {_NIB_SQL}
FROM h
""",
    tags=("multimodal", "features"),
)
def mm4_nibble_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-content feature extraction without Python: 16-bin hex-nibble
    histogram per payload, all inside whole-stage codegen."""
    return nibble_histogram(_media(spark, sf_dir))


@register(
    "mm5_frame_energy",
    oracle=f"""
WITH m AS (
  SELECT doc_id AS media_id,
         {_MODALITY_SQL} AS modality,
         text, length(text) AS nb
  FROM documents
),
f AS (
  SELECT media_id, modality,
         unnest(range(0, (nb + 255) // 256)) AS frame_idx,
         text
  FROM m
),
fr AS (
  SELECT media_id, modality, CAST(frame_idx AS BIGINT) AS frame_idx,
         substr(text, CAST(frame_idx * 256 + 1 AS INT), 256) AS frame
  FROM f
)
SELECT media_id, modality, frame_idx,
       CAST(list_sum(list_transform(range(1, length(frame) + 1),
                                    i -> ascii(substr(frame, CAST(i AS INT), 1))))
            AS BIGINT) AS energy,
       CAST(list_max(list_transform(range(1, length(frame) + 1),
                                    i -> ascii(substr(frame, CAST(i AS INT), 1))))
            AS BIGINT) AS peak
FROM fr
""",
    tags=("multimodal", "features", "audio"),
)
def mm5_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame energy profile (the audio-analysis shape: amplitude sum
    + peak per fixed-size frame), computed JVM-side over every frame's
    bytes — no Python in the loop. ASCII corpus ⇒ byte value == code
    point, so the oracle replays it over text."""
    frames = sample_frames(_media(spark, sf_dir), frame_bytes=256, every_k=1)
    # Generate barrier: decode once per frame; without it the lambda's
    # substring(decode(frame), i, 1) re-decodes per element (256x) —
    # same pitfall as dedup._tokens_barrier. 4.2 s -> 1.6 s at sf0.1.
    decoded = frames.select(
        "media_id", "modality", "frame_idx",
        F.explode(F.array(F.decode("frame", "UTF-8"))).alias("txt"),
    )
    codes = F.transform(
        F.sequence(F.lit(1), F.length("txt")),
        lambda i: F.ascii(F.substring(F.col("txt"), i, F.lit(1))),
    )
    energy = F.aggregate(codes, F.lit(0).cast("bigint"),
                         lambda acc, x: acc + x.cast("bigint"))
    peak = F.array_max(codes).cast("bigint")
    return decoded.select(
        "media_id", "modality", "frame_idx",
        energy.alias("energy"), peak.alias("peak"),
    )


@register(
    "mm6_resize_pixels",
    oracle=f"""
WITH img AS (
  SELECT doc_id AS media_id, text, length(text) AS nb,
         ascii(substr(text, 1, 1)) + 1 AS w,
         CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) ELSE 0 END + 1 AS h
  FROM documents
  WHERE {_MODALITY_SQL} = 'image'
),
px AS (
  SELECT media_id, text, nb, w, h, unnest(range(64)) AS i FROM img
),
mapped AS (
  SELECT media_id, text, nb, i // 8 AS y, i % 8 AS x,
         ((i // 8) * h // 8) * w + ((i % 8) * w // 8) AS src_idx
  FROM px
)
SELECT media_id,
       CAST(y AS BIGINT) AS y,
       CAST(x AS BIGINT) AS x,
       CAST(CASE WHEN src_idx < nb
                 THEN ascii(substr(text, CAST(src_idx + 1 AS INT), 1))
                 ELSE 0 END AS BIGINT) AS px_val
FROM mapped
""",
    tags=("multimodal", "resize", "pandas_udf"),
)
def mm6_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-grid stage (the normalize-before-embed step of a
    multimodal pipeline) verified down to individual pixels: images run
    through the Arrow-batched ``resize_images`` fake (nearest-neighbor
    onto an 8x8 grid of the fake-decoded width x height — real PIL is
    container-stubbed, see kinesis_spark.multimodal), then the 64 output
    bytes are exploded to (y, x, value) rows that the oracle recomputes
    from first principles. A mismatch in batching, byte order, padding,
    or the sampling-grid integer math fails the hash.

    Scale shape: modality filter is JVM-side before Python; the Python
    stage emits fixed 64-byte rows (output size = #images x grid,
    independent of payload size); the explode is row-local — one scan,
    no shuffle anywhere."""
    from kinesis_spark.multimodal import resize_images

    resized = resize_images(_media(spark, sf_dir), out_w=8, out_h=8, fake=True)
    i = F.explode(F.sequence(F.lit(0), F.lit(63))).alias("i")
    px = resized.select("media_id", "pixels", i)
    return px.select(
        "media_id",
        (F.col("i") / 8).cast("bigint").alias("y"),
        (F.col("i") % 8).cast("bigint").alias("x"),
        F.coalesce(
            F.ascii(F.substring("pixels", F.col("i") + 1, F.lit(1)).cast("string")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("px_val"),
    )
