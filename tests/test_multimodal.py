"""Multimodal library: binary payload plumbing (frame sampling, decode
stub, Arrow round-trip) beyond the registry-level oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    media_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_table(load_table(spark, sf_dir, "documents")).cache()


def test_every_frame_reassembles_payload(spark, media):
    """every_k=1 must partition the payload exactly: concatenating the
    frames in order reproduces the original bytes."""
    frames = sample_frames(media, frame_bytes=128, every_k=1)
    rebuilt = (
        frames.groupBy("media_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("frame_idx", F.hex("frame").alias("hx")))
                    ),
                    lambda s: s["hx"],
                )
            , "").alias("hx")
        )
    )
    orig = media.select("media_id", F.hex("payload").alias("want"))
    bad = (
        rebuilt.join(orig, "media_id")
        .filter(F.col("hx") != F.col("want"))
        .count()
    )
    assert bad == 0


def test_frame_sample_keeps_every_kth(media):
    frames = sample_frames(media, frame_bytes=64, every_k=3)
    assert frames.filter(F.col("frame_idx") % 3 != 0).count() == 0
    # first frame always sampled → at least one frame per payload
    assert frames.select("media_id").distinct().count() == media.count()


def test_decode_real_path_is_stubbed(media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        decode_media(media, fake=False).limit(1).collect()
    assert "NotImplementedError" in str(exc_info.value)


def test_decode_fake_schema_and_determinism(media):
    out = decode_media(media, fake=True)
    assert out.schema == DECODED_SCHEMA
    a = {r["media_id"]: r["checksum"] for r in out.collect()}
    b = {r["media_id"]: r["checksum"] for r in decode_media(media, fake=True).collect()}
    assert a == b and len(a) == media.count()


def test_resize_real_path_is_stubbed(media):
    from kinesis_spark.multimodal import resize_images

    df = resize_images(media)
    with pytest.raises(Exception, match="PIL|NotImplemented"):
        df.collect()


def test_resize_fake_fixed_grid_and_determinism(media):
    """Fake resize: images only, fixed out_w*out_h output bytes, twice
    the same answer (pure function of the payload)."""
    from kinesis_spark.multimodal import resize_images

    out = resize_images(media, out_w=4, out_h=3, fake=True)
    rows = out.collect()
    n_images = media.filter(F.col("modality") == "image").count()
    assert len(rows) == n_images > 0
    assert all(r.out_w == 4 and r.out_h == 3 for r in rows)
    assert all(len(bytes(r.pixels)) == 12 for r in rows)
    again = {r.media_id: bytes(r.pixels) for r in out.collect()}
    assert {r.media_id: bytes(r.pixels) for r in rows} == again


def test_resize_fake_nearest_neighbor_values(spark):
    """Pin the sampling math on a hand-computed payload: a fake 3x2
    'image' (w=b[0]+1=3, h=b[1]+1=2) resized to 2x1 picks bytes at
    (sy=0, sx=0) and (sy=0, sx=1)."""
    from kinesis_spark.multimodal import resize_images

    payload = bytes([2, 1, 10, 20, 30, 40])  # w=3, h=2; pixels row-major
    df = spark.createDataFrame(
        [(1, "image", payload, len(payload))],
        "media_id LONG, modality STRING, payload BINARY, n_bytes LONG",
    )
    r = resize_images(df, out_w=2, out_h=1, fake=True).collect()[0]
    # y=0 -> sy=0; x=0 -> sx=0 -> b[0]=2 ; x=1 -> sx=1 -> b[1]=1
    assert bytes(r.pixels) == bytes([2, 1])


def test_sample_frames_empty_payload_yields_no_rows(spark):
    """A zero-byte payload must produce zero frame rows (sequence(0,-1)
    would otherwise fabricate a phantom frame_idx=0)."""
    from pyspark.sql import functions as F

    from kinesis_spark.multimodal import sample_frames

    media = spark.createDataFrame(
        [(1, "image", bytearray(b""), 0), (2, "image", bytearray(b"abcd"), 4)],
        "media_id long, modality string, payload binary, n_bytes long",
    )
    got = sample_frames(media, frame_bytes=2, every_k=1)
    rows = got.select("media_id", "frame_idx").collect()
    assert all(r["media_id"] == 2 for r in rows)
    assert sorted(r["frame_idx"] for r in rows) == [0, 1]


def test_null_payload_yields_null_features_not_crash(spark):
    """MEDIA_SCHEMA allows null payloads: the fake decode and resize
    must emit null features for them instead of dying in the Python
    worker with TypeError(len(None))."""
    from kinesis_spark.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        resize_images,
    )

    media = spark.createDataFrame(
        [(1, "image", b"\x05\x03abcdef", 8), (2, "image", None, None)],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in decode_media(media, fake=True).collect()}
    assert rows[1].checksum is not None and rows[1].n_bytes == 8
    assert rows[2].checksum is None
    assert rows[2].n_bytes is None and rows[2].width is None

    rz = {r.media_id: r for r in resize_images(media, fake=True).collect()}
    assert rz[1].pixels is not None
    assert rz[2].pixels is None


def test_dhash_bright_invariance_and_crop_decorrelation(media):
    """The pHash protocol's two contracts, asserted at the library level:
    (a) the order-preserving `bright` transform (+16 per cell, no clamp
    on ASCII) leaves the dHash EXACTLY unchanged for every image even
    though every payload byte differs; (b) the `crop` transform moves
    content to different grid fractions, so most crop hashes differ from
    their original by more than the mm7 verify threshold."""
    from kinesis_spark.multimodal import dhash_images
    from kinesis_spark.queries.multimodal import MM7_HAMMING_MAX

    sigs = dhash_images(
        media.filter(F.col("modality") == "image"),
        variants=("orig", "bright", "crop"),
    )
    wide = (
        sigs.groupBy("media_id")
        .pivot("variant", ["orig", "bright", "crop"])
        .agg(F.first(F.struct("h0", "h1", "h2", "h3")))
    ).collect()
    assert wide, "fixture should contain images"

    def ham(a, b):
        return sum(bin(a[f"h{i}"] ^ b[f"h{i}"]).count("1") for i in range(4))

    far = 0
    for r in wide:
        assert r.bright is not None and ham(r.orig, r.bright) == 0, r.media_id
        if r.crop is not None and ham(r.orig, r.crop) > MM7_HAMMING_MAX:
            far += 1
    with_crop = sum(1 for r in wide if r.crop is not None)
    assert far >= 0.8 * with_crop, (far, with_crop)


def test_dhash_min_bytes_filter(spark):
    """Payloads below a variant's minimum are dropped per-variant, not
    globally: a 3-byte image hashes as orig/bright but has no crop row
    (crop needs 4 raw bytes for a 2-byte effective payload)."""
    from kinesis_spark.multimodal import dhash_images

    rows = [(1, "image", bytearray(b"abc"), 3), (2, "image", bytearray(b"a"), 1)]
    df = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, n_bytes long"
    )
    got = {
        (r.media_id, r.variant)
        for r in dhash_images(df, variants=("orig", "bright", "crop")).collect()
    }
    assert got == {(1, "orig"), (1, "bright")}


def test_mm9_every_full_clip_identifies_its_source(spark, sf_dir):
    """The fingerprint matcher's defining property: a clip whose 8 keys
    all exist re-identifies its OWN source with all votes stacked on
    one alignment, at exactly its clip-start offset."""
    from kinesis_spark.queries import get_registry

    rows = (
        get_registry()["mm9_clip_fingerprint_match"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    full_self = [
        r for r in rows if r.clip_id == r.match_media and r.votes == 8
    ]
    assert len(full_self) >= 35, len(full_self)  # fixture has ~42+
    # every full-vote self-matcher aligns at its clip start; repeated
    # content may legitimately add FURTHER full-vote alignments (a loop
    # aligns at every period), so assert containment, not uniqueness
    by_clip: dict[int, set] = {}
    for r in full_self:
        by_clip.setdefault(r.clip_id, set()).add(r.offset)
    for clip_id, offsets in by_clip.items():
        assert clip_id % 4 + 1 in offsets, (clip_id, offsets)
    # no alignment can exceed the clip's key count
    assert all(r.votes <= 8 for r in rows)


def test_mm10_planted_shared_segment_surfaces_at_expected_lag(spark, tmp_path):
    """mm10's defining property on a planted corpus: two videos sharing
    a frame-aligned 600-byte segment (video B carries it 10 frames
    later than video A) must surface as a pair at exactly lag 10 with
    enough aligned keys, and unrelated videos must not pair."""
    from kinesis_spark.queries import get_registry

    seg = "".join(chr(65 + (i * 7 + i // 9) % 26) for i in range(600))
    tail_a = "".join(chr(97 + (i * 5) % 26) for i in range(96))
    prefix_b = "".join(chr(97 + (i * 11 + 3) % 26) for i in range(160))
    tail_b = "".join(chr(97 + (i * 13 + 7) % 26) for i in range(64))
    other = "".join(chr(65 + (i * 17 + 5) % 26) for i in range(700))
    rows = [  # doc_id % 3 == 2 -> video modality
        (2, seg + tail_a, "en", "s", len(seg + tail_a)),
        (5, prefix_b + seg + tail_b, "en", "s", len(prefix_b + seg + tail_b)),
        (8, other, "en", "s", len(other)),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = (
        get_registry()["mm10_shared_segment_pairs"].spark_fn(spark, sf).collect()
    )
    hits = [r for r in got if r.media_a == 2 and r.media_b == 5]
    # the 160-byte prefix = 10 frames, so B's segment keys sit at +10
    assert any(r.lag == 10 and r.n_aligned >= 6 for r in hits), got
    assert not any(8 in (r.media_a, r.media_b) for r in got), got
