"""WARC reader (kinesis_spark/warc.py): framing parser, gzip members,
malformed-record policy, distributed read, HTTP text extraction."""

from __future__ import annotations

import gzip

import pytest

from kinesis_spark.warc import (
    MalformedWarcError,
    http_response_text,
    parse_warc_bytes,
    read_warc,
)


def _record(
    rtype: str = "response",
    uri: str = "https://example.com/",
    payload: bytes = b"hello",
    rec_id: str = "<urn:uuid:1>",
    extra: str = "",
) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"{extra}"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


HTTP_PAYLOAD = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>Die Katze sitzt.</html>"
)


def _warc_file() -> bytes:
    return (
        _record("warcinfo", "", b"software: test", "<urn:uuid:0>")
        + _record("response", "https://a.example/", HTTP_PAYLOAD, "<urn:uuid:1>")
        + _record("request", "https://a.example/", b"GET / HTTP/1.1\r\n\r\n", "<urn:uuid:2>")
        + _record("response", "https://b.example/", b"raw-bytes-no-http", "<urn:uuid:3>")
    )


def test_parse_warc_bytes_roundtrip():
    recs, n_bad = parse_warc_bytes(_warc_file())
    assert n_bad == 0
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "request", "response",
    ]
    assert recs[1]["target_uri"] == "https://a.example/"
    assert recs[1]["payload"] == HTTP_PAYLOAD
    assert recs[1]["content_length"] == len(HTTP_PAYLOAD)
    assert recs[3]["payload"] == b"raw-bytes-no-http"


def test_parse_warc_strict_raises_and_skip_counts():
    # corrupt the second record's Content-Length into garbage
    good = _warc_file()
    bad = good.replace(
        f"Content-Length: {len(HTTP_PAYLOAD)}".encode(), b"Content-Length: x", 1
    )
    with pytest.raises(MalformedWarcError):
        parse_warc_bytes(bad, mode="strict")
    recs, n_bad = parse_warc_bytes(bad, mode="skip")
    assert n_bad == 1
    # resyncs at the next record: warcinfo + request + second response
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]


def test_parse_warc_truncated_payload():
    full = _record(payload=b"0123456789")
    truncated = full[:-8]  # cut into the payload
    with pytest.raises(MalformedWarcError):
        parse_warc_bytes(truncated, mode="strict")
    recs, n_bad = parse_warc_bytes(truncated, mode="skip")
    assert recs == [] and n_bad == 1


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(_warc_file())
    # per-record gzip members, the .warc.gz layout
    recs = [
        _record("response", "https://gz.example/", b"gzipped body", "<urn:uuid:9>")
    ]
    (d / "seg-1.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )
    df = read_warc(spark, str(d))
    rows = {(r["path"].rsplit("/", 1)[-1], r["record_idx"]): r for r in df.collect()}
    assert len(rows) == 5
    assert bytes(rows[("seg-0.warc", 1)]["payload"]) == HTTP_PAYLOAD
    assert bytes(rows[("seg-1.warc.gz", 0)]["payload"]) == b"gzipped body"
    assert all(r["n_malformed"] == 0 for r in rows.values())


def test_http_response_text(spark, tmp_path):
    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "seg.warc").write_bytes(_warc_file())
    texts = {
        r["target_uri"]: r["text"]
        for r in http_response_text(read_warc(spark, str(d))).collect()
    }
    assert texts["https://a.example/"] == "<html>Die Katze sitzt.</html>"
    # a response without an HTTP header block falls back to the raw body
    assert texts["https://b.example/"] == "raw-bytes-no-http"


def test_read_warc_corrupt_gzip_policy(spark, tmp_path):
    """A corrupted gzip member follows the malformed policy: strict
    raises MalformedWarcError; skip emits an audit sentinel row (path +
    count, record_idx=-1) instead of silently dropping the file."""
    d = tmp_path / "crawl3"
    d.mkdir()
    (d / "good.warc").write_bytes(_warc_file())
    blob = bytearray(gzip.compress(_record(payload=b"x" * 64)))
    blob[len(blob) // 2] ^= 0xFF  # flip a byte mid-stream
    (d / "bad.warc.gz").write_bytes(bytes(blob))

    with pytest.raises(Exception) as ei:
        read_warc(spark, str(d), mode="strict").collect()
    assert "MalformedWarcError" in str(ei.value) or "corrupt gzip" in str(ei.value)

    rows = read_warc(spark, str(d), mode="skip").collect()
    bad = [r for r in rows if r["path"].endswith("bad.warc.gz")]
    assert len(bad) == 1
    assert bad[0]["record_idx"] == -1 and bad[0]["n_malformed"] == 1
    assert bad[0]["warc_type"] is None
    assert len([r for r in rows if r["path"].endswith("good.warc")]) == 4


def test_read_warc_rejects_bad_mode(spark, tmp_path):
    with pytest.raises(ValueError):
        read_warc(spark, str(tmp_path), mode="lenient")


def test_warc_to_prep_pipeline_composition(spark, tmp_path):
    """End-to-end crawl intake: WARC records → HTTP body text → the
    streaming-prep gate + exact dedup + bloom batch dedup — the
    crawl-to-corpus path assembled from shipped pieces only."""
    from pyspark.sql import functions as F

    from kinesis_spark.bloom import bloom_dedup_batch

    d = tmp_path / "crawl4"
    d.mkdir()
    body = ("the quick brown fox jumps over the lazy dog again and again "
            "until the corpus is long enough to pass the token gate")
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    ).encode()
    recs = b"".join(
        _record("response", f"https://site{i}.example/", http, f"<urn:uuid:{i}>")
        for i in range(4)  # 4 identical pages from different URIs
    ) + _record(
        "response", "https://short.example/",
        b"HTTP/1.1 200 OK\r\n\r\ntoo short", "<urn:uuid:9>",
    )
    (d / "seg.warc").write_bytes(recs)

    docs = (
        http_response_text(read_warc(spark, str(d)))
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("target_uri").alias("source"),
            "text",
        )
        .filter(F.size(F.split("text", r"\s+")) >= 10)  # the p1 token gate
        .withColumn("h", F.sha2("text", 256))
    )
    # exact dedup across the crawl (keep one of the 4 identical pages)
    kept = docs.dropDuplicates(["h"])
    assert kept.count() == 1
    # incremental: the deduped crawl batch vs an already-admitted corpus
    corpus = spark.createDataFrame([(F"{'x'}",)], "h string").select(
        F.sha2("h", 256).alias("h")
    )
    admitted = bloom_dedup_batch(corpus, kept.select("h", "source"), "h")
    assert admitted.count() == 1  # new content → admitted
    admitted2 = bloom_dedup_batch(kept.select("h"), kept.select("h", "source"), "h")
    assert admitted2.count() == 0  # already in corpus → rejected


def test_gunzip_truncated_member_is_loud():
    from kinesis_spark.warc import _gunzip_members

    full = gzip.compress(_record(payload=b"y" * 128))
    with pytest.raises(MalformedWarcError):
        _gunzip_members(full[:-10])


def test_skip_mode_keeps_good_members_before_truncated_tail(spark, tmp_path):
    """One truncated gzip member must not discard the whole file in skip
    mode: the intact member prefix survives, the bad member is counted."""
    import gzip as _gzip

    from kinesis_spark.warc import read_warc

    good1 = _gzip.compress(_record(payload=b"a" * 32))
    good2 = _gzip.compress(_record(payload=b"b" * 32))
    bad = _gzip.compress(_record(payload=b"c" * 512))[:-10]  # truncated
    p = tmp_path / "part.warc.gz"
    p.write_bytes(good1 + good2 + bad)
    df = read_warc(spark, str(p), mode="skip")
    rows = df.collect()
    recs = [r for r in rows if r.record_idx >= 0]
    assert len(recs) == 2  # the good prefix survives
    assert all(r.n_malformed == 1 for r in rows)  # ...and the loss is counted


def test_unicode_digit_content_length_is_malformed_not_crash():
    """'²'.isdigit() is True but int('²') raises — skip mode must count
    the record as malformed instead of dying on the ValueError."""
    from kinesis_spark.warc import parse_warc_bytes

    rec = _record(payload=b"x")
    rec = rec.replace(b"Content-Length: 1", "Content-Length: ²".encode())
    recs, n_bad = parse_warc_bytes(rec, mode="skip")
    assert recs == [] and n_bad == 1
