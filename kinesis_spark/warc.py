"""WARC (Web ARChive, ISO 28500) reader — the Common Crawl ingestion
surface: LLM corpus pipelines start from WARC files, and this module
turns a directory of them into a DataFrame of records.

Format (public spec, WARC/1.0; also the shape `warcio` emits):

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: https://example.com/\\r\\n
    Content-Length: <n>\\r\\n
    ...more headers...\\r\\n
    \\r\\n
    <n payload bytes>
    \\r\\n\\r\\n            (record terminator)

Architecture: ``spark.read.format("binaryFile")`` scans whole files in
parallel (one task per file — the WARC unit of parallelism, exactly how
Common Crawl shards its 1 GB segments), and an Arrow-batched
``mapInPandas`` splits each file's bytes into records. Parsing is pure
per-file work — no shuffle anywhere; downstream filters on the (small)
header columns happen before anyone touches ``payload``.

Real WARCs are usually gzipped per-record (``.warc.gz`` = concatenated
gzip members). ``read_warc`` handles that too: member boundaries are
found by decompressing sequentially — the same single pass a production
reader does, since per-record gzip makes the format splittable only at
member boundaries.

Malformed-record policy is explicit, like sources.read_json:
``mode="strict"`` raises on the first bad record (pipeline-breakage
loud), ``mode="skip"`` drops bad records but COUNTS them per file in
the ``n_malformed`` column of every emitted row (quarantine-and-audit,
never silent).
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_malformed", T.LongType()),
    ]
)


class MalformedWarcError(ValueError):
    """A record violated WARC/1.0 framing (strict mode)."""


def parse_warc_bytes(
    content: bytes, mode: str = "strict"
) -> tuple[list[dict], int]:
    """Split one WARC file's bytes into records. Returns
    ``(records, n_malformed)``; in strict mode a malformed record raises
    :class:`MalformedWarcError` instead of counting."""
    if mode not in ("strict", "skip"):
        raise ValueError(f"mode must be 'strict' or 'skip', got {mode!r}")
    records: list[dict] = []
    n_bad = 0
    pos = 0
    n = len(content)
    while pos < n:
        # tolerate inter-record padding newlines
        while pos < n and content[pos : pos + 1] in (b"\r", b"\n"):
            pos += 2 if content[pos : pos + 2] == b"\r\n" else 1
        if pos >= n:
            break
        head_end = content.find(b"\r\n\r\n", pos)
        version_line_end = content.find(b"\r\n", pos)
        version = content[pos:version_line_end] if version_line_end != -1 else b""
        if head_end == -1 or not version.startswith(b"WARC/"):
            if mode == "strict":
                raise MalformedWarcError(
                    f"no WARC header block at byte {pos} "
                    f"(leading bytes: {content[pos:pos + 20]!r})"
                )
            n_bad += 1
            break  # cannot resync without a header block: stop the file
        headers: dict[str, str] = {}
        ok = True
        for line in content[version_line_end + 2 : head_end].split(b"\r\n"):
            if not line:
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                ok = False
                break
            headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
                "utf-8", "replace"
            ).strip()
        length_s = headers.get("content-length")
        # isascii+isdigit, not bare isdigit: Unicode digits (e.g. '²')
        # pass isdigit but make int() raise — skip mode must count such
        # a record as malformed, not die on an uncaught ValueError
        if (
            not ok
            or length_s is None
            or not (length_s.isascii() and length_s.isdigit())
        ):
            if mode == "strict":
                raise MalformedWarcError(
                    f"bad headers for record at byte {pos}: "
                    f"{'unparseable line' if not ok else 'missing/invalid Content-Length'}"
                )
            n_bad += 1
            # resync: look for the next version line
            nxt = content.find(b"WARC/", head_end)
            pos = nxt if nxt != -1 else n
            continue
        length = int(length_s)
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            if mode == "strict":
                raise MalformedWarcError(
                    f"truncated payload at byte {pos}: "
                    f"Content-Length {length} overruns the file"
                )
            n_bad += 1
            break
        records.append(
            {
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "record_id": headers.get("warc-record-id"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": length,
                "payload": content[body_start:body_end],
            }
        )
        pos = body_end
    return records, n_bad


def _gunzip_members(data: bytes, mode: str = "strict") -> tuple[bytes, int]:
    """Decompress concatenated gzip members (the .warc.gz layout) into
    one plain byte stream; returns ``(bytes, n_bad_members)``. Slices
    through a memoryview — zero-copy per member, so a 50k-member Common
    Crawl segment costs one linear pass, not O(members x filesize)
    buffer copies.

    A corrupt/truncated member raises :class:`MalformedWarcError` in
    strict mode; in skip mode the GOOD PREFIX survives with the bad
    member counted — a cut-off download of a 50k-member segment must
    not silently discard the 50k-1 intact members (decompression cannot
    resync past a corrupt member, so the tail after it is lost and the
    count says so)."""
    out = io.BytesIO()
    view = memoryview(data)
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            chunk = d.decompress(view[pos:])
        except zlib.error as exc:
            if mode == "strict":
                raise MalformedWarcError(
                    f"corrupt gzip member at byte {pos}: {exc}"
                ) from exc
            return out.getvalue(), 1
        if not d.eof:
            # zlib returns partial output WITHOUT error on a truncated
            # stream — a cut-off download must be loud, not a silently
            # shorter archive
            if mode == "strict":
                raise MalformedWarcError(
                    f"truncated gzip member at byte {pos} (stream ended mid-member)"
                )
            return out.getvalue(), 1
        out.write(chunk)
        consumed = (len(data) - pos) - len(d.unused_data)
        if consumed <= 0:
            if mode == "strict":
                raise MalformedWarcError(
                    f"gzip member at byte {pos} did not advance"
                )
            return out.getvalue(), 1
        pos += consumed
    return out.getvalue(), 0


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    mode: str = "strict",
    path_glob: str = "*.warc*",
) -> DataFrame:
    """Directory (or glob) of ``.warc`` / ``.warc.gz`` files → one row
    per WARC record, parsed executor-side with Arrow batching. One task
    per file; header columns are tiny, ``payload`` is the binary body.
    """
    if mode not in ("strict", "skip"):
        raise ValueError(f"mode must be 'strict' or 'skip', got {mode!r}")
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path", "content")
    )

    def parse(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r["content"])
                try:
                    gz_bad = 0
                    if r["path"].endswith(".gz") or raw[:2] == b"\x1f\x8b":
                        # skip mode keeps the good member prefix and
                        # counts the bad member instead of losing the
                        # whole file to one truncated tail
                        raw, gz_bad = _gunzip_members(raw, mode=mode)
                    recs, n_bad = parse_warc_bytes(raw, mode=mode)
                    n_bad += gz_bad
                except MalformedWarcError:
                    if mode == "strict":
                        raise
                    recs, n_bad = [], 1
                for i, rec in enumerate(recs):
                    rows.append(
                        {
                            "path": r["path"],
                            "record_idx": i,
                            "n_malformed": n_bad,
                            **rec,
                        }
                    )
                if not recs and n_bad:
                    # audit sentinel: a wholly-malformed file must not
                    # vanish silently in skip mode — one null-record row
                    # carries its path and count
                    rows.append(
                        {
                            "path": r["path"],
                            "record_idx": -1,
                            "n_malformed": n_bad,
                        }
                    )
            cols = [f.name for f in WARC_SCHEMA.fields]
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, WARC_SCHEMA)


def http_response_text(df: DataFrame) -> DataFrame:
    """Convenience projection for `response` records whose payload is an
    HTTP response: strip the HTTP header block and decode the body as
    UTF-8 (lossy) — the first step of every crawl-to-text pipeline.
    JVM-side expressions only (no UDF): locate the header/body split and
    substring the decoded payload — computed once, Column API only."""
    raw = F.col("payload").cast("string")
    body_crlf = F.instr(raw, "\r\n\r\n")
    # bare-LF fallback: lenient servers separate headers with \n\n; a
    # CRLF-terminated header block contains no bare \n\n, so the CRLF
    # arm always wins when both match
    body_lf = F.instr(raw, "\n\n")
    text = (
        F.when(body_crlf > 0, F.substring(raw, body_crlf + 4, F.length(raw)))
        .when(body_lf > 0, F.substring(raw, body_lf + 2, F.length(raw)))
        .otherwise(raw)
    )
    return df.filter(F.col("warc_type") == "response").select(
        "path",
        "record_idx",
        "target_uri",
        text.alias("text"),
    )
