"""Port of the reference's three golden tests
(/root/reference/kinesis/kinesis_test.go:12-91): expected PutRecords calls
against a fake client, with shrunk limits.
"""

from __future__ import annotations

from kinesis_spark.ingest.writer import PutRecordsError, Record, Writer


class FakeClient:
    """Records every call; the kinesisClient seam (kinesis/kinesis.go:171-173)."""

    def __init__(self, fail_codes: list[list[str | None]] | None = None):
        self.calls: list[tuple[str, list[Record]]] = []
        self._fail_codes = fail_codes or []

    def put_records(self, stream_name, records):
        self.calls.append((stream_name, list(records)))
        if self._fail_codes:
            codes = self._fail_codes.pop(0)
            return [{"ErrorCode": c} if c else {} for c in codes]
        return [{} for _ in records]


def test_write_small():
    # kinesis_test.go:12-34 — 1-byte payload, one call with one record
    c = FakeClient()
    w = Writer(c, "stream", "key", record_size_limit=1000, put_records_limit=2)
    assert w.write(b"a") == 1
    assert c.calls == [("stream", [Record("key", b"a")])]


def test_write_large():
    # kinesis_test.go:36-59 — chunk size = 5 - len("key") = 2
    c = FakeClient()
    w = Writer(c, "stream", "key", record_size_limit=5, put_records_limit=2)
    assert w.write(b"abcd") == 4
    assert c.calls == [("stream", [Record("key", b"ab"), Record("key", b"cd")])]


def test_write_multiple():
    # kinesis_test.go:61-91 — 3 chunks at batch limit 2 → two calls
    c = FakeClient()
    w = Writer(c, "stream", "key", record_size_limit=5, put_records_limit=2)
    assert w.write(b"abcde") == 5
    assert c.calls == [
        ("stream", [Record("key", b"ab"), Record("key", b"cd")]),
        ("stream", [Record("key", b"e")]),
    ]


def test_empty_write_is_noop():
    # Deliberate divergence from the reference (SURVEY.md §4 quirk 6):
    # empty payload → no records, no calls.
    c = FakeClient()
    w = Writer(c, "stream", "key")
    assert w.write(b"") == 0
    assert c.calls == []


def test_request_size_limit_enforced():
    # The reference never enforces its 5 MiB request cap (kinesis.go:31);
    # we do: 3 records of 4 bytes (key "k" + 3 data) under a 9-byte cap
    # → batches of 2.
    c = FakeClient()
    w = Writer(
        c,
        "stream",
        "k",
        record_size_limit=4,
        put_records_limit=500,
        put_records_size_limit=9,
    )
    w.write(b"aaabbbccc")
    assert [len(recs) for _, recs in c.calls] == [2, 1]


def test_error_code_retry_then_success():
    # At-least-once upgrade: entries with ErrorCode are retried.
    c = FakeClient(fail_codes=[["Throttled", None], [None]])
    w = Writer(c, "stream", "key", record_size_limit=5, put_records_limit=2)
    w.write(b"abcd")
    # second call retries only the failed record
    assert [len(recs) for _, recs in c.calls] == [2, 1]
    assert c.calls[1][1] == [Record("key", b"ab")]


def test_error_code_exhausts_retries():
    import pytest

    c = FakeClient(fail_codes=[["X"], ["X"], ["X"], ["X"]])
    w = Writer(c, "s", "key", record_size_limit=1000, max_retries=3)
    with pytest.raises(PutRecordsError):
        w.write(b"a")
