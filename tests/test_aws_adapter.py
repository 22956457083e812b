"""Boto3 adapter: wire-shape mapping and the import gate, exercised with
a fake SDK client (boto3 itself is absent in this container)."""

from __future__ import annotations

import pytest

from kinesis_spark.ingest.aws import Boto3PutRecordsClient, make_boto3_client
from kinesis_spark.ingest.writer import Record, Writer


class FakeBoto3Kinesis:
    """Mimics botocore's put_records response shape, failing any record
    whose payload contains b'bad' once (ErrorCode set positionally)."""

    def __init__(self):
        self.calls: list[dict] = []
        self._failed_once: set[bytes] = set()

    def put_records(self, *, StreamName, Records):
        self.calls.append({"StreamName": StreamName, "Records": Records})
        out = []
        for entry in Records:
            data = entry["Data"]
            if b"bad" in data and data not in self._failed_once:
                self._failed_once.add(data)
                out.append(
                    {"ErrorCode": "ProvisionedThroughputExceededException",
                     "ErrorMessage": "slow down"}
                )
            else:
                out.append({"SequenceNumber": "1", "ShardId": "shard-0"})
        return {"FailedRecordCount": sum(1 for r in out if "ErrorCode" in r),
                "Records": out}


def test_adapter_maps_wire_shape_and_positional_results():
    fake = FakeBoto3Kinesis()
    client = Boto3PutRecordsClient(fake)
    recs = [Record(partition_key="pk", data=b"a"), Record(partition_key="pk", data=b"b")]
    results = client.put_records("stream-x", recs)
    assert len(results) == 2 and all("SequenceNumber" in r for r in results)
    sent = fake.calls[0]
    assert sent["StreamName"] == "stream-x"
    assert sent["Records"] == [
        {"Data": b"a", "PartitionKey": "pk"},
        {"Data": b"b", "PartitionKey": "pk"},
    ]


def test_writer_error_code_retry_through_adapter():
    """The writer's ErrorCode retry loop works unchanged through the
    adapter: a record failing once succeeds on retry, at-least-once."""
    fake = FakeBoto3Kinesis()
    w = Writer(Boto3PutRecordsClient(fake), "stream-x", "pk")
    w.write(b"good payload\n")  # Writer puts per write call (reference parity)
    w.write(b"bad payload\n")
    assert len(fake.calls) >= 3  # two writes + the ErrorCode retry
    retried = [e["Data"] for c in fake.calls[1:] for e in c["Records"]]
    assert any(b"bad" in d for d in retried)


def test_factory_builds_or_gates():
    """With boto3 present the factory returns a ready adapter (no AWS
    call is made — boto3 clients are lazy); without it, a clear gate."""
    try:
        import boto3  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="boto3"):
            make_boto3_client(region_name="us-east-1")
    else:
        client = make_boto3_client(region_name="us-east-1")
        assert isinstance(client, Boto3PutRecordsClient)
