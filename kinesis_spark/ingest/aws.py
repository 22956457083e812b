"""AWS-backed ``PutRecordsClient`` (reference parity: the reference calls
``kinesis.PutRecords`` on a real AWS client, kinesis/kinesis.go:221).

boto3 is an optional dependency (``pip install kinesis-spark[aws]``); the
factory import-gates with a clear error when it is absent. The retry/
batch/shed machinery above the client seam is SDK-agnostic — the adapter
only maps our ``Record`` list to boto3's ``PutRecords`` wire shape and
back (positional per-record results, which the writer's ErrorCode retry
loop consumes). Tests drive it with a fake SDK client so no AWS account
or network is needed.
"""

from __future__ import annotations

from kinesis_spark.ingest.writer import Record


class Boto3PutRecordsClient:
    """Adapter from the engine's ``PutRecordsClient`` protocol to a boto3
    ``kinesis`` client. Per-record results come back positionally (the
    Kinesis API contract), which is exactly what the writer's ErrorCode
    retry loop consumes."""

    def __init__(self, boto3_client) -> None:
        self._client = boto3_client

    def put_records(self, stream_name: str, records: list[Record]) -> list[dict]:
        resp = self._client.put_records(
            StreamName=stream_name,
            Records=[
                {"Data": r.data, "PartitionKey": r.partition_key} for r in records
            ],
        )
        return list(resp.get("Records", []))


def make_boto3_client(region_name: str | None = None, **kwargs) -> Boto3PutRecordsClient:
    """Build the real client, or raise a clear gate error when boto3 is
    absent (this container ships no AWS SDK and has no network)."""
    try:
        import boto3
    except ImportError as exc:
        raise NotImplementedError(
            "boto3 is not installed; install kinesis-spark[aws] to use the "
            "real Kinesis client, or inject any PutRecordsClient (see "
            "kinesis_spark/ingest/writer.py)"
        ) from exc
    return Boto3PutRecordsClient(boto3.client("kinesis", region_name=region_name, **kwargs))
