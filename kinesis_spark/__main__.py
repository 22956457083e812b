"""CLI parity with the reference (main.go): pipe bytes from stdin into a
Kinesis stream.

    cat file | python -m kinesis_spark STREAM -p PARTITION_KEY

Reference behavior mirrored (main.go:14-51): positional stream name,
``-p/--partitionKey`` flag, pump-until-EOF, SIGINT/SIGTERM → final
flush, exit 1 on error. Differences (deliberate, SURVEY.md §4 quirks):
failed puts raise instead of claiming success, drops are surfaced on
stderr with counts, and the dead 5 MiB request cap is enforced.

The AWS client is injectable (``--fake-sink PATH`` spools JSON lines
instead — the test seam; boto3 is not bundled in this environment).
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
import uuid


class SpoolSink:
    """Fake PutRecords client writing JSON lines (one file per call)."""

    def __init__(self, spool_dir: str):
        import os

        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)

    def put_records(self, stream_name, records):
        import os

        path = os.path.join(self.spool_dir, f"{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for r in records:
                f.write(
                    json.dumps(
                        {"stream": stream_name, "pk": r.partition_key, "n": len(r.data)}
                    )
                    + "\n"
                )
        return [{} for _ in records]


def _boto3_client_factory(region: str | None):
    try:
        import boto3  # noqa: F401
    except ImportError as exc:  # boto3 isn't bundled here; seam stays real
        raise SystemExit(
            "boto3 is not installed; use --fake-sink DIR to spool locally"
        ) from exc

    import boto3

    client = boto3.client("kinesis", region_name=region)

    class Boto3Sink:
        def put_records(self, stream_name, records):
            resp = client.put_records(
                StreamName=stream_name,
                Records=[
                    {"PartitionKey": r.partition_key, "Data": r.data} for r in records
                ],
            )
            return resp.get("Records", [])

    return Boto3Sink()


def main(argv: list[str] | None = None, client=None, stdin=None) -> int:
    parser = argparse.ArgumentParser(
        prog="kinesis_spark", description="stream stdin to a Kinesis stream"
    )
    parser.add_argument("stream", help="Kinesis stream name")
    parser.add_argument("-p", "--partitionKey", required=True, dest="partition_key")
    parser.add_argument("--region", default=None)
    parser.add_argument("--fake-sink", default=None, metavar="DIR",
                        help="spool PutRecords calls to DIR instead of AWS")
    parser.add_argument("--buffer-bytes", type=int, default=4 * 1024 * 1024)
    parser.add_argument("--flush-seconds", type=float, default=1.0)
    parser.add_argument("--queue-depth", type=int, default=4)
    args = parser.parse_args(argv)

    from kinesis_spark.ingest.pipeline import new_fast_writer

    if client is None:
        client = (
            SpoolSink(args.fake_sink)
            if args.fake_sink
            else _boto3_client_factory(args.region)
        )

    dropped = {"n": 0, "bytes": 0}

    def on_drop(payload: bytes) -> None:
        dropped["n"] += 1
        dropped["bytes"] += len(payload)
        print(f"dropping {len(payload)} bytes", file=sys.stderr)

    head, drop_stage = new_fast_writer(
        client,
        args.stream,
        args.partition_key,
        buffer_size=args.buffer_bytes,
        flush_period_s=args.flush_seconds,
        queue_depth=args.queue_depth,
        on_drop=on_drop,
    )

    stdin = stdin if stdin is not None else sys.stdin.buffer
    stop = {"flag": False}

    def _sig(_signo, _frame):  # SIGINT/SIGTERM → drain and exit (main.go:38-51)
        stop["flag"] = True

    signal.signal(signal.SIGINT, _sig)
    signal.signal(signal.SIGTERM, _sig)

    try:
        while not stop["flag"]:
            buf = stdin.read(32 * 1024)  # io.Copy's default copy granularity
            if not buf:
                break
            head.write(buf)
        head.close()  # final flush + drains the drop queue
        drop_stage.close()
    except Exception as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1
    if dropped["n"]:
        print(
            f"warning: dropped {dropped['n']} buffers ({dropped['bytes']} bytes)",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
