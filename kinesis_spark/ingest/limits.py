"""The reference's catalog constants (kinesis/kinesis.go:19-35).

The reference *declares* per-request size and per-shard rate limits but
never enforces them (SURVEY.md §1.3 — "dead config"); this engine enforces
all of them, defaulting on.
"""

# Max records per PutRecords request (kinesis/kinesis.go:21; enforced :219).
PUT_RECORDS_LIMIT = 500

# Max bytes per record, partition key included (kinesis/kinesis.go:34;
# chunk size = this minus len(partition_key), :201-205).
RECORD_SIZE_LIMIT = 1024 * 1024

# Max bytes per PutRecords request (kinesis/kinesis.go:31 — declared, never
# enforced there; enforced here as a second batch-flush condition).
PUT_RECORDS_SIZE_LIMIT = 5 * 1024 * 1024

# Service envelope per shard (kinesis/kinesis.go:25,28 — declared, never
# enforced there; optional throttle here).
SHARD_RECORDS_RATE_LIMIT = 1000  # records / s / shard
SHARD_BYTES_RATE_LIMIT = 1024 * 1024  # bytes / s / shard

# NewFastWriter policy: 4 MiB buffer, 1 s flush (kinesis/kinesis.go:40-42,56).
BUFFER_SIZE = 4 * 1024 * 1024
FLUSH_PERIOD_S = 1.0

# DropWriter bounded queue depth (kinesis/kinesis.go:50-52,120).
DROP_QUEUE_DEPTH = 4
