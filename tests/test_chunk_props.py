"""Property tests for chunking (SURVEY.md §5 plan item 2) + the
pure-Python vs DataFrame parity check.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_spark.ingest.chunker import chunk_bytes, chunk_df


@given(payload=st.binary(max_size=4096), chunk_size=st.integers(1, 512))
def test_chunk_roundtrip(payload, chunk_size):
    chunks = chunk_bytes(payload, chunk_size)
    assert b"".join(chunks) == payload
    assert all(len(c) <= chunk_size for c in chunks)
    expected_n = (len(payload) + chunk_size - 1) // chunk_size
    assert len(chunks) == expected_n
    # all but last are exactly chunk_size
    assert all(len(c) == chunk_size for c in chunks[:-1])


@settings(deadline=None, max_examples=10)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=8),
    chunk_size=st.integers(1, 64),
)
def test_chunk_df_matches_python(spark, payloads, chunk_size):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id int, data binary"
    )
    rows = chunk_df(df, chunk_size).orderBy("id", "chunk_index").collect()
    got: dict[int, list[bytes]] = {}
    for r in rows:
        got.setdefault(r.id, []).append(bytes(r.chunk))
    for i, p in enumerate(payloads):
        assert got.get(i, []) == chunk_bytes(p, chunk_size), (i, p, chunk_size)
