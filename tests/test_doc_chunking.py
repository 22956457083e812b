"""t20/p14 semantic properties the oracle hash can't articulate on its
own: the chunk schedule's coverage/overlap contract and the mixture
table's conservation laws."""

from __future__ import annotations

import math

from kinesis_spark.queries import get_registry
from kinesis_spark.queries.textstats import CHUNK_STRIDE, CHUNK_TOKENS

REGISTRY = get_registry()
SF = "/root/testdata/sf0.001"


def test_t20_schedule_covers_every_token(spark):
    """Every document's token stream is fully covered: chunk offsets
    advance by the stride, the last chunk reaches the final token, and
    no chunk is empty (a short document still emits one chunk)."""
    rows = (
        REGISTRY["t20_doc_chunking"]
        .spark_fn(spark, SF)
        .select("doc_id", "chunk_idx", "n_chunk_tokens")
        .collect()
    )
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert per_doc
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        idxs = [c.chunk_idx for c in chunks]
        assert idxs == list(range(len(chunks))), doc_id
        assert all(c.n_chunk_tokens >= 1 for c in chunks), doc_id
        # all but the last chunk are full windows
        assert all(
            c.n_chunk_tokens == CHUNK_TOKENS for c in chunks[:-1]
        ), doc_id
        last = chunks[-1]
        n_tokens = last.chunk_idx * CHUNK_STRIDE + last.n_chunk_tokens
        # the schedule 1 + max(0, ceil((n - W) / S)) reproduces the
        # observed chunk count — i.e. the last window really is the one
        # that reaches the final token, no gap and no extra window
        expect = 1 + max(
            0, math.ceil((n_tokens - CHUNK_TOKENS) / CHUNK_STRIDE)
        )
        assert len(chunks) == expect, (doc_id, n_tokens, len(chunks))


def test_t20_consecutive_chunks_overlap(spark):
    """Consecutive full chunks share exactly W - S tokens of context:
    the tail of chunk i equals the head of chunk i+1."""
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    rows = (
        REGISTRY["t20_doc_chunking"]
        .spark_fn(spark, SF)
        .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
        .collect()
    )
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    multi = {d: cs for d, cs in per_doc.items() if len(cs) > 1}
    assert multi, "fixture corpus must contain multi-chunk documents"
    for doc_id, chunks in multi.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        for a, b in zip(chunks, chunks[1:]):
            tail = a.chunk_text.split(" ")[CHUNK_STRIDE:]
            head = b.chunk_text.split(" ")[: len(tail)]
            assert tail == head and len(tail) <= overlap, (
                doc_id,
                a.chunk_idx,
            )


def test_p14_conservation(spark):
    """Mixture weights sum to 1 and expected tokens sum to the corpus
    total (the table redistributes the budget, never invents tokens);
    the temperature flattens: every source's weight is strictly between
    min(share, uniform) and max(share, uniform) unless share is already
    uniform."""
    rows = REGISTRY["p14_temperature_mixture"].spark_fn(spark, SF).collect()
    assert rows
    total = sum(r.n_tokens for r in rows)
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.expected_tokens for r in rows) - total) < total * 1e-9
    uniform = 1.0 / len(rows)
    for r in rows:
        share = r.n_tokens / total
        lo, hi = sorted((share, uniform))
        if abs(share - uniform) > 1e-6:
            assert lo - 1e-9 < r.mix_weight < hi + 1e-9, r.source
        assert abs(r.epochs - r.expected_tokens / r.n_tokens) < 1e-9


def test_d22_consistent_with_t20(spark):
    """d22's per-source chunk counts tie out against t20's chunk
    relation exactly; duplicate token volume never exceeds the total;
    and the replica-built fixture corpus (near-dup groups) must show a
    nonzero chunk-level dup rate somewhere — otherwise the report is
    vacuous on the data it exists for."""
    t20 = REGISTRY["t20_doc_chunking"].spark_fn(spark, SF)
    rep = REGISTRY["d22_chunk_dedup_report"].spark_fn(spark, SF).collect()
    assert sum(r.n_chunks for r in rep) == t20.count()
    assert all(0 <= r.tokens_dropped <= r.tokens_total for r in rep)
    assert all(0.0 <= r.dup_rate <= 1.0 for r in rep)
    assert any(r.dup_chunks > 0 for r in rep)
