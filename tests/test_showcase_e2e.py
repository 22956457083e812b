"""Integration showcase (VERDICT r5 task 6): the production pipeline
end-to-end, every seam a real module —

    spool stream (producer puts documents as JSON records)
      → leased KCL-mode consumer (streaming/kinesis_source.py +
        ingest/leases.py; consumer A dies mid-stream, B claims its
        shards and resumes from the lease checkpoint)
      → streaming prep intake (gate → RocksDB-backed replay-shield
        dropDuplicates → foreachBatch admission against the DURABLE
        bloom/hash store and MinHash band index — bloom.py +
        prep_index layering; the durable index, not query state, is
        what survives the consumer swap)
      → transactional append into a (lang, source)-partitioned txstore
        (multi-level tx_append — one atomic commit per micro-batch)
      → incremental per-(lang, source) rollup refresh (tx_upsert keyed
        on the rollup row — only touched rows rewritten)
      → leakage-free split + training-shard writer (shards.py), with
        byte-deterministic output proven by writing twice.

The admission semantics are replayed by a pure-Python oracle (greedy in
arrival order: exact text dedup vs everything admitted before, then
conservative shared-band LSH drop), so the end state is asserted
exactly, not just shaped. At-least-once delivery is exercised for real:
consumer B replays consumer A's final (never lease-checkpointed) batch
AND the producer re-puts three wave-1 records — the durable hash store
must swallow every replay without double-admitting a document."""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from kinesis_spark.ingest.writer import Record
from kinesis_spark.io import load_table
from kinesis_spark.pipeline import IntakeConfig, run_intake, takeover
from kinesis_spark.queries.pipelines import _KEEP_LANGS, _MIN_TOKENS
from kinesis_spark.streaming.spool import SpoolStreamClient
from kinesis_spark.streaming.intake import PrepIntakeSink
from kinesis_spark.txstore import tx_current_manifest, tx_read

STREAM = "prod-intake"


def _corpus_rows(spark, sf_dir) -> list[dict]:
    """~1/3 of sf0.001 documents (gate-eligible langs) + injected exact
    duplicates under HIGHER doc_ids, sorted by doc_id so the canonical
    copy always arrives first."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin(*_KEEP_LANGS) & (F.col("doc_id") % 3 == 0))
        .select("doc_id", "text", "lang", "source")
        .orderBy("doc_id")
        .limit(120)
    )
    rows = [r.asDict() for r in d.collect()]
    for i, src in enumerate(rows[:10]):  # exact dups, higher ids
        rows.append(
            {
                "doc_id": 1_000_000 + i,
                "text": src["text"],
                "lang": src["lang"],
                "source": src["source"],
            }
        )
    return sorted(rows, key=lambda r: r["doc_id"])


def _put_docs(spool: str, rows: list[dict]) -> None:
    recs = [
        Record(
            data=json.dumps(r, sort_keys=True).encode(),
            partition_key=f"pk{r['doc_id'] % 4}",  # several shards
        )
        for r in rows
    ]
    SpoolStreamClient(spool).put_records(STREAM, recs)


# ---------------------------------------------------------------------------
# the intake sink: the library's PrepIntakeSink + per-batch tracking
# ---------------------------------------------------------------------------


class IntakeSink(PrepIntakeSink):
    """The production sink (streaming/intake.py — admission vs the
    durable hash/band index, atomic tx_append, incremental rollup),
    plus per-batch doc_id tracking so the test can assert that replays
    were genuinely DELIVERED and then deduplicated, not just absent."""

    def __init__(self, spark, cfg: IntakeConfig):
        super().__init__(
            spark,
            hashes_dir=cfg.hashes,
            bands_dir=cfg.bands,
            store_root=cfg.corpus,
            rollup_root=cfg.rollup,
            partition_cols=cfg.partition_cols,
        )
        self.seen_doc_ids: list[set[int]] = []  # per-batch, for assertions

    def process_batch(self, batch, batch_id: int) -> None:
        self.seen_doc_ids.append(
            {r.doc_id for r in batch.select("doc_id").collect()}
        )
        super().process_batch(batch, batch_id)


# ---------------------------------------------------------------------------
# the pure-Python admission oracle
# ---------------------------------------------------------------------------


def _oracle_admitted(spark, waves: list[list[dict]]) -> set[int]:
    """Greedy replay of the sink's admission rules in arrival order.
    Band keys come from the SAME library expression the sink uses."""
    from kinesis_spark.streaming.neardup import band_keys

    all_rows = [r for wave in waves for r in wave]
    uniq = {r["doc_id"]: r for r in all_rows}
    bdf = band_keys(
        spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in uniq.values()],
            "doc_id long, text string",
        )
    )
    bands_of: dict[int, set[str]] = {}
    for r in bdf.collect():
        bands_of.setdefault(r.doc_id, set()).add(r.band_key)

    admitted: set[int] = set()
    seen_hashes: set[str] = set()
    index_bands: set[str] = set()
    for wave in waves:
        gated = sorted(
            (
                r
                for r in wave
                if r["lang"] in _KEEP_LANGS
                and len([t for t in __import__("re").split(
                    r"[ \t\n\f\r\x0B]+", r["text"]) if t]) >= _MIN_TOKENS
            ),
            key=lambda r: r["doc_id"],
        )
        # batch-local exact dedup + store check
        batch_first: dict[str, dict] = {}
        for r in gated:
            hh = hashlib.sha256(r["text"].encode()).hexdigest()
            if hh not in batch_first:
                batch_first[hh] = r
        fresh = [
            (hh, r) for hh, r in batch_first.items() if hh not in seen_hashes
        ]
        # conservative LSH: vs index, or vs any LOWER-id fresh batch doc
        fresh_ids = sorted(r["doc_id"] for _, r in fresh)
        batch_admitted = []
        for hh, r in sorted(fresh, key=lambda x: x[1]["doc_id"]):
            bset = bands_of.get(r["doc_id"], set())
            if bset & index_bands:
                continue
            lower_bands = set().union(
                *(
                    bands_of.get(i, set())
                    for i in fresh_ids
                    if i < r["doc_id"]
                )
            ) if len(fresh_ids) > 1 else set()
            if bset & lower_bands:
                continue
            batch_admitted.append((hh, r))
        for hh, r in batch_admitted:
            admitted.add(r["doc_id"])
            seen_hashes.add(hh)
            index_bands |= bands_of.get(r["doc_id"], set())
        # non-admitted fresh hashes are NOT in the store (only admitted
        # hashes persist), matching the sink
    return admitted


def _shard_digest(out_dir: str) -> dict[str, list[str]]:
    """(split, shard) -> sorted sha256 of each parquet file's BYTES."""
    digest: dict[str, list[str]] = {}
    for f in sorted(glob.glob(f"{out_dir}/split=*/shard=*/*.parquet")):
        key = "/".join(f.rsplit("/", 3)[-3:-1])
        with open(f, "rb") as fh:
            digest.setdefault(key, []).append(
                hashlib.sha256(fh.read()).hexdigest()
            )
    return {k: sorted(v) for k, v in digest.items()}


@pytest.mark.streaming
def test_production_pipeline_end_to_end(spark, sf_dir, tmp_path):
    work = str(tmp_path)
    spool = f"{work}/spool"
    rows = _corpus_rows(spark, sf_dir)
    assert len(rows) == 130
    wave1, wave2 = rows[:80], rows[80:]

    # the one-call public API (kinesis_spark/pipeline.py) drives the
    # whole chain; this test subclasses the sink only to OBSERVE batches
    cfg = IntakeConfig(
        spool_dir=spool, stream=STREAM, work_dir=work,
        consumer_id="A", lease_ttl_s=0.5,
    )
    _put_docs(spool, wave1)
    sink = IntakeSink(spark, cfg)
    audit_a = run_intake(spark, cfg, sink=sink)
    n_batches_a = len(sink.seen_doc_ids)
    assert tx_read(spark, sink.store_root).count() > 0
    assert audit_a.filter(F.col("consumer_id") != "A").count() == 0

    __import__("time").sleep(0.8)  # A's leases lapse: it is dead

    # wave 2 + the producer re-puts three wave-1 records (at-least-once);
    # consumer B takes over: same stores/leases, its own checkpoint
    reput = wave1[:3]
    _put_docs(spool, wave2 + reput)
    cfg_b = takeover(cfg, "B", lease_ttl_s=30.0)
    audit_b = run_intake(spark, cfg_b, sink=sink)

    # B really did replay/see duplicates: every re-put doc_id appears in
    # B's batches even though A already admitted it
    b_seen = set().union(*sink.seen_doc_ids[n_batches_a:])
    assert {r["doc_id"] for r in reput} <= b_seen

    # ---- end state == the greedy oracle, exactly -----------------------
    expected = _oracle_admitted(spark, [wave1, wave2 + reput])
    corpus = tx_read(spark, sink.store_root)
    got_ids = sorted(r.doc_id for r in corpus.select("doc_id").collect())
    assert got_ids == sorted(expected)
    assert len(got_ids) == len(set(got_ids))  # no double-admission

    # the corpus txstore is genuinely multi-level partitioned and its
    # manifest-pruned read matches a full read
    man = tx_current_manifest(spark, sink.store_root)
    assert man["partition_col"] == ["lang", "source"]
    one_key = sorted(man["partitions"])[0]
    vals = json.loads(one_key)
    pruned = tx_read(
        spark, sink.store_root, partition_values=[tuple(vals)]
    )
    assert pruned.count() == corpus.filter(
        (F.col("lang") == vals[0]) & (F.col("source") == vals[1])
    ).count()

    # ---- the audit DataFrame IS the rollup, stamped with run identity --
    assert {r.consumer_id for r in audit_b.select("consumer_id").collect()} == {"B"}
    assert (
        audit_b.select("corpus_version").distinct().collect()[0][0]
        == man["version"]
    )

    # ---- incremental rollup face == recomputed-from-scratch ------------
    rollup = {
        (r.lang, r.source): (r.n_docs, r.total_tokens)
        for r in audit_b.collect()
    }
    truth = {
        (r.lang, r.source): (r.n_docs, r.total_tokens)
        for r in corpus.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(F.split("text", r"[ \t\n\f\r\x0B]+")))
            .cast("bigint")
            .alias("total_tokens"),
        )
        .collect()
    }
    assert rollup == truth

    # ---- leakage-free split: the admitted corpus is near-dup-free by
    # construction (no two admitted docs share a band key), so s14's
    # component-keyed split degenerates to the per-doc hash split -------
    from kinesis_spark.streaming.neardup import band_keys

    bk = band_keys(corpus.select("doc_id", "text"))
    assert (
        bk.groupBy("band_key")
        .agg(F.count_distinct("doc_id").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )

    # ---- shard writer: byte-deterministic ------------------------------
    from kinesis_spark.shards import read_split, write_training_shards

    out1, out2 = f"{work}/shards1", f"{work}/shards2"
    # the first write rides the public config path: a re-drain of
    # consumer B (no new input — a metadata no-op) with shards_dir set;
    # the second is the direct library call, so equal bytes also prove
    # the config path adds nothing
    audit_c = run_intake(
        spark, takeover(cfg_b, "B", shards_dir=out1, n_shards=2), sink=sink
    )
    assert sorted(map(tuple, audit_c.collect())) == sorted(
        map(tuple, audit_b.collect())
    )
    write_training_shards(corpus, out2, n_shards=2)
    d1, d2 = _shard_digest(out1), _shard_digest(out2)
    assert d1 and d1 == d2  # identical bytes, file for file
    # the shards ARE the corpus, partitioned by the split
    total = sum(
        read_split(spark, out1, s).count() for s in ("train", "val", "test")
    )
    assert total == len(expected)


@pytest.mark.streaming
def test_drift_monitor_rides_the_intake_stream(spark, sf_dir, tmp_path):
    """VERDICT r8 task 6: the always-on PSI monitor composed into the
    production intake path — the SAME spool-backed consumer stream the
    admission sink drains also feeds the drift monitor (its own lease
    scope + checkpoint, the standard second-consumer pattern). The
    reference profile is captured once from the commissioning window's
    arrivals; the monitor must stay SILENT through an in-distribution
    wave and FIRE on a planted drifted batch — which the gate/dedup
    path meanwhile admits normally (drift is a statistical property of
    arrivals, not an admission failure)."""
    from kinesis_spark.pipeline import _consumer_stream
    from kinesis_spark.streaming.drift import (
        start_psi_drift_query,
        write_psi_reference,
    )

    work = str(tmp_path)
    spool = f"{work}/spool"
    rows = _corpus_rows(spark, sf_dir)
    wave1, wave2 = rows[:80], rows[80:]
    # planted drift: gate-passing (keep-lang, >=10 tokens) but far
    # SHORTER than the corpus (ref lengths ~190-560 chars; these ~75) —
    # unique texts so admission dedup is not in play
    wave3 = [
        {
            "doc_id": 2_000_000 + i,
            "text": ("drift" + str(i) + " ") * 12,
            "lang": "en",
            "source": "crawl",
        }
        for i in range(60)
    ]

    # short intake-lease TTL + explicit lapse sleeps between consumers:
    # leases are NOT released at query stop (KCL semantics — takeover
    # happens by TTL expiry), so a successor with an unexpired
    # predecessor claims zero shards and silently drains nothing
    cfg = IntakeConfig(
        spool_dir=spool, stream=STREAM, work_dir=work,
        consumer_id="A", lease_ttl_s=0.5,
    )
    _put_docs(spool, wave1)
    audit_a = run_intake(spark, cfg)
    assert audit_a.count() > 0

    # reference: the commissioning window's arrival lengths (x1000 so
    # the 47-560 char corpus spans dq4's 50k-wide bins)
    ref_path = f"{work}/psi-ref"
    write_psi_reference(
        spark.createDataFrame(
            [(float(len(r["text"])) * 1000.0,) for r in wave1], "v double"
        ),
        "v",
        ref_path,
    )

    # the monitor is a SECOND consumer of the same stream: own lease
    # scope (no shard contention with the intake consumer), own
    # checkpoint (resumes across drains), same spool
    mon_cfg = takeover(cfg, "MON", lease_dir=f"{work}/mon-leases")
    mon_out = f"{work}/psi-out"

    def drain_monitor() -> None:
        stream = (
            _consumer_stream(spark, mon_cfg)
            .select(
                F.from_json(
                    F.col("data").cast("string"), mon_cfg.doc_schema
                ).alias("j")
            )
            .select((F.length("j.text").cast("double") * 1000.0).alias("v"))
        )
        q = start_psi_drift_query(
            stream, ref_path, "v",
            f"{work}/psi-state", mon_out, f"{work}/psi-ckpt",
            trigger_available_now=True,
        )
        assert q.awaitTermination(300), "monitor drain exceeded 300s"

    def latest_alert() -> bool:
        rep = spark.read.parquet(mon_out)
        last = rep.agg(F.max("batch_id")).first()[0]
        vals = {
            bool(r.drift_alert)
            for r in rep.filter(F.col("batch_id") == last).collect()
        }
        assert len(vals) == 1
        return vals.pop()

    drain_monitor()  # sees wave 1 — the reference window itself
    assert latest_alert() is False

    # in-distribution wave: intake admits, monitor stays silent
    __import__("time").sleep(0.8)  # A's leases lapse
    _put_docs(spool, wave2)
    cfg_b = takeover(cfg, "B")
    audit_b = run_intake(spark, cfg_b)
    assert audit_b.count() > 0
    drain_monitor()
    assert latest_alert() is False

    # planted drifted batch: intake keeps admitting (unique, gate-
    # passing), the monitor fires
    __import__("time").sleep(0.8)  # B's leases lapse
    _put_docs(spool, wave3)
    audit_c = run_intake(spark, takeover(cfg_b, "C"))
    corpus = tx_read(spark, cfg.corpus)
    assert corpus.filter(F.col("doc_id") >= 2_000_000).count() == len(wave3)
    assert audit_c.count() > 0
    drain_monitor()
    assert latest_alert() is True


@pytest.mark.streaming
def test_full_chaos_showcase(spark, sf_dir, tmp_path):
    """VERDICT r9 task 6: all four failure modes in ONE run —

    1. a shard is SPLIT mid-stream (topology cutover; later puts route
       to the children),
    2. consumer A is killed (its leases simply lapse — KCL semantics),
    3. survivor B fails over from the shared lease table, replaying
       A's never-checkpointed tail plus producer re-puts
       (at-least-once, proven DELIVERED then deduplicated),
    4. a drifted batch lands while the PSI monitor — a second consumer
       of the same stream — is watching.

    End state: the corpus equals a pure-Python greedy admission oracle
    replayed over the OBSERVED per-batch arrival order (delivery order
    across the split is pinned separately by test_resharding's
    parent-before-child asserts), contains no duplicate ids or texts
    (exactly-once through every replay), the training-shard export is
    byte-deterministic, and the monitor stayed silent through the
    in-distribution waves and fired on the drifted one."""
    import time

    from kinesis_spark.ingest.leases import ShardLeases
    from kinesis_spark.ingest.resharding import (
        init_topology,
        load_topology,
        split_shard,
    )
    from kinesis_spark.pipeline import _consumer_stream
    from kinesis_spark.shards import write_training_shards
    from kinesis_spark.streaming.drift import (
        start_psi_drift_query,
        write_psi_reference,
    )

    work = str(tmp_path)
    spool = f"{work}/spool"
    rows = _corpus_rows(spark, sf_dir)
    wave1, wave2 = rows[:80], rows[80:]
    reput = wave1[:3]
    wave3 = [  # drift: gate-passing but far shorter than the corpus
        {
            "doc_id": 2_000_000 + i,
            "text": ("drift" + str(i) + " ") * 12,
            "lang": "en",
            "source": "crawl",
        }
        for i in range(60)
    ]
    by_id = {r["doc_id"]: r for r in rows + wave3}

    # explicit 4-shard topology so the mid-stream split is observable
    init_topology(spool, 4)

    cfg = IntakeConfig(
        spool_dir=spool, stream=STREAM, work_dir=work,
        consumer_id="A", lease_ttl_s=0.5,
    )
    _put_docs(spool, wave1)
    sink = IntakeSink(spark, cfg)
    audit_a = run_intake(spark, cfg, sink=sink)
    assert audit_a.count() > 0
    n_after_a = len(sink.seen_doc_ids)

    # PSI monitor: reference = the commissioning window's arrivals
    ref_path = f"{work}/psi-ref"
    write_psi_reference(
        spark.createDataFrame(
            [(float(len(r["text"])) * 1000.0,) for r in wave1], "v double"
        ),
        "v",
        ref_path,
    )
    mon_cfg = takeover(cfg, "MON", lease_dir=f"{work}/mon-leases")
    mon_out = f"{work}/psi-out"

    def drain_monitor() -> None:
        stream = (
            _consumer_stream(spark, mon_cfg)
            .select(
                F.from_json(
                    F.col("data").cast("string"), mon_cfg.doc_schema
                ).alias("j")
            )
            .select((F.length("j.text").cast("double") * 1000.0).alias("v"))
        )
        q = start_psi_drift_query(
            stream, ref_path, "v",
            f"{work}/psi-state", mon_out, f"{work}/psi-ckpt",
            trigger_available_now=True,
        )
        assert q.awaitTermination(300), "monitor drain exceeded 300s"

    def latest_alert() -> bool:
        rep = spark.read.parquet(mon_out)
        last = rep.agg(F.max("batch_id")).first()[0]
        vals = {
            bool(r.drift_alert)
            for r in rep.filter(F.col("batch_id") == last).collect()
        }
        assert len(vals) == 1
        return vals.pop()

    drain_monitor()  # commissioning window itself
    assert latest_alert() is False

    # ---- failure 1: split a live shard mid-stream ----------------------
    topo = load_topology(spool, 4)
    parent = topo.generations[-1].route("pk0")
    c1, c2 = split_shard(spool, parent, n_shards_default=4)
    topo2 = load_topology(spool, 4)
    infos = {s.shard_id: s for s in topo2.shard_infos()}
    assert infos[parent].closed
    assert not infos[c1].closed and not infos[c2].closed
    # the cutover is real: pk0's keyspace now routes to a child
    assert topo2.generations[-1].route("pk0") in (c1, c2)

    # ---- failure 2: kill A (leases lapse), land wave 2 + re-puts -------
    time.sleep(0.8)
    _put_docs(spool, wave2 + reput)

    # ---- failure 3: B fails over from the lease table ------------------
    # drain to quiescence: the split's children are gated until the
    # parent's consumed-through is recorded, and each availableNow
    # restart releases the next lineage layer — loop until a drain
    # delivers nothing new (bounded; 2 drains in the common case)
    cfg_b = takeover(cfg, "B", lease_ttl_s=30.0)

    def drain_b_until_quiet(max_drains: int = 4) -> None:
        for _ in range(max_drains):
            before = sum(len(b) for b in sink.seen_doc_ids)
            run_intake(spark, cfg_b, sink=sink)
            if sum(len(b) for b in sink.seen_doc_ids) == before:
                return
        raise AssertionError("intake never quiesced")

    drain_b_until_quiet()
    b_seen = (
        set().union(*sink.seen_doc_ids[n_after_a:])
        if len(sink.seen_doc_ids) > n_after_a
        else set()
    )
    # at-least-once proven: the re-puts were DELIVERED to B again
    assert {r["doc_id"] for r in reput} <= b_seen
    # B consumed the split's children and checkpointed them in the
    # SHARED lease table (the failover record a later claimant reads)
    leases_b = ShardLeases(cfg_b.leases, owner="B", ttl_s=30.0)
    assert any(leases_b.last_checkpoint(STREAM, c) for c in (c1, c2))

    drain_monitor()  # in-distribution wave: silent
    drain_monitor()  # (restart releases children for the monitor too)
    drain_monitor()
    assert latest_alert() is False

    # ---- failure 4: the drifted batch lands -----------------------------
    _put_docs(spool, wave3)
    drain_b_until_quiet()
    drain_monitor()
    assert latest_alert() is True

    # ---- end state: exactly-once, oracle-exact, byte-deterministic -----
    corpus = tx_read(spark, cfg.corpus)
    got_ids = sorted(r.doc_id for r in corpus.select("doc_id").collect())
    assert len(got_ids) == len(set(got_ids))  # no double admission
    texts = [r.text for r in corpus.select("text").collect()]
    assert len(texts) == len(set(texts))  # exact dedup held through chaos

    # greedy oracle over the OBSERVED arrival order (batch by batch)
    waves = [
        [by_id[i] for i in sorted(batch)]
        for batch in sink.seen_doc_ids
        if batch
    ]
    expected = _oracle_admitted(spark, waves)
    assert got_ids == sorted(expected)
    assert corpus.filter(F.col("doc_id") >= 2_000_000).count() == len(wave3)

    # byte-determinism through the whole chaos: two exports, equal bytes
    out1, out2 = f"{work}/shards1", f"{work}/shards2"
    write_training_shards(corpus, out1, n_shards=2)
    write_training_shards(corpus, out2, n_shards=2)
    d1, d2 = _shard_digest(out1), _shard_digest(out2)
    assert d1 and d1 == d2
