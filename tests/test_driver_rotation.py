"""The driver verifies a fixed-size window of queries per round, walking
the ordered registry. The ordering must put changed-since-verified
queries first (fingerprint snapshot), then never-verified ones (reading
CORRECTNESS_r*.json state from the repo root), so coverage rotates — and
re-verifies edits — across rounds automatically."""

from __future__ import annotations

import kinesis_spark.queries as Q
from kinesis_spark.queries import (
    DRIVER_PRIORITY,
    _driver_verified_names,
    _green_rounds,
    _max_round_on_disk,
    compute_fingerprints,
    get_registry,
    get_registry_ordered,
    load_fingerprint_snapshot,
    refresh_fingerprints,
)


def test_ordered_registry_is_a_permutation():
    reg, ordered = get_registry(), get_registry_ordered()
    assert set(reg) == set(ordered) and len(reg) == len(ordered)


def _exempt_names() -> set[str]:
    """Oracle-exempt queries (randomized-by-design with a deterministic
    companion) are deliberately ordered LAST regardless of verification
    state — their correctness record is the companion's hash row."""
    return {
        n for n, q in get_registry().items()
        if q.oracle is None and q.companion is not None
    }


def test_never_verified_come_first():
    verified = _driver_verified_names()
    exempt = _exempt_names()
    names = [n for n in get_registry_ordered() if n not in exempt]
    seen_verified = False
    for n in names:
        if n in verified:
            seen_verified = True
        else:
            assert not seen_verified, f"unverified {n} after a verified name"


def test_round2_window_is_the_priority_list():
    # with only CORRECTNESS_r01 on disk, the 50-query window must be
    # exactly the round-1-unverified priority families
    verified = _driver_verified_names()
    if any(n in verified for n in DRIVER_PRIORITY):
        return  # later round already verified them; rotation moved on
    assert list(get_registry_ordered())[:50] == list(DRIVER_PRIORITY)


def test_fingerprint_snapshot_is_current():
    """The committed snapshot must match the code: editing a query's
    oracle, body, or module without re-recording leaves the driver
    rotation blind to the change. Run scripts/refresh_fingerprints.py
    and commit the updated fingerprints.json."""
    snap = load_fingerprint_snapshot()
    fps = compute_fingerprints()
    assert set(snap) == set(fps), (
        "fingerprints.json names out of date — run "
        "scripts/refresh_fingerprints.py "
        f"(missing={sorted(set(fps) - set(snap))[:5]}, "
        f"stale={sorted(set(snap) - set(fps))[:5]})"
    )
    drifted = [n for n in fps if snap[n]["fp"] != fps[n]]
    assert not drifted, (
        f"query code changed without re-recording fingerprints: {drifted} "
        "— run scripts/refresh_fingerprints.py and commit the result"
    )


def test_changed_since_verified_reenters_the_window():
    """A query whose semantics changed after earning a green row (its
    snapshot round >= its newest green round) must be held out of the
    verified set and ordered before every verified name — UNLESS a
    green row from a round AFTER the change exists (self-cleared)."""
    green = _green_rounds()
    snap = load_fingerprint_snapshot()
    verified = _driver_verified_names()
    names = list(get_registry_ordered())
    reg = get_registry()
    first_verified = next(i for i, n in enumerate(names) if n in verified)
    exempt = _exempt_names()
    for n, s in snap.items():
        if n not in reg or s["round"] == 0 or n in exempt:
            continue
        if green.get(n, 0) > s["round"]:
            assert n in verified, f"{n} re-verified but still held out"
        elif n in green:
            assert n not in verified
            assert names.index(n) < first_verified, n


def test_edited_oracle_requeues_query(monkeypatch):
    """Editing a VERIFIED query (simulated: the snapshot still carries
    the pre-edit fingerprint) immediately drops it from the verified set
    and fronts it in the ordered registry."""
    verified = _driver_verified_names()
    victim = next(n for n in get_registry() if n in verified)
    edited = {k: dict(v) for k, v in load_fingerprint_snapshot().items()}
    edited[victim]["fp"] = "0" * 64  # pre-edit fp != current code's fp
    monkeypatch.setattr(Q, "load_fingerprint_snapshot", lambda: edited)
    assert victim not in _driver_verified_names()
    names = list(get_registry_ordered())
    verified = _driver_verified_names()
    first_verified = next(i for i, n in enumerate(names) if n in verified)
    # fronted into the changed-since-verified tier, ahead of all verified
    # names (other legitimately-requeued queries may share the tier)
    assert names.index(victim) < first_verified


def test_refresh_bumps_round_for_changed_fingerprint(monkeypatch):
    """refresh_fingerprints records a changed entry with round = the
    newest CORRECTNESS round on disk, so every existing green row stops
    counting and the query re-queues until a LATER round re-greens it."""
    victim = next(iter(get_registry()))
    stale = {k: dict(v) for k, v in load_fingerprint_snapshot().items()}
    stale[victim] = {"fp": "0" * 64, "round": 0}
    monkeypatch.setattr(Q, "load_fingerprint_snapshot", lambda: stale)
    new = refresh_fingerprints(write=False)
    assert new[victim]["fp"] == compute_fingerprints()[victim]
    assert new[victim]["round"] == _max_round_on_disk() >= 1
    # unchanged entries keep their recorded state verbatim
    other = next(n for n in new if n != victim)
    assert new[other] == stale[other]


def test_brand_new_query_outranks_drift_requeue(monkeypatch):
    """VERDICT r7 task 1a: a query with NO correctness row in ANY round
    must enter the driver window AHEAD of drift requeues of already-
    green queries (round 7's six newcomers starved at positions 59-64
    behind ~50 module-coarseness requeues)."""
    reg = get_registry()
    verified = _driver_verified_names()
    # not in REVERIFY_FIRST: curated semantic changes legitimately lead
    # even brand-new queries — the starvation bug was about UNcurated
    # module-coarseness requeues
    victim = next(
        n for n in reg if n in verified and n not in Q.REVERIFY_FIRST
    )
    edited = {k: dict(v) for k, v in load_fingerprint_snapshot().items()}
    edited[victim]["fp"] = "0" * 64  # turn the victim into a drift requeue
    monkeypatch.setattr(Q, "load_fingerprint_snapshot", lambda: edited)

    def zz_brand_new_probe(spark, sf_dir):  # pragma: no cover - never run
        raise NotImplementedError

    monkeypatch.setitem(
        Q.REGISTRY,
        "zz_brand_new_probe",
        Q.Query(name="zz_brand_new_probe", spark_fn=zz_brand_new_probe),
    )
    names = list(get_registry_ordered())
    assert names.index("zz_brand_new_probe") < names.index(victim)
    # and inside the driver's 50-slot window regardless of backlog size
    assert names.index("zz_brand_new_probe") < 50


def test_fingerprint_is_function_scoped(monkeypatch):
    """VERDICT r7 task 1b: the fingerprint must hash the query function
    and what it references — NOT the whole defining module — so adding
    one query to dedup.py no longer drifts its 18 module-mates. Two
    queries from the same module must have different fingerprints, and
    each must be stable across recomputation."""
    fps1 = compute_fingerprints()
    fps2 = compute_fingerprints()
    assert fps1 == fps2, "fingerprints must be deterministic within a run"
    # d1 and d2 share dedup.py; module-level hashing gave them the same
    # drift behavior — function-level hashing gives distinct hashes
    assert fps1["d1_exact_dedup"] != fps1["d2_content_hash_dedup"]


def test_fingerprints_ignore_runtime_caches(monkeypatch):
    """Running a query fills io._PLAN_CACHE; private mutable module
    state must NOT feed fingerprints, or every fingerprint drifts the
    moment any query executes in-process (the bug this pins)."""
    import kinesis_spark.io as kio

    before = compute_fingerprints()
    monkeypatch.setitem(kio._PLAN_CACHE, ("app", "sf", "documents"), object())
    assert compute_fingerprints() == before


def test_reverify_first_leads_the_changed_tier():
    """Every REVERIFY_FIRST name that is currently changed-since-
    verified must sit inside the driver's 50-query window, ahead of
    module-coarseness requeues; once re-greened, entries self-clear
    (they become verified and leave the tier)."""
    from kinesis_spark.queries import REVERIFY_FIRST

    reg = get_registry()
    verified = _driver_verified_names()
    names = list(get_registry_ordered())
    window = set(names[:50])
    pending = [
        n for n in REVERIFY_FIRST if n in reg and n not in verified
    ]
    for n in pending:
        assert n in window, f"{n} (true semantic change) pushed out of window"
    # the tier leads: every pending name precedes every OTHER changed
    # name that is not itself in REVERIFY_FIRST
    green = _green_rounds()
    others = [
        n for n in names
        if n not in verified and n in green and n not in REVERIFY_FIRST
    ]
    if pending and others:
        assert max(names.index(n) for n in pending) < min(
            names.index(n) for n in others
        )


def test_oracle_exempt_never_reenters_window(monkeypatch):
    """VERDICT r8 finding 3: d8/sim5 are randomized by design — every
    window sample mints an `err: "no_oracle"` artifact row that reads
    as a failure. Once they hold a rows-only row, they order LAST even
    when their fingerprint drifts (re-verification rides the
    deterministic companion, which shares the drifted helpers)."""
    reg = get_registry()
    exempt = {
        n for n, q in reg.items() if q.oracle is None and q.companion
    }
    assert exempt == {"d8_minhash_lsh_mllib", "sim5_brp_ann_mllib"}
    for n in exempt:
        comp = reg[n].companion
        assert comp in reg and reg[comp].oracle is not None, (
            n, "companion must be oracle-backed")
    names = list(get_registry_ordered())
    n_reg = len(names)
    for n in exempt:
        assert names.index(n) >= n_reg - len(exempt), f"{n} not last"
    # simulate a drift: the exempt query STAYS out of the window
    edited = {k: dict(v) for k, v in load_fingerprint_snapshot().items()}
    edited["d8_minhash_lsh_mllib"]["fp"] = "0" * 64
    monkeypatch.setattr(Q, "load_fingerprint_snapshot", lambda: edited)
    names = list(get_registry_ordered())
    assert names.index("d8_minhash_lsh_mllib") >= n_reg - len(exempt)


def test_fingerprint_sees_function_local_imports(tmp_path):
    """ADVICE r8: g3 imports d14 INSIDE the function body, dq6 imports
    t2 — names invisible in __globals__. A Spark-side edit to the
    imported helper must drift the dependent's fingerprint. Proven with
    a real on-disk helper module (inspect.getsource needs a file)."""
    import importlib.util
    import sys

    import kinesis_spark

    mod_path = tmp_path / "_fp_probe_helper.py"
    mod_name = "kinesis_spark._fp_probe_helper"

    def load(body: str):
        mod_path.write_text(body)
        spec = importlib.util.spec_from_file_location(mod_name, mod_path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = m
        spec.loader.exec_module(m)
        return m

    try:
        load("def helper(df):\n    return df  # v1\n")

        def probe_query(spark, sf_dir):  # pragma: no cover - never run
            from kinesis_spark._fp_probe_helper import helper

            return helper(None)

        q = Q.Query(name="zz_fp_probe", spark_fn=probe_query)
        fp1 = Q._query_fingerprint(q)
        # re-load with CHANGED helper source: dependent fp must drift
        load("def helper(df):\n    return df.distinct()  # v2\n")
        fp2 = Q._query_fingerprint(q)
        assert fp1 != fp2, "function-local import invisible to fingerprint"
    finally:
        sys.modules.pop(mod_name, None)


def test_companion_names_are_validated():
    """ADVICE r9: a typo'd companion string must raise at registry load,
    not silently park the exempt query with no companion coverage."""
    import pytest

    from kinesis_spark.queries import REGISTRY, Query, _validate_companions

    get_registry()  # ensure modules are loaded and current names validate
    _validate_companions()

    bogus = Query(name="zz_bogus_exempt", spark_fn=lambda s, d: None,
                  oracle=None, companion="zz_no_such_query")
    REGISTRY[bogus.name] = bogus
    try:
        with pytest.raises(ValueError, match="not a registered query"):
            _validate_companions()
        # companion exists but is itself oracle-less -> also invalid
        REGISTRY[bogus.name] = Query(
            name=bogus.name, spark_fn=lambda s, d: None,
            oracle=None, companion="d8_minhash_lsh_mllib")
        with pytest.raises(ValueError, match="no oracle"):
            _validate_companions()
    finally:
        del REGISTRY[bogus.name]
