"""The driver verifies a fixed-size window of queries per round, walking
the ordered registry. The ordering must put never-verified queries first
(reading CORRECTNESS_r*.json state from the repo root) so coverage
rotates itself across rounds."""

from __future__ import annotations

from kinesis_spark.queries import (
    DRIVER_PRIORITY,
    _driver_verified_names,
    get_registry,
    get_registry_ordered,
)


def test_ordered_registry_is_a_permutation():
    reg, ordered = get_registry(), get_registry_ordered()
    assert set(reg) == set(ordered) and len(reg) == len(ordered)


def test_never_verified_come_first():
    verified = _driver_verified_names()
    names = list(get_registry_ordered())
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


def test_force_reverify_reenters_the_window():
    """A query whose semantics changed after earning a green row must be
    treated as never-verified: it appears before every verified name
    even though CORRECTNESS_r*.json has a passing row for it."""
    from kinesis_spark.queries import FORCE_REVERIFY

    verified = _driver_verified_names()
    assert FORCE_REVERIFY.isdisjoint(verified)
    names = list(get_registry_ordered())
    reg = get_registry()
    first_verified = next(i for i, n in enumerate(names) if n in verified)
    for n in FORCE_REVERIFY:
        if n in reg:
            assert names.index(n) < first_verified, n
