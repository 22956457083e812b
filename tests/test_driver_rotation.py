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
    even though CORRECTNESS_r*.json has a passing row for it — UNLESS a
    green row from a round AFTER the change exists (then the entry has
    self-cleared and the query is ordinarily verified again)."""
    import glob
    import json
    import os
    import re

    from kinesis_spark.queries import FORCE_REVERIFY

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green_rounds: dict[str, list[int]] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if isinstance(row, dict) and row.get("err") in (None, "no_oracle"):
                green_rounds.setdefault(name, []).append(rnd)

    verified = _driver_verified_names()
    names = list(get_registry_ordered())
    reg = get_registry()
    first_verified = next(i for i, n in enumerate(names) if n in verified)
    for n, changed in FORCE_REVERIFY.items():
        if n not in reg:
            continue
        if any(r > changed for r in green_rounds.get(n, [])):
            assert n in verified, f"{n} re-verified but still held out"
        else:
            assert n not in verified
            assert names.index(n) < first_verified, n
