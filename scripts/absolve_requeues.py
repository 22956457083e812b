#!/usr/bin/env python
"""Drain the drift-requeue backlog (VERDICT r7 task 5).

Round 6/7's module-level fingerprints marked 59 queries changed-since-
verified even though only their MODULE text drifted (a new query was
added next to them); their green CORRECTNESS rows still validate their
current semantics. This script re-proves that claim the driver's own
way — run the Spark query AND its DuckDB oracle at sf0.01 through the
SAME comparator the pytest gate uses — and, on EXACT MATCH, lowers the
query's snapshot round back below its newest green round so
``_driver_verified_names()`` counts it again.

Only module-coarseness requeues are eligible: a TRUE semantic change
must go through REVERIFY_FIRST and earn a fresh driver row instead —
never absolve a query you know behaves differently than when its green
row was recorded. REVERIFY_FIRST names are therefore EXCLUDED
mechanically (their oracles moved in lockstep with the code, so the
local gate would pass and silently bypass the driver). Queries that
fail the local gate are left requeued (and reported loudly).

Usage: python scripts/absolve_requeues.py [--dry-run]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from kinesis_spark.queries import (  # noqa: E402
    _FP_PATH,
    REVERIFY_FIRST,
    _driver_verified_names,
    _green_rounds,
    compute_fingerprints,
    get_registry,
    load_fingerprint_snapshot,
)
from kinesis_spark.pins import release_shared_pins  # noqa: E402
from kinesis_spark.session import get_spark  # noqa: E402
from oracle_utils import compare, run_oracle  # noqa: E402


def main() -> int:
    dry = "--dry-run" in sys.argv
    reg = get_registry()
    green = _green_rounds()
    verified = _driver_verified_names(green)
    changed = [
        n
        for n in reg
        if n not in verified and n in green and n not in REVERIFY_FIRST
    ]
    skipped = [n for n in REVERIFY_FIRST if n in reg and n not in verified]
    if skipped:
        print("REVERIFY_FIRST (true semantic changes, driver-gate only):",
              skipped)
    if not changed:
        print("no drift requeues to absolve")
        return 0
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("absolve-requeues")
    spark.sparkContext.setLogLevel("ERROR")
    snap = load_fingerprint_snapshot()
    # record the CURRENT fp: an absolved entry must satisfy BOTH of
    # _driver_verified_names' conditions (round < green AND fp match) —
    # keeping a stale fp would make the absolution a silent no-op
    fps = compute_fingerprints()
    absolved, failed = [], []
    for name in changed:
        q = reg[name]
        try:
            release_shared_pins()
            spark.catalog.clearCache()
            df = q.spark_fn(spark, sf)
            if q.oracle is None:
                # rows-only queries get the driver's weaker check: runs,
                # returns a stable frame (same standard as a no_oracle row)
                assert df.count() >= 0
                print(name, "rows-only OK", flush=True)
            else:
                compare(df, run_oracle(q.oracle, sf), name)
                print(name, "EXACT MATCH", flush=True)
            snap[name] = {"fp": fps[name], "round": green[name] - 1}
            absolved.append(name)
        except Exception as ex:  # noqa: BLE001 - report, keep requeued
            failed.append(name)
            print(name, "FAIL (stays requeued)", repr(ex)[:300], flush=True)
    spark.stop()
    print(f"absolved {len(absolved)}/{len(changed)}; failed: {failed}")
    if absolved and not dry:
        with open(_FP_PATH, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {_FP_PATH}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
